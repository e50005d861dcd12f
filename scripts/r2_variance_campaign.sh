#!/bin/bash
# Round-2 variance campaign: is the reference ACTUALLY tighter than us at
# Yelp scale, or was r1's n=2 a small-sample artifact?
#
# The medium-scale study (seedvar_r2.json) found parity at n=8/side:
# ours mean 0.2469 / std 0.0144 vs ref 0.2429 / 0.0161. This campaign
# collects the same statistics at the full Yelp-scale protocol:
#   - CPU lane: reference driver (imported from /root/reference) seeds
#     2002, 2003 (~2-3 h each; r1 already has 2000-equivalent + 7)
#   - TPU lane: our driver, no theta warm-start, seeds 2000, 2003..2007
#     (~10-15 min each; 2001, 2002 already recorded)
# Both lanes share /tmp/yelp_scale_r2 (same dataset seed=17 as r1 and
# the same shared pretrained tables), writing to results.json (locked).
set -u
cd /root/repo
ROOT=/tmp/yelp_scale_r2
STAMP() { date -u +%H:%M:%S; }

ref_lane() {
  for seed in 2002 2003; do
    key="reference_seed${seed}"
    if python3 -c "import json,sys; d=json.load(open('$ROOT/results.json')); sys.exit(0 if '$key' in d else 1)"; then
      echo "[ref $(STAMP)] skip $key"; continue
    fi
    echo "[ref $(STAMP)] start $key"
    OMP_NUM_THREADS=2 MKL_NUM_THREADS=2 timeout 14400 \
      python scripts/yelp_scale_sweep.py --phase reference --platform cpu \
        --root $ROOT --seed $seed --key $key \
        >> /tmp/ref_lane.log 2>&1
    echo "[ref $(STAMP)] done $key rc=$?"
  done
}

tpu_lane() {
  # wait for any in-flight ours run to release the TPU
  while pgrep -f "yelp_scale_sweep.py --phase ours" > /dev/null; do sleep 60; done
  for seed in 2000 2003 2004 2005 2006 2007; do
    key="ours_nows_seed${seed}"
    if python3 -c "import json,sys; d=json.load(open('$ROOT/results.json')); sys.exit(0 if '$key' in d else 1)"; then
      echo "[tpu $(STAMP)] skip $key"; continue
    fi
    echo "[tpu $(STAMP)] start $key"
    timeout 3600 python scripts/yelp_scale_sweep.py --phase ours \
      --root $ROOT --seed $seed --key $key \
      >> /tmp/tpu_lane.log 2>&1
    echo "[tpu $(STAMP)] done $key rc=$?"
  done
}

ref_lane & REF=$!
tpu_lane & TPU=$!
wait $REF $TPU
echo "[campaign $(STAMP)] all lanes done"
