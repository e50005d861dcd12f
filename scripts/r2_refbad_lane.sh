#!/bin/bash
# Full-sweep reference runs at the two torch seeds whose period-0 probes
# stalled (3002 hard, 3006 soft — see probe_reference_* keys). If the final
# mean10 lands low, the reference's bad tail is demonstrated end-to-end,
# not just via the one-period probe. Chains behind the variance campaign's
# ref lane (one CPU-heavy reference process at a time).
set -u
cd /root/repo
ROOT=/tmp/yelp_scale_r2
STAMP() { date -u +%H:%M:%S; }

until grep -q "all lanes done" /tmp/variance_campaign.log 2>/dev/null; do sleep 120; done

for seed in 3002 3006; do
  key="reference_seed${seed}"
  if python3 -c "import json,sys; d=json.load(open('$ROOT/results.json')); sys.exit(0 if '$key' in d else 1)" 2>/dev/null; then
    echo "[refbad $(STAMP)] skip $key"; continue
  fi
  echo "[refbad $(STAMP)] start $key"
  OMP_NUM_THREADS=2 MKL_NUM_THREADS=2 timeout 14400 \
    python scripts/yelp_scale_sweep.py --phase reference --platform cpu \
      --root $ROOT --seed $seed --key $key >> /tmp/refbad_runs.log 2>&1
  echo "[refbad $(STAMP)] done $key rc=$?"
done
echo "[refbad $(STAMP)] lane done"
