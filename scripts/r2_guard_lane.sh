#!/bin/bash
# Serialized TPU lane (ONE tpu process at a time — concurrent axon users die
# with FailedPrecondition): finish the probe table, then validate the
# double-check saddle guard on the four known-bad seeds and one good seed.
set -u
cd /root/repo
ROOT=/tmp/yelp_scale_r2
STAMP() { date -u +%H:%M:%S; }

probe() {
  local seed=$1
  python3 -c "import json,sys; d=json.load(open('$ROOT/results.json')); sys.exit(0 if 'probe_ours_seed${seed}' in d else 1)" && \
    { echo "[guardlane $(STAMP)] skip probe $seed"; return; }
  echo "[guardlane $(STAMP)] probe $seed"
  timeout 900 python scripts/period0_probe.py --side ours --root $ROOT \
    --seed $seed >> /tmp/guard_lane_runs.log 2>&1
  echo "[guardlane $(STAMP)] probe $seed rc=$?"
}

guarded() {
  local seed=$1
  python3 -c "import json,sys; d=json.load(open('$ROOT/results.json')); sys.exit(0 if 'ours_guard2_seed${seed}' in d else 1)" && \
    { echo "[guardlane $(STAMP)] skip guard2 $seed"; return; }
  echo "[guardlane $(STAMP)] guard2 $seed"
  timeout 3600 python scripts/yelp_scale_sweep.py --phase ours --root $ROOT \
    --key ours_guard2_seed$seed --seed $seed --saddle-retries 3 \
    --log /tmp/diag_guard2_$seed.jsonl >> /tmp/guard_lane_runs.log 2>&1
  echo "[guardlane $(STAMP)] guard2 $seed rc=$?"
}

probe 2007
probe 4000
for seed in 2001 2003 2004 4007 2005; do guarded $seed; done
echo "[guardlane $(STAMP)] lane done"
