#!/bin/bash
# 16 more ours period-0 probes (fresh seeds) to tighten the bad-stream-rate
# estimate. Waits for the guard lane to release the TPU first.
set -u
cd /root/repo
ROOT=/tmp/yelp_scale_r2
STAMP() { date -u +%H:%M:%S; }

until grep -q "lane done" /tmp/guard_lane.log 2>/dev/null; do sleep 60; done

for seed in 5000 5001 5002 5003 5004 5005 5006 5007 \
            5008 5009 5010 5011 5012 5013 5014 5015; do
  key="probe_ours_seed${seed}"
  if python3 -c "import json,sys; d=json.load(open('$ROOT/results.json')); sys.exit(0 if '$key' in d else 1)" 2>/dev/null; then
    echo "[probe2 $(STAMP)] skip $key"; continue
  fi
  echo "[probe2 $(STAMP)] start $key"
  timeout 900 python scripts/period0_probe.py --side ours --root $ROOT \
    --seed $seed >> /tmp/probe2_runs.log 2>&1
  echo "[probe2 $(STAMP)] done $key rc=$?"
done
echo "[probe2 $(STAMP)] lane done"
