#!/bin/bash
# Clean validation of the pair-re-roll saddle guard (commit e41650f) on all
# four known-bad seeds + one good seed (no-op check). Chains behind the
# probe2 lane so only one TPU process ever runs.
set -u
cd /root/repo
ROOT=/tmp/yelp_scale_r2
STAMP() { date -u +%H:%M:%S; }

until grep -q "lane done" /tmp/probe2_lane.log 2>/dev/null; do sleep 60; done

for seed in 2001 2003 2004 4007 2005; do
  key="ours_guard3_seed${seed}"
  if python3 -c "import json,sys; d=json.load(open('$ROOT/results.json')); sys.exit(0 if '$key' in d else 1)" 2>/dev/null; then
    echo "[guard3 $(STAMP)] skip $key"; continue
  fi
  echo "[guard3 $(STAMP)] start $key"
  timeout 3600 python scripts/yelp_scale_sweep.py --phase ours --root $ROOT \
    --key "$key" --seed $seed --saddle-retries 3 \
    --log /tmp/diag_guard3_$seed.jsonl >> /tmp/guard3_runs.log 2>&1
  echo "[guard3 $(STAMP)] done $key rc=$?"
done
echo "[guard3 $(STAMP)] lane done"
