#!/bin/bash
# Round-4 TPU lane: ours-side Yelp-scale baselines (matched protocol to
# r4_refbase_lane.sh), then a bench.py validation run. Serial — exactly
# one TPU process at a time.
set -u
cd /root/repo
ROOT=/tmp/yelp_scale_r2
STAMP() { date -u +%H:%M:%S; }
have() { python3 -c "import json,sys; d=json.load(open('$ROOT/results.json')); sys.exit(0 if '$1' in d else 1)" 2>/dev/null; }

for spec in fine:10 spmf:10 full:3; do
  method=${spec%%:*}; epochs=${spec##*:}
  key="ours_baseline_${method}"
  if have "$key"; then echo "[ours $(STAMP)] skip $key"; continue; fi
  echo "[ours $(STAMP)] start $key (epochs=$epochs)"
  timeout 7200 python scripts/yelp_scale_sweep.py \
    --phase baseline --root $ROOT \
    --method $method --epochs $epochs --seed 2000 \
    >> /tmp/r4_ours_runs.log 2>&1
  echo "[ours $(STAMP)] done $key rc=$?"
done

echo "[ours $(STAMP)] bench validation"
timeout 3000 python bench.py > /tmp/bench_r4_check.json 2>/tmp/bench_r4_check.log
echo "[ours $(STAMP)] bench rc=$?"
cat /tmp/bench_r4_check.json
echo "[ours $(STAMP)] lane done"
