#!/bin/bash
# Accuracy band of the FINAL r5 revision, n=6 fresh guarded seeds (all
# round-5 perf runs used seed 2000; this freshens the guarded-fleet
# claim on the shipping revision) + one on-chip drive of the rank CLI.
set -u
cd /root/repo
ROOT=/tmp/yelp_scale_r2
have() { python3 -c "import json,sys; d=json.load(open('$ROOT/results.json')); sys.exit(0 if '$1' in d else 1)" 2>/dev/null; }
for s in 2001 2002 2003 2004 2005 2006; do
  key="ours_r5_guard_seed$s"
  have "$key" && { echo "skip $key"; continue; }
  echo "start $key $(date -u +%H:%M:%S)"
  timeout 4200 python scripts/yelp_scale_sweep.py --phase ours --root $ROOT \
    --key "$key" --seed $s --evals --saddle-retries 2 --fuse-period on
  echo "done $key rc=$? $(date -u +%H:%M:%S)"
done
echo "rank CLI on chip:"
timeout 900 python -m sml_tpu rank --model $ROOT/pre.npz --users 1,2,3 -k 10 \
  --topk-method approx99 2>/dev/null | head -3
echo "rank rc=$?"
