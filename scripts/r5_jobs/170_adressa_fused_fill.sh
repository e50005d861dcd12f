#!/bin/bash
# n=3 -> n=6 for the fused Adressa lane (symmetry with unfused).
set -u
cd /root/repo
ROOT=/tmp/adressa_r3
have() { python3 -c "import json,sys; d=json.load(open('$ROOT/results.json')); sys.exit(0 if '$1' in d else 1)" 2>/dev/null; }
for i in 4 5 6; do
  key="aperf_r5_fused_warm_$i"
  have "$key" && { echo "skip $key"; continue; }
  echo "start $key $(date -u +%H:%M:%S)"
  timeout 4200 python scripts/adressa_run.py --phase sml --root $ROOT \
    --key "$key" --saddle-retries 2 --seed 2000 --fuse-period on
  echo "done $key rc=$? $(date -u +%H:%M:%S)"
done
