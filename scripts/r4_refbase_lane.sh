#!/bin/bash
# Round-4 Yelp-scale reference baselines lane (VERDICT r3 "Next" #5): the
# paper's SML > full/fine/spmf ordering reproduced by the REFERENCE driver
# at the scaled protocol. Matched-protocol epochs (same numbers on the
# ours side): fine/spmf 10 epochs (SML's own per-period budget is
# multi_num=10 passes), full 3 epochs (trains on ALL history each stage;
# the 20-epoch reference default would be ~60 h single-core).
# Usage: r4_refbase_lane.sh <core> <method:epochs> [<method:epochs> ...]
set -u
cd /root/repo
ROOT=/tmp/yelp_scale_r2
STAMP() { date -u +%H:%M:%S; }
have() { python3 -c "import json,sys; d=json.load(open('$ROOT/results.json')); sys.exit(0 if '$1' in d else 1)" 2>/dev/null; }
CORE=$1; shift

for spec in "$@"; do
  method=${spec%%:*}; epochs=${spec##*:}
  key="ref_baseline_${method}"
  if have "$key"; then echo "[refbase$CORE $(STAMP)] skip $key"; continue; fi
  echo "[refbase$CORE $(STAMP)] start $key (epochs=$epochs)"
  OMP_NUM_THREADS=1 MKL_NUM_THREADS=1 timeout 30000 \
    nice -n 10 taskset -c $CORE python scripts/yelp_scale_sweep.py \
      --phase ref-baseline --platform cpu --root $ROOT \
      --method $method --epochs $epochs --seed 2000 \
      >> /tmp/r4_refbase_runs.log 2>&1
  echo "[refbase$CORE $(STAMP)] done $key rc=$?"
done
echo "[refbase$CORE $(STAMP)] lane done"
