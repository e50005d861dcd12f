#!/bin/bash
# Round-4 Adressa reference lane (VERDICT r3 "Next" #3: denominator n>=4).
# One pinned core, OMP=1, checkpointed per period so a host restart costs
# at most one period (scripts/parity_vs_reference.py:_ref_ckpt_save).
# Usage: r4_aref_lane.sh <core> <seed> [<seed> ...]
set -u
cd /root/repo
ROOT=/tmp/adressa_r3
CK=/root/repo/.lane_ckpts
STAMP() { date -u +%H:%M:%S; }
have() { python3 -c "import json,sys; d=json.load(open('$ROOT/results.json')); sys.exit(0 if '$1' in d else 1)" 2>/dev/null; }

CORE=$1; shift
for seed in "$@"; do
  key="reference_seed${seed}"
  if have "$key"; then echo "[aref$CORE $(STAMP)] skip $key"; continue; fi
  echo "[aref$CORE $(STAMP)] start $key"
  # up to 3 attempts: the checkpoint makes retries resume, not restart
  for attempt in 1 2 3; do
    OMP_NUM_THREADS=1 MKL_NUM_THREADS=1 timeout 18000 \
      nice -n 10 taskset -c $CORE python scripts/adressa_run.py \
        --phase reference --platform cpu --root $ROOT --seed $seed \
        --ckpt $CK/aref_seed${seed}.ckpt \
        >> /tmp/r4_aref_runs.log 2>&1
    rc=$?
    echo "[aref$CORE $(STAMP)] $key attempt $attempt rc=$rc"
    [ $rc -eq 0 ] && break
  done
done
echo "[aref$CORE $(STAMP)] lane done"
