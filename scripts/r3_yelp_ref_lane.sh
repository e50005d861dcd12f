#!/bin/bash
# Round-3 Yelp-scale reference full-sweep lane (VERDICT r2 "Next" #1: the
# parity denominator). One lane = one pinned core, OMP=1, seeds passed as
# args; three lanes run in parallel on cores 0-2. Accuracy is what these
# runs are for - the reference's wall-clock baseline was already measured
# at 4 threads in round 1 (7036-7334 s), so single-thread execution here
# does not pollute any timing claim.
# Usage: r3_yelp_ref_lane.sh <core> <seed> [<seed> ...]
set -u
cd /root/repo
ROOT=/tmp/yelp_scale_r2
CORE=$1; shift
STAMP() { date -u +%H:%M:%S; }
have() { python3 -c "import json,sys; d=json.load(open('$ROOT/results.json')); sys.exit(0 if '$1' in d else 1)" 2>/dev/null; }

# bounded wait on the quiet-host perf gate (ADVICE r2: never spin forever)
waited=0
until [ -f /tmp/perf_done_r3 ] || [ $waited -ge 5400 ]; do
  sleep 30; waited=$((waited + 30))
done
# a fallthrough means the perf lane is still measuring: say so loudly so
# its "quiet host" numbers are known-contaminated rather than silently so
[ -f /tmp/perf_done_r3 ] || \
  echo "[yref$CORE $(STAMP)] WARNING: perf gate never appeared - starting" \
       "anyway; perf_r3 timings recorded after this point are NOT quiet-host"

for seed in "$@"; do
  key="reference_seed${seed}"
  if have "$key"; then echo "[yref$CORE $(STAMP)] skip $key"; continue; fi
  echo "[yref$CORE $(STAMP)] start $key"
  OMP_NUM_THREADS=1 MKL_NUM_THREADS=1 timeout 23000 \
    taskset -c $CORE python scripts/yelp_scale_sweep.py --phase reference \
      --platform cpu --root $ROOT --seed $seed --key $key \
      >> /tmp/r3_yref_runs.log 2>&1
  echo "[yref$CORE $(STAMP)] done $key rc=$?"
done
echo "[yref$CORE $(STAMP)] lane done"
