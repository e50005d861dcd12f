#!/bin/bash
# Round-3 (resumed session) CPU reference-lane orchestrator: one pinned
# core runs a sequence of reference full sweeps. Jobs are "yelp:SEED" or
# "adressa:SEED"; each is skipped if its key already exists in the root's
# results.json (so a relaunch after a crash resumes cleanly).
# Usage: r3b_lane.sh <core> <job> [<job> ...]
set -u
cd /root/repo
YROOT=/tmp/yelp_scale_r2
AROOT=/tmp/adressa_r3
CORE=$1; shift
STAMP() { date -u +%H:%M:%S; }
have() { python3 -c "import json,sys; d=json.load(open('$1/results.json')); sys.exit(0 if '$2' in d else 1)" 2>/dev/null; }

# bounded wait on the quiet-host perf gate (never spin forever)
waited=0
until [ -f /tmp/perf_done_r3 ] || [ $waited -ge 5400 ]; do
  sleep 30; waited=$((waited + 30))
done
[ -f /tmp/perf_done_r3 ] || \
  echo "[lane$CORE $(STAMP)] WARNING: perf gate never appeared - starting" \
       "anyway; perf_r3 timings after this point are NOT quiet-host"

for job in "$@"; do
  kind=${job%%:*}; seed=${job##*:}
  key="reference_seed${seed}"
  if [ "$kind" = yelp ]; then
    if have $YROOT "$key"; then echo "[lane$CORE $(STAMP)] skip yelp $key"; continue; fi
    echo "[lane$CORE $(STAMP)] start yelp $key"
    OMP_NUM_THREADS=1 MKL_NUM_THREADS=1 timeout 23000 \
      taskset -c $CORE python scripts/yelp_scale_sweep.py --phase reference \
        --platform cpu --root $YROOT --seed $seed --key $key \
        >> /tmp/r3b_yref_runs.log 2>&1
    echo "[lane$CORE $(STAMP)] done yelp $key rc=$?"
  elif [ "$kind" = adressa ]; then
    # wait for the adressa pre.npz (TPU pretrain lands right after the
    # perf block; bounded so a missing root cannot strand the lane)
    waited=0
    until [ -f /tmp/adressa_ready ] || [ $waited -ge 3600 ]; do
      sleep 30; waited=$((waited + 30))
    done
    [ -f /tmp/adressa_ready ] || { echo "[lane$CORE $(STAMP)] adressa root never ready, skip $key"; continue; }
    if have $AROOT "$key"; then echo "[lane$CORE $(STAMP)] skip adressa $key"; continue; fi
    echo "[lane$CORE $(STAMP)] start adressa $key"
    OMP_NUM_THREADS=1 MKL_NUM_THREADS=1 timeout 18000 \
      taskset -c $CORE python scripts/adressa_run.py --phase reference \
        --platform cpu --root $AROOT --seed $seed --key $key \
        >> /tmp/r3b_aref_runs.log 2>&1
    echo "[lane$CORE $(STAMP)] done adressa $key rc=$?"
  fi
done
echo "[lane$CORE $(STAMP)] lane done"
