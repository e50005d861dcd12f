#!/bin/bash
# TPU-queue job: validate the uniform-shape cold-compile fix (VERDICT r2
# "Next" #4). Fresh compile cache -> faithful cold sweep (round-2 baseline:
# 964-972 s; target <=500 s), then warm reruns on the same cache. Note the
# host context: 3 single-thread reference lanes are pinned to cores 0-2
# while this runs, so the numbers carry that caveat (re-measured quiet at
# round end if time allows).
set -u
cd /root/repo
ROOT=/tmp/yelp_scale_r2
FRESH=/tmp/sml_xla_cache_r3_uniform
rm -rf $FRESH
have() { python3 -c "import json,sys; d=json.load(open('$ROOT/results.json')); sys.exit(0 if '$1' in d else 1)" 2>/dev/null; }
run() {
  local key=$1; shift
  have "$key" && { echo "skip $key"; return; }
  echo "start $key $(date -u +%H:%M:%S)"
  timeout 4200 python scripts/yelp_scale_sweep.py --phase ours --root $ROOT \
    --key "$key" "$@"
  echo "done $key rc=$? $(date -u +%H:%M:%S)"
}
export SML_COMPILE_CACHE=$FRESH
run "perf_r3_uniform_cold" --seed 2000 --evals
run "perf_r3_uniform_warm" --seed 2000 --evals
run "perf_r3_uniform_nows_warm" --seed 2000
# same code, old per-period bucketing, fresh cache: the A/B cold number
FRESH2=/tmp/sml_xla_cache_r3_perperiod
rm -rf $FRESH2
export SML_COMPILE_CACHE=$FRESH2
run "perf_r3_perperiod_cold" --seed 2000 --evals --per-period-shapes
echo "uniform cold section complete"
