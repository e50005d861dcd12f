#!/bin/bash
# TPU-queue job: quiet-host steady-state wall-clock, n=3 per variant
# (VERDICT r2 "Next" #9: one defensible number with spread, not the best
# lane). Host is quiet: the CPU reference lanes gate on /tmp/perf_done_r3
# which this job touches at the end.
set -u
cd /root/repo
ROOT=/tmp/yelp_scale_r2
have() { python3 -c "import json,sys; d=json.load(open('$ROOT/results.json')); sys.exit(0 if '$1' in d else 1)" 2>/dev/null; }
run() {
  local key=$1; shift
  have "$key" && { echo "skip $key"; return; }
  echo "start $key $(date -u +%H:%M:%S)"
  timeout 4200 python scripts/yelp_scale_sweep.py --phase ours --root $ROOT \
    --key "$key" "$@"
  echo "done $key rc=$? $(date -u +%H:%M:%S)"
}
# one unrecorded warmup to make sure every bucket of this code revision is
# in the persistent cache (cheap if already warm)
timeout 4200 python scripts/yelp_scale_sweep.py --phase ours --root $ROOT \
  --key perf_r3_cachewarmer --seed 2000 --evals
for i in 1 2 3; do
  run "perf_r3_faithful_warm_$i" --seed 2000 --evals
done
for i in 1 2 3; do
  run "perf_r3_nows_warm_$i" --seed 2000
done
touch /tmp/perf_done_r3
echo "perf_r3 section complete"
