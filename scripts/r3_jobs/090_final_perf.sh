#!/bin/bash
# TPU-queue job (enqueue ONLY once the CPU reference lanes are done): the
# round-3 quiet-host steady-state block (VERDICT r2 "Next" #9) on the
# final code revision - n=3 per variant + one fresh-cache cold, all under
# uniform shapes, plus the per-period-shapes cold A/B re-run quiet.
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
# warm block on the default cache (already holds this revision's programs)
run "perf_r3_final_warmup" --seed 2000 --evals    # unrecorded-in-BASELINE warmer
for i in 1 2 3; do
  run "perf_r3_final_faithful_warm_$i" --seed 2000 --evals
done
for i in 1 2 3; do
  run "perf_r3_final_nows_warm_$i" --seed 2000
done
# A/B: the upload-dedup LRU off (round-2 upload behavior, same code rev)
run "perf_r3_final_faithful_warm_nodedup" --seed 2000 --evals --no-upload-dedup
# fresh-cache colds, quiet
FRESH=/tmp/sml_xla_cache_r3_final_cold
rm -rf $FRESH
SML_COMPILE_CACHE=$FRESH run "perf_r3_final_uniform_cold" --seed 2000 --evals
FRESH2=/tmp/sml_xla_cache_r3_final_ppcold
rm -rf $FRESH2
SML_COMPILE_CACHE=$FRESH2 run "perf_r3_final_perperiod_cold" --seed 2000 --evals --per-period-shapes
echo "final perf block complete"
