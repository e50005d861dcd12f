#!/bin/bash
# Fused-period evals-off lane: (a) how much of the fused-period cold
# compile is the in-program eval inlining (fresh local cache, evals off)
# and (b) the clean fused evals-off walls. Keys perf_r4g_nows_*.
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
FRESH=/tmp/sml_xla_cache_r4g_nows_cold
rm -rf $FRESH
SML_COMPILE_CACHE=$FRESH run "perf_r4g_nows_cold" --seed 2000
for i in 1 2 3; do
  run "perf_r4g_nows_warm_$i" --seed 2000
done
echo "fused nows block complete $(date -u +%H:%M:%S)"
