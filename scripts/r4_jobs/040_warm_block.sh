#!/bin/bash
# Round-4 quiet perf block (VERDICT r3 "Next" #7): a 10-run faithful-warm
# block so the program-time metric (scripts/program_time.py) rests on a
# stall-proof denominator, plus one fresh-cache cold run. Runs on the
# final round-4 revision: masked eval path (fused Pallas rank kernel +
# once-per-set MXU mask build) live in the faithful sweep.
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
# cache warmer (cold compile of this revision's programs; not a record)
run "perf_r4_warmup" --seed 2000 --evals
for i in 1 2 3 4 5 6 7 8 9 10; do
  run "perf_r4_faithful_warm_$i" --seed 2000 --evals
done
# fresh-cache cold on the same revision
FRESH=/tmp/sml_xla_cache_r4_cold
rm -rf $FRESH
SML_COMPILE_CACHE=$FRESH run "perf_r4_uniform_cold" --seed 2000 --evals
# evals-off warm pair for the non-faithful number
for i in 1 2 3; do
  run "perf_r4_nows_warm_$i" --seed 2000
done
echo "warm block complete $(date -u +%H:%M:%S)"
python3 - <<'EOF'
import json
d = json.load(open("/tmp/yelp_scale_r2/results.json"))
for k in sorted(d):
    if k.startswith("perf_r4"):
        v = d[k]
        print(k, v.get("total_seconds"), "r@20:",
              v.get("summary", {}).get("test_recall@20"))
EOF
