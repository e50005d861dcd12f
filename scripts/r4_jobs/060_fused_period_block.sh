#!/bin/bash
# Round-4 fused-period A/B: same faithful-warm protocol as 040_warm_block
# but on the one-dispatch-per-period revision (SMLConfig.fuse_period: the
# phase alternation scans inside one device program, in-training evals
# computed in-program). Keys perf_r4f_*; compare against perf_r4_* via
# scripts/program_time.py.
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
# cache warmer (cold compile of the fused-period programs; not a record)
run "perf_r4f_warmup" --seed 2000 --evals
for i in 1 2 3 4 5 6; do
  run "perf_r4f_faithful_warm_$i" --seed 2000 --evals
done
# fresh-cache cold on the same revision (first-run UX of fused periods)
FRESH=/tmp/sml_xla_cache_r4f_cold
rm -rf $FRESH
SML_COMPILE_CACHE=$FRESH run "perf_r4f_uniform_cold" --seed 2000 --evals
echo "fused-period block complete $(date -u +%H:%M:%S)"
python3 - <<'EOF'
import json
d = json.load(open("/tmp/yelp_scale_r2/results.json"))
for k in sorted(d):
    if k.startswith("perf_r4f"):
        v = d[k]
        print(k, v.get("total_seconds"), "r@20:",
              v.get("summary", {}).get("test_recall@20"))
EOF
