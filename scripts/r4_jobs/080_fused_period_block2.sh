#!/bin/bash
# Fused-period block, take 2: same protocol as 060 but with the batched
# stacked-eval fetch (engine.resolve_stacked_evals now fetches every
# bundle in ONE device_get; 060's totals carried ~25-120 s of serial
# ~1 s readiness polls at finalize). Keys perf_r4g_*.
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
run "perf_r4g_warmup" --seed 2000 --evals
for i in 1 2 3 4 5 6; do
  run "perf_r4g_faithful_warm_$i" --seed 2000 --evals
done
echo "fused-period block2 complete $(date -u +%H:%M:%S)"
python3 - <<'EOF'
import json
d = json.load(open("/tmp/yelp_scale_r2/results.json"))
for k in sorted(d):
    if k.startswith("perf_r4g"):
        v = d[k]
        ps = v.get("period_seconds", [])
        print(k, v.get("total_seconds"), "sum", round(sum(ps), 1),
              "r@20:", v.get("summary", {}).get("test_recall@20"))
EOF
