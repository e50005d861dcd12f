#!/bin/bash
# Round-5 final Yelp perf block (VERDICT r4 "Next" #2): >=6 fused + >=6
# unfused faithful warm runs on the FINAL r5 revision, interleaved so
# tunnel-stall windows hit both lanes alike. Process wall AND period
# seconds are recorded per run; BASELINE.md reports both, labeled.
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
# warmup compiles BOTH lanes' programs (fused pays the one-time scan compile)
run "perf_r5_warmup_unfused" --seed 2000 --evals --fuse-period off
run "perf_r5_warmup_fused"   --seed 2000 --evals --fuse-period on
for i in 1 2 3 4 5 6; do
  run "perf_r5_fused_warm_$i"   --seed 2000 --evals --fuse-period on
  run "perf_r5_unfused_warm_$i" --seed 2000 --evals --fuse-period off
done
# evals-off pair (the non-faithful number)
for i in 1 2 3; do
  run "perf_r5_nows_warm_$i" --seed 2000 --fuse-period on
done
echo "r5 final block complete $(date -u +%H:%M:%S)"
python3 - <<'PYEOF'
import json
d = json.load(open("/tmp/yelp_scale_r2/results.json"))
for k in sorted(d):
    if k.startswith("perf_r5"):
        v = d[k]
        ps = v.get("period_seconds", [])
        print(k, "wall", v.get("total_seconds"), "period_sum",
              round(sum(ps), 1), "r@20:",
              v.get("summary", {}).get("test_recall@20"))
PYEOF
