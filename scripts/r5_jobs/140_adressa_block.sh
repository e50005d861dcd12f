#!/bin/bash
# Round-5 Adressa perf block (VERDICT r4 "Next" #5): n>=6 faithful warm
# runs at the news shape with per-period seconds (program-time metric),
# plus a fused-vs-unfused A/B. Guarded protocol (the CLI default).
set -u
cd /root/repo
ROOT=/tmp/adressa_r3
have() { python3 -c "import json,sys; d=json.load(open('$ROOT/results.json')); sys.exit(0 if '$1' in d else 1)" 2>/dev/null; }
run() {
  local key=$1; shift
  have "$key" && { echo "skip $key"; return; }
  echo "start $key $(date -u +%H:%M:%S)"
  timeout 4200 python scripts/adressa_run.py --phase sml --root $ROOT \
    --key "$key" --saddle-retries 2 "$@"
  echo "done $key rc=$? $(date -u +%H:%M:%S)"
}
run "aperf_r5_warmup_unfused" --seed 2000 --fuse-period off
run "aperf_r5_warmup_fused"   --seed 2000 --fuse-period on
for i in 1 2 3 4 5 6; do
  run "aperf_r5_unfused_warm_$i" --seed 2000 --fuse-period off
done
for i in 1 2 3; do
  run "aperf_r5_fused_warm_$i" --seed 2000 --fuse-period on
done
echo "adressa r5 block complete $(date -u +%H:%M:%S)"
python3 - <<'PYEOF'
import json
d = json.load(open("/tmp/adressa_r3/results.json"))
for k in sorted(d):
    if k.startswith("aperf_r5"):
        v = d[k]
        ps = v.get("period_seconds", [])
        print(k, "wall", v.get("total_seconds"), "period_sum",
              round(sum(ps), 1), "r@20:",
              v.get("summary", {}).get("test_recall@20"))
PYEOF
