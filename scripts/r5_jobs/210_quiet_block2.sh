#!/bin/bash
# Late quiet-window supplement to the r5 final block: 3 more fused + 3
# more unfused interleaved faithful warm runs (the 13:00 block caught a
# stall storm in the fused lane).
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
for i in 7 8 9; do
  run "perf_r5_fused_warm_$i"   --seed 2000 --evals --fuse-period on
  run "perf_r5_unfused_warm_$i" --seed 2000 --evals --fuse-period off
done
python3 - <<'PYEOF'
import json
d = json.load(open("/tmp/yelp_scale_r2/results.json"))
for k in sorted(d):
    if k.startswith("perf_r5_") and "warm_" in k:
        v = d[k]
        print(k, "wall", v.get("total_seconds"), "psum",
              round(sum(v.get("period_seconds", [])), 1))
PYEOF
