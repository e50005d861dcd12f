#!/bin/bash
# After the diag lane: (a) the warm-compile-cache eval-faithful run for
# the headline wall-clock, (b) 8 more stream seeds to sharpen our
# Yelp-scale run distribution (runs are ~2 min warm).
set -u
cd /root/repo
ROOT=/tmp/yelp_scale_r2
STAMP() { date -u +%H:%M:%S; }

until python3 - <<'EOF'
import json, sys
d = json.load(open("/tmp/yelp_scale_r2/results.json"))
sys.exit(0 if "ours_diag_seed2001" in d else 1)
EOF
do sleep 120; done
while pgrep -f "yelp_scale_sweep.py --phase ours" > /dev/null; do sleep 60; done

run() {
  local key=$1; shift
  if python3 -c "import json,sys; d=json.load(open('$ROOT/results.json')); sys.exit(0 if '$key' in d else 1)"; then
    echo "[ext $(STAMP)] skip $key"; return
  fi
  echo "[ext $(STAMP)] start $key"
  timeout 3600 python scripts/yelp_scale_sweep.py --phase ours --root $ROOT \
    --key "$key" "$@" >> /tmp/ext_lane_runs.log 2>&1
  echo "[ext $(STAMP)] done $key rc=$?"
}

run "ours_faithful_warm_seed2000" --seed 2000 --evals
for seed in 4000 4001 4002 4003 4004 4005 4006 4007; do
  run "ours_nows_seed${seed}" --seed $seed
done
echo "[ext $(STAMP)] extend lane done"
