#!/bin/bash
# Perf validation of the eval-upload overlap + uint16 wire format
# (commit 4fa56b5): warm evals-off and evals-on (faithful) sweeps.
# Chains behind the guard3 lane (one TPU process at a time).
set -u
cd /root/repo
ROOT=/tmp/yelp_scale_r2
STAMP() { date -u +%H:%M:%S; }

until grep -q "lane done" /tmp/guard3_lane.log 2>/dev/null; do sleep 60; done

run() {
  local key=$1; shift
  if python3 -c "import json,sys; d=json.load(open('$ROOT/results.json')); sys.exit(0 if '$key' in d else 1)" 2>/dev/null; then
    echo "[perf $(STAMP)] skip $key"; return
  fi
  echo "[perf $(STAMP)] start $key"
  timeout 3600 python scripts/yelp_scale_sweep.py --phase ours --root $ROOT \
    --key "$key" "$@" >> /tmp/perf_lane_runs.log 2>&1
  echo "[perf $(STAMP)] done $key rc=$?"
}

run "perf_r2b_warm_seed2000" --seed 2000
run "perf_r2b_warm2_seed2005" --seed 2005
run "perf_r2b_faithful_seed2000" --seed 2000 --evals
echo "[perf $(STAMP)] lane done"
