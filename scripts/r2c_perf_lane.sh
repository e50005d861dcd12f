#!/bin/bash
# Clean (quiet-host) perf validation. The r2b perf lane ran concurrently
# with a reference CPU sweep and its wall-clocks are contention-dominated
# (same workload spans 69-1109 s across the campaign depending on what
# else ran). This lane chains behind the LAST CPU-heavy lane (refbad) so
# the host is idle, and measures the upload-overlap + uint16 (4fa56b5)
# and deferred-eval (cf25590) changes against the round-1 quiet numbers
# (warm evals-off 93-97 s, faithful warm 265 s).
set -u
cd /root/repo
ROOT=/tmp/yelp_scale_r2
STAMP() { date -u +%H:%M:%S; }

until grep -q "lane done" /tmp/refbad_lane.log 2>/dev/null; do sleep 180; done

run() {
  local key=$1; shift
  if python3 -c "import json,sys; d=json.load(open('$ROOT/results.json')); sys.exit(0 if '$key' in d else 1)" 2>/dev/null; then
    echo "[perfc $(STAMP)] skip $key"; return
  fi
  echo "[perfc $(STAMP)] start $key"
  timeout 3600 python scripts/yelp_scale_sweep.py --phase ours --root $ROOT \
    --key "$key" "$@" >> /tmp/perfc_lane_runs.log 2>&1
  echo "[perfc $(STAMP)] done $key rc=$?"
}

run "perf_r2c_warm_seed2000" --seed 2000
run "perf_r2c_faithful_seed2000" --seed 2000 --evals
run "perf_r2c_guard_seed2005" --seed 2005 --saddle-retries 3
echo "[perfc $(STAMP)] lane done"
