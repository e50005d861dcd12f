#!/bin/bash
# Session-r2f CPU lane: extend the reference-side period-0 saddle-probe
# sample (n=7 so far: seeds 3000-3006, 2 stalled) at fresh torch seeds.
# Waits for /tmp/perf_done so the torch runs never contend with the
# quiet-host perf timings in scripts/r2d_recover_lanes.sh.
set -u
cd /root/repo
ROOT=/tmp/yelp_scale_r2
STAMP() { date -u +%H:%M:%S; }

have() { python3 -c "import json,sys; d=json.load(open('$ROOT/results.json')); sys.exit(0 if '$1' in d else 1)" 2>/dev/null; }

# bounded wait: give up on the perf gate after 2h so a dead perf lane
# cannot strand this one silently (advisor finding, ADVICE.md round 2)
waited=0
until [ -f /tmp/perf_done ] || [ $waited -ge 7200 ]; do
  sleep 30; waited=$((waited + 30))
  [ $((waited % 600)) -eq 0 ] && echo "[r2f $(STAMP)] still waiting on /tmp/perf_done (${waited}s)"
done

for seed in 3007 3008 3009 3010 3011 3012; do
  key="probe_reference_seed${seed}"
  if have "$key"; then echo "[r2f $(STAMP)] skip $key"; continue; fi
  echo "[r2f $(STAMP)] start $key"
  OMP_NUM_THREADS=2 MKL_NUM_THREADS=2 timeout 1800 \
    python scripts/period0_probe.py --side reference --platform cpu \
      --root $ROOT --seed $seed --key $key >> /tmp/r2f_probes.log 2>&1
  echo "[r2f $(STAMP)] done $key rc=$?"
done
echo "[r2f $(STAMP)] lane done"
