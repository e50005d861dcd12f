#!/bin/bash
# Restarted refbad lane (the original r2_refbad_lane.sh died with the host):
# full-sweep reference runs at the two torch seeds whose period-0 probes
# stalled (3002 hard 1.38, 3006 soft 1.15 — probe_reference_* keys). Waits
# for /tmp/perf_done so the CPU-heavy reference never contends with the
# quiet-host perf timings in r2d_recover_lanes.sh.
set -u
cd /root/repo
ROOT=/tmp/yelp_scale_r2
STAMP() { date -u +%H:%M:%S; }

until [ -f /tmp/perf_done ]; do sleep 120; done

for seed in 3002 3006; do
  key="reference_seed${seed}"
  if python3 -c "import json,sys; d=json.load(open('$ROOT/results.json')); sys.exit(0 if '$key' in d else 1)" 2>/dev/null; then
    echo "[refbad $(STAMP)] skip $key"; continue
  fi
  echo "[refbad $(STAMP)] start $key"
  OMP_NUM_THREADS=2 MKL_NUM_THREADS=2 timeout 14400 \
    python scripts/yelp_scale_sweep.py --phase reference --platform cpu \
      --root $ROOT --seed $seed --key $key >> /tmp/refbad_runs.log 2>&1
  echo "[refbad $(STAMP)] done $key rc=$?"
done
echo "[refbad $(STAMP)] lane done"
