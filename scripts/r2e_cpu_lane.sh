#!/bin/bash
# Session-r2e CPU lane: the reference sweeps lost to both host restarts.
# Waits for /tmp/perf_done so the CPU-heavy torch runs never contend with
# the quiet-host perf timings, then:
#   1. full reference sweeps at the probe-stalled torch seeds (3002 hard
#      probe outer 1.38, 3006 soft 1.15) — end-to-end evidence that the
#      reference shares the period-0 saddle tail;
#   2. the Adressa news-protocol reference phase once the TPU lane has
#      regenerated /tmp/adressa (gated on /tmp/adressa_ready).
set -u
cd /root/repo
ROOT=/tmp/yelp_scale_r2
STAMP() { date -u +%H:%M:%S; }

have() { python3 -c "import json,sys; d=json.load(open('$1/results.json')); sys.exit(0 if '$2' in d else 1)" 2>/dev/null; }

until [ -f /tmp/perf_done ]; do sleep 60; done

for seed in 3002 3006; do
  key="reference_seed${seed}"
  if have $ROOT "$key"; then echo "[r2e-cpu $(STAMP)] skip $key"; continue; fi
  echo "[r2e-cpu $(STAMP)] start $key"
  OMP_NUM_THREADS=2 MKL_NUM_THREADS=2 timeout 14400 \
    python scripts/yelp_scale_sweep.py --phase reference --platform cpu \
      --root $ROOT --seed $seed --key $key >> /tmp/refbad_runs.log 2>&1
  echo "[r2e-cpu $(STAMP)] done $key rc=$?"
done
echo "[r2e-cpu $(STAMP)] refbad section done"

until [ -f /tmp/adressa_ready ]; do sleep 60; done
for seed in 2000 2001; do
  key="reference_seed${seed}"
  if have /tmp/adressa "$key"; then echo "[r2e-cpu $(STAMP)] skip $key"; continue; fi
  echo "[r2e-cpu $(STAMP)] start adressa $key"
  OMP_NUM_THREADS=2 MKL_NUM_THREADS=2 timeout 14400 \
    python scripts/adressa_run.py --phase reference --platform cpu \
      --root /tmp/adressa --seed $seed >> /tmp/adressa_ref_runs.log 2>&1
  echo "[r2e-cpu $(STAMP)] done adressa $key rc=$?"
done
echo "[r2e-cpu $(STAMP)] lane done"
