#!/bin/bash
# Reference period-0 probes: estimate the torch driver's bad-stream rate at
# Yelp scale at ~6 min/seed (vs 2.5 h full sweeps). Runs on CPU alongside
# the full reference sweeps (OMP capped so both fit the 4 cores).
set -u
cd /root/repo
ROOT=/tmp/yelp_scale_r2
STAMP() { date -u +%H:%M:%S; }

for seed in 3000 3001 3002 3003 3004 3005 3006 3007 3008 3009; do
  key="probe_reference_seed${seed}"
  if python3 -c "import json,sys; d=json.load(open('$ROOT/results.json')); sys.exit(0 if d.get('$key',{}).get('val_recall_last') is not None else 1)" 2>/dev/null; then
    echo "[refprobe $(STAMP)] skip $key"; continue
  fi
  echo "[refprobe $(STAMP)] start $key"
  OMP_NUM_THREADS=2 JAX_PLATFORMS=cpu timeout 1800 \
    python scripts/period0_probe.py --side reference --platform cpu \
    --root $ROOT --seed $seed >> /tmp/refprobe_runs.log 2>&1
  echo "[refprobe $(STAMP)] done $key rc=$?"
done
echo "[refprobe $(STAMP)] lane done"
