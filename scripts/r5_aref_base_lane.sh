#!/bin/bash
# Round-5 reference-side Adressa baselines lane (VERDICT r4 "Next" #6):
# full / fine / spmf through the imported reference driver at the news
# protocol (63 periods, start 48, epochs 20, pool_init_type=1 early stop)
# on the shared dataset + pretrain. One method per invocation, pinned to
# one core (CPU-only platform — never touches the TPU; tpuq owns that).
# Per-stage checkpointed: a host restart resumes at the last stage.
# Usage: r5_aref_base_lane.sh <core> <method>
set -u
cd /root/repo
ROOT=/tmp/adressa_r3
CORE=$1; METHOD=$2
KEY="ref_baseline_${METHOD}"
STAMP() { date -u +%H:%M:%S; }
have() { python3 -c "import json,sys; d=json.load(open('$ROOT/results.json')); sys.exit(0 if '$1' in d else 1)" 2>/dev/null; }

if have "$KEY"; then echo "[arefbase$CORE $(STAMP)] skip $KEY"; exit 0; fi
echo "[arefbase$CORE $(STAMP)] start $KEY"
OMP_NUM_THREADS=1 MKL_NUM_THREADS=1 JAX_PLATFORMS=cpu timeout 60000 \
  nice -n 10 taskset -c $CORE python scripts/adressa_run.py \
    --phase ref-baselines --platform cpu --root $ROOT \
    --method $METHOD --seed 3000 \
    --ckpt $ROOT/ref_base_${METHOD}.ckpt
echo "[arefbase$CORE $(STAMP)] done $KEY rc=$?"
