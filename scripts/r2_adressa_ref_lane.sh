#!/bin/bash
# Adressa (news-protocol) accuracy parity: run the REFERENCE driver on the
# same synthetic news dataset + shared pretrain that adressa_r2.json's sml
# key used. Round-1/2 parity was Yelp-protocol only; this closes the news
# side. Regenerates /tmp/adressa (deterministic: gen seed 23, seeded
# pretrain — metrics must match the adressa_r2.json snapshot) and chains
# behind the CPU-heavy refbad lane.
set -u
cd /root/repo
ROOT=/tmp/adressa
export SML_COMPILE_CACHE=/root/.cache/sml_tpu/xla
STAMP() { date -u +%H:%M:%S; }

until grep -q "lane done" /tmp/refbad_lane.log 2>/dev/null; do sleep 180; done

if [ ! -f $ROOT/results.json ]; then
  echo "[adr $(STAMP)] gen"
  python scripts/adressa_run.py --phase gen --root $ROOT \
    >> /tmp/adressa_ref_runs.log 2>&1
fi
if [ ! -f $ROOT/pre.npz ]; then
  echo "[adr $(STAMP)] pretrain"
  python scripts/adressa_run.py --phase pretrain --root $ROOT \
    >> /tmp/adressa_ref_runs.log 2>&1
fi
# seed results.json with the repo snapshot (sml seed-2000 + baselines)
python3 - <<'EOF'
import json
old = json.load(open('/root/repo/adressa_r2.json'))
path = '/tmp/adressa/results.json'
new = json.load(open(path))
for k, v in old.items():
    new.setdefault(k, v)
json.dump(new, open(path, 'w'), indent=1)
EOF
# extra SML seeds for a spread comparison (TPU, short)
for seed in 2001 2002; do
  key="sml_seed${seed}"
  if python3 -c "import json,sys; d=json.load(open('$ROOT/results.json')); sys.exit(0 if '$key' in d else 1)" 2>/dev/null; then
    echo "[adr $(STAMP)] skip $key"; continue
  fi
  echo "[adr $(STAMP)] start $key"
  timeout 3600 python scripts/adressa_run.py --phase sml --root $ROOT \
    --seed $seed --key $key >> /tmp/adressa_ref_runs.log 2>&1
  echo "[adr $(STAMP)] done $key rc=$?"
done
for seed in 2000 2001; do
  key="reference_seed${seed}"
  if python3 -c "import json,sys; d=json.load(open('$ROOT/results.json')); sys.exit(0 if '$key' in d else 1)" 2>/dev/null; then
    echo "[adr $(STAMP)] skip $key"; continue
  fi
  echo "[adr $(STAMP)] start $key"
  OMP_NUM_THREADS=2 MKL_NUM_THREADS=2 timeout 14400 \
    python scripts/adressa_run.py --phase reference --platform cpu \
      --root $ROOT --seed $seed >> /tmp/adressa_ref_runs.log 2>&1
  echo "[adr $(STAMP)] done $key rc=$?"
done
echo "[adr $(STAMP)] lane done"
