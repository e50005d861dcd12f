#!/bin/bash
# Session-r2e TPU lane (second host restart wiped /tmp again; dataset and
# pretrain are regenerated deterministically by the caller, results.json is
# re-seeded from the repo snapshot so completed keys are skipped):
#   1. quiet-host perf validation of the upload-overlap (4fa56b5),
#      deferred-eval (cf25590), one-dispatch-phase (9096516) and
#      ready-aware-flush (0b3370f) changes; the first run re-warms the
#      wiped compile cache. Gates the CPU reference lane via /tmp/perf_done.
#   2. guard3 validation: the pair-re-roll saddle guard (e41650f) on all
#      four known-bad seeds + one good no-op seed.
#   3. Adressa regen (gen seed 23 + seeded pretrain, must match the
#      adressa_r2.json snapshot) + two extra SML seeds; readies the CPU
#      lane's news reference phase via /tmp/adressa_ready.
set -u
cd /root/repo
ROOT=/tmp/yelp_scale_r2
export SML_COMPILE_CACHE=/root/.cache/sml_tpu/xla
STAMP() { date -u +%H:%M:%S; }

have() { python3 -c "import json,sys; d=json.load(open('$1/results.json')); sys.exit(0 if '$2' in d else 1)" 2>/dev/null; }

run() {
  local key=$1; shift
  if have $ROOT "$key"; then echo "[r2e $(STAMP)] skip $key"; return; fi
  echo "[r2e $(STAMP)] start $key"
  timeout 4200 python scripts/yelp_scale_sweep.py --phase ours --root $ROOT \
    --key "$key" "$@" >> /tmp/r2e_runs.log 2>&1
  echo "[r2e $(STAMP)] done $key rc=$?"
}

until [ -f /tmp/setup_done ]; do sleep 30; done

# --- 1. quiet-host perf lane (first run warms the wiped compile cache) ---
run "perf_r2d_cold_seed2000" --seed 2000
run "perf_r2d_warm_seed2000" --seed 2000
run "perf_r2d_faithful_cold_seed2000" --seed 2000 --evals
run "perf_r2d_faithful_warm_seed2000" --seed 2000 --evals
touch /tmp/perf_done
echo "[r2e $(STAMP)] perf section done"

# --- 2. guard3 validation (pair re-roll) on the known-bad seeds ---
for seed in 2001 2003 2004 4007 2005; do
  run "ours_guard3_seed${seed}" --seed $seed --saddle-retries 3 \
    --log /tmp/diag_guard3_$seed.jsonl
done
echo "[r2e $(STAMP)] guard section done"

# --- 3. Adressa regen + extra SML seeds ---
ADR=/tmp/adressa
if [ ! -f $ADR/results.json ]; then
  echo "[r2e $(STAMP)] adressa gen"
  python scripts/adressa_run.py --phase gen --root $ADR \
    >> /tmp/adressa_ref_runs.log 2>&1
fi
if [ ! -f $ADR/pre.npz ]; then
  echo "[r2e $(STAMP)] adressa pretrain"
  python scripts/adressa_run.py --phase pretrain --root $ADR \
    >> /tmp/adressa_ref_runs.log 2>&1
fi
python3 - <<'EOF'
import json
old = json.load(open('/root/repo/adressa_r2.json'))
path = '/tmp/adressa/results.json'
new = json.load(open(path))
for k, v in old.items():
    new.setdefault(k, v)
json.dump(new, open(path, 'w'), indent=1)
EOF
touch /tmp/adressa_ready
for seed in 2001 2002; do
  key="sml_seed${seed}"
  if have $ADR "$key"; then echo "[r2e $(STAMP)] skip $key"; continue; fi
  echo "[r2e $(STAMP)] start adressa $key"
  timeout 3600 python scripts/adressa_run.py --phase sml --root $ADR \
    --seed $seed --key $key >> /tmp/adressa_ref_runs.log 2>&1
  echo "[r2e $(STAMP)] done adressa $key rc=$?"
done
echo "[r2e $(STAMP)] lane done"
