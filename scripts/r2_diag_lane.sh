#!/bin/bash
# Instrumented reruns of one GOOD (2000, mean10 0.0576) and one BAD
# (2001, 0.0490) nows seed with log_norms diagnostics: per-phase losses +
# table/snapshot/theta norms to jsonl. Pinpoints WHEN the bad seed loses
# its constant offset (which warm-up period, inner vs outer vs refresh).
set -u
cd /root/repo
ROOT=/tmp/yelp_scale_r2
STAMP() { date -u +%H:%M:%S; }

# wait for the ablation lane's final key
until python3 - <<'EOF'
import json, sys
d = json.load(open("/tmp/yelp_scale_r2/results.json"))
sys.exit(0 if "ours_strfix_th3003" in d else 1)
EOF
do sleep 120; done
while pgrep -f "yelp_scale_sweep.py --phase ours" > /dev/null; do sleep 60; done

for seed in 2000 2001; do
  key="ours_diag_seed${seed}"
  if python3 -c "import json,sys; d=json.load(open('$ROOT/results.json')); sys.exit(0 if '$key' in d else 1)"; then
    echo "[diag $(STAMP)] skip $key"; continue
  fi
  echo "[diag $(STAMP)] start $key"
  timeout 3600 python scripts/yelp_scale_sweep.py --phase ours --root $ROOT \
    --seed $seed --key $key --log /tmp/diag_nows${seed}.jsonl \
    >> /tmp/diag_lane_runs.log 2>&1
  echo "[diag $(STAMP)] done $key rc=$?"
done
echo "[diag $(STAMP)] diag lane done"
