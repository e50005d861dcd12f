#!/bin/bash
# Variance-source ablation at full Yelp scale (runs after the nows lane):
#   A (thfix):  theta init frozen (theta_seed=777), data stream varies
#   B (strfix): data stream frozen (seed=777), theta init varies
# Whichever axis reproduces the nows spread is the variance source.
set -u
cd /root/repo
ROOT=/tmp/yelp_scale_r2
STAMP() { date -u +%H:%M:%S; }

# wait until every nows-lane key exists (the nows lane owns the TPU until
# then; pgrep alone would race the gap between its sequential runs)
until python3 - <<'EOF'
import json, sys
d = json.load(open("/tmp/yelp_scale_r2/results.json"))
need = [f"ours_nows_seed{s}" for s in (2000, 2001, 2002, 2003, 2004, 2005, 2006, 2007)]
sys.exit(0 if all(k in d for k in need) else 1)
EOF
do sleep 120; done
while pgrep -f "yelp_scale_sweep.py --phase ours" > /dev/null; do sleep 60; done

run() {
  local key=$1; shift
  if python3 -c "import json,sys; d=json.load(open('$ROOT/results.json')); sys.exit(0 if '$key' in d else 1)"; then
    echo "[abl $(STAMP)] skip $key"; return
  fi
  echo "[abl $(STAMP)] start $key"
  timeout 3600 python scripts/yelp_scale_sweep.py --phase ours --root $ROOT \
    --key "$key" "$@" >> /tmp/abl_lane.log 2>&1
  echo "[abl $(STAMP)] done $key rc=$?"
}

for seed in 3000 3001 3002 3003; do
  run "ours_thfix_seed${seed}" --seed $seed --theta-seed 777
done
for ts in 3000 3001 3002 3003; do
  run "ours_strfix_th${ts}" --seed 777 --theta-seed $ts
done
echo "[abl $(STAMP)] ablation lane done"
