#!/bin/bash
# Round-2 Yelp-scale campaign (VERDICT items 1 + 6):
#   - 5 run seeds with theta warm-start -> seed-robust accuracy parity
#   - 1 run with always-on in-training evals -> wall-clock-faithful speedup
# Appends each phase to $ROOT/results.json. Runs sequentially on the one
# real TPU chip; persistent compile cache shared across runs.
set -u
ROOT=${ROOT:-/tmp/yelp_scale_r2}
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
mkdir -p "$ROOT" /tmp/jaxcache
cd /root/repo

log() { echo "[campaign $(date +%H:%M:%S)] $*"; }

if [ ! -f "$ROOT/synth/information.npy" ]; then
  log "gen"
  timeout 1200 python scripts/yelp_scale_sweep.py --phase gen --root "$ROOT" || exit 1
fi
if [ ! -f "$ROOT/pre.npz" ]; then
  log "pretrain"
  timeout 1800 python scripts/yelp_scale_sweep.py --phase pretrain --root "$ROOT" || exit 1
fi

for SEED in 2000 2001 2002 2003 2004; do
  if python - "$ROOT" "ours_ws_seed$SEED" <<'EOF'
import json,sys,os
p=os.path.join(sys.argv[1],'results.json')
d=json.load(open(p)) if os.path.exists(p) else {}
sys.exit(0 if sys.argv[2] in d else 1)
EOF
  then log "skip seed $SEED (done)"; continue; fi
  log "ours warmstart seed $SEED"
  timeout 3600 python scripts/yelp_scale_sweep.py --phase ours --root "$ROOT" \
    --seed "$SEED" --warmstart 400 --key "ours_ws_seed$SEED" \
    || log "seed $SEED FAILED"
done

log "ours faithful (evals on) seed 2000"
if ! python - "$ROOT" ours_faithful_seed2000 <<'EOF'
import json,sys,os
p=os.path.join(sys.argv[1],'results.json')
d=json.load(open(p)) if os.path.exists(p) else {}
sys.exit(0 if 'ours_faithful_seed2000' in d else 1)
EOF
then
  timeout 5400 python scripts/yelp_scale_sweep.py --phase ours --root "$ROOT" \
    --seed 2000 --warmstart 400 --evals --key ours_faithful_seed2000 \
    || log "faithful FAILED"
fi
log "campaign done"
