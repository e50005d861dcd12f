#!/bin/bash
# Adressa/news protocol end-to-end on CPU (VERDICT item 5 artifact).
set -u
ROOT=${ROOT:-/tmp/adressa_r2}
export JAX_PLATFORMS=cpu
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache_cpu
mkdir -p "$ROOT" /tmp/jaxcache_cpu
cd /root/repo
log() { echo "[adressa $(date +%H:%M:%S)] $*"; }
for PH in gen pretrain sml baselines; do
  if python - "$ROOT" "$PH" <<'EOF'
import json,sys,os
m={"gen":"dataset","pretrain":"pretrain","sml":"sml","baselines":"baselines"}
p=os.path.join(sys.argv[1],'results.json')
d=json.load(open(p)) if os.path.exists(p) else {}
sys.exit(0 if m[sys.argv[2]] in d else 1)
EOF
  then log "skip $PH (done)"; continue; fi
  log "$PH"
  timeout 14400 nice -n 19 taskset -c 2,3 \
    python scripts/adressa_run.py --phase "$PH" --root "$ROOT" \
    || { log "$PH FAILED"; exit 1; }
done
log "adressa campaign done"
