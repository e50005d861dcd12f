#!/bin/bash
# Regression check of the fused-period revision at the news shape: one
# guarded SML run, seed 2000, must land in the guarded fleet's band
# (0.0493-0.0661 test r@20) with the usual ~3-4 min wall.
set -u
cd /root/repo
ROOT=/tmp/adressa_r3
have() { python3 -c "import json,sys; d=json.load(open('$ROOT/results.json')); sys.exit(0 if '$1' in d else 1)" 2>/dev/null; }
have "sml_seed2000_fusedperiod" && { echo "skip"; exit 0; }
timeout 4200 python scripts/adressa_run.py --phase sml --root $ROOT \
    --seed 2000 --saddle-retries 2 --key sml_seed2000_fusedperiod
echo "adressa fused check rc=$?"
python3 -c "
import json
v = json.load(open('$ROOT/results.json'))['sml_seed2000_fusedperiod']
print('test r@20:', v.get('summary', {}).get('test_recall@20'),
      'seconds:', v.get('total_seconds'))
"
