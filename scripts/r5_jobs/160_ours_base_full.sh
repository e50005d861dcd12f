#!/bin/bash
# VERDICT r4 "Next" #9 measurement: Yelp-scale ours-side baseline walls
# after the baseline-driver tunnel hygiene (uniform shapes, one eval
# upload per period, deferred finals). r4: full 733 s / fine 355 s /
# spmf 418 s; target full <= 500 s with identical metrics.
set -u
cd /root/repo
ROOT=/tmp/yelp_scale_r2
for spec in full:3 fine:10 spmf:10; do
  m=${spec%%:*}; e=${spec##*:}
  echo "start ours_baseline_${m}_r5 $(date -u +%H:%M:%S)"
  timeout 4200 python scripts/yelp_scale_sweep.py --phase baseline \
    --root $ROOT --method $m --epochs $e --seed 2000 \
    --key ours_baseline_${m}_r5
  echo "rc=$?"
done
python3 - <<'PYEOF'
import json
d = json.load(open("/tmp/yelp_scale_r2/results.json"))
for k in sorted(d):
    if k.startswith("ours_baseline") and k.endswith("_r5"):
        print(k, json.dumps(d[k])[:300])
PYEOF
