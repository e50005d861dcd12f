#!/bin/bash
# TPU-queue job: the round-3 product-default fleet claim. Uniform shapes
# changed every run's stream realization (shuffle keys are shape-dependent),
# so the r2 seed landscape does not carry over. This job (a) probes period 0
# at 12 fresh seeds under the new shapes to find the new bad-stream tail,
# (b) runs the FULL sweep at the same 12 seeds with the CLI-default guard
# (saddle_retries=2) to show the fleet lands in one mode.
set -u
cd /root/repo
ROOT=/tmp/yelp_scale_r2
have() { python3 -c "import json,sys; d=json.load(open('$ROOT/results.json')); sys.exit(0 if '$1' in d else 1)" 2>/dev/null; }

for seed in 5000 5001 5002 5003 5004 5005 5006 5007 5008 5009 5010 5011; do
  key="probe_r3u_seed${seed}"
  have "$key" || {
    echo "start $key $(date -u +%H:%M:%S)"
    timeout 1800 python scripts/period0_probe.py --side ours \
      --root $ROOT --seed $seed --key $key
    echo "done $key rc=$?"
  }
done

for seed in 5000 5001 5002 5003 5004 5005 5006 5007 5008 5009 5010 5011; do
  key="ours_r3u_guard_seed${seed}"
  have "$key" || {
    echo "start $key $(date -u +%H:%M:%S)"
    timeout 4200 python scripts/yelp_scale_sweep.py --phase ours \
      --root $ROOT --seed $seed --key $key --saddle-retries 2
    echo "done $key rc=$?"
  }
done
echo "guard fleet section complete"
