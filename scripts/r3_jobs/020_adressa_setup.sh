#!/bin/bash
# TPU-queue job: regenerate the Adressa (news-protocol) campaign root after
# the /tmp wipe, re-seed results from the repo snapshot, and run OUR side
# at 3 run seeds (VERDICT r2 "Next" #3's "ours" half; ~210 s each on TPU).
# Touches /tmp/adressa_ready for the CPU reference lane.
set -u
cd /root/repo
ROOT=/tmp/adressa_r3
mkdir -p $ROOT
# Re-seed from the round-2 snapshot (same dataset seed -> same bits) so
# already-recorded keys are skipped.
[ -f $ROOT/results.json ] || cp /root/repo/adressa_r2.json $ROOT/results.json
have() { python3 -c "import json,sys; d=json.load(open('$ROOT/results.json')); sys.exit(0 if '$1' in d else 1)" 2>/dev/null; }

[ -d $ROOT/synth ] || python scripts/adressa_run.py --phase gen --root $ROOT
[ -f $ROOT/pre.npz ] || python scripts/adressa_run.py --phase pretrain --root $ROOT

for seed in 2000 2001 2002; do
  key="sml_seed${seed}"
  # round-2's single ours run was recorded under the bare key "sml"
  if [ $seed -eq 2000 ] && have "sml"; then echo "skip $key (r2 'sml')"; continue; fi
  have "$key" && { echo "skip $key"; continue; }
  echo "start $key $(date -u +%H:%M:%S)"
  timeout 3600 python scripts/adressa_run.py --phase sml --root $ROOT \
    --seed $seed --key $key
  echo "done $key rc=$?"
done
touch /tmp/adressa_ready
echo "adressa setup complete"
