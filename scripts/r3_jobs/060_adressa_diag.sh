#!/bin/bash
# TPU-queue job: Adressa-side stream-variance diagnostics. Ours seed 2001
# landed far below the pack (weighted r@20 0.038 vs 0.055/0.065 and the
# reference's 0.058) - test whether the news protocol has the same
# first-period saddle pathology and whether the (yelp-calibrated,
# phase-clamped) guard rescues it. Plus two more unguarded seeds for the
# ours-side spread.
set -u
cd /root/repo
ROOT=/tmp/adressa_r3
have() { python3 -c "import json,sys; d=json.load(open('$ROOT/results.json')); sys.exit(0 if '$1' in d else 1)" 2>/dev/null; }
run() {
  local key=$1; shift
  have "$key" && { echo "skip $key"; return; }
  echo "start $key $(date -u +%H:%M:%S)"
  timeout 3600 python scripts/adressa_run.py --phase sml --root $ROOT \
    --key "$key" "$@"
  echo "done $key rc=$?"
}
run "sml_seed2001_diag" --seed 2001 --log /tmp/adressa_diag_2001.jsonl
run "sml_seed2001_guard" --seed 2001 --saddle-retries 2 \
    --log /tmp/adressa_guard_2001.jsonl
run "sml_seed2003" --seed 2003
run "sml_seed2004" --seed 2004
run "sml_seed2005" --seed 2005
echo "adressa diag complete"
