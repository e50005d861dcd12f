#!/bin/bash
# Extend the final-revision accuracy fleets: Yelp guard fleet to n=12,
# and a fresh n=6 Adressa guard fleet on the r5 revision.
set -u
cd /root/repo
YROOT=/tmp/yelp_scale_r2
AROOT=/tmp/adressa_r3
have() { python3 -c "import json,sys; d=json.load(open('$1')); sys.exit(0 if '$2' in d else 1)" 2>/dev/null; }
for s in 2007 2008 2009 2010 2011 2012; do
  key="ours_r5_guard_seed$s"
  have $YROOT/results.json "$key" && { echo "skip $key"; continue; }
  echo "start $key $(date -u +%H:%M:%S)"
  timeout 4200 python scripts/yelp_scale_sweep.py --phase ours --root $YROOT \
    --key "$key" --seed $s --evals --saddle-retries 2 --fuse-period on
  echo "done $key rc=$? $(date -u +%H:%M:%S)"
done
for s in 2001 2002 2003 2004 2005 2006; do
  key="ours_r5_aguard_seed$s"
  have $AROOT/results.json "$key" && { echo "skip $key"; continue; }
  echo "start $key $(date -u +%H:%M:%S)"
  timeout 4200 python scripts/adressa_run.py --phase sml --root $AROOT \
    --key "$key" --seed $s --saddle-retries 2 --fuse-period on
  echo "done $key rc=$? $(date -u +%H:%M:%S)"
done
