#!/bin/bash
# Round-3 (resumed session) post-perf-block sequence, run once the 090
# quiet block exits: adressa pretrain (TPU) -> two extra faithful warm
# samples (the n=3 spread was 76-287 s; n=5 + a tunnel probe lets
# BASELINE.md separate steady-state from tunnel noise) -> tunnel probe ->
# bench.py twice (first pins the torch baseline, second proves +-10%
# stability) -> open the lane gates.
set -u
cd /root/repo
YROOT=/tmp/yelp_scale_r2
AROOT=/tmp/adressa_r3
STAMP() { date -u +%H:%M:%S; }

echo "[post $(STAMP)] adressa pretrain"
timeout 1200 python scripts/adressa_run.py --phase pretrain --root $AROOT \
  >> /tmp/r3b_adressa_pre.log 2>&1
pre_rc=$?
echo "[post $(STAMP)] adressa pretrain rc=$pre_rc"
# only open the adressa gate when pretrain actually landed (ADVICE r3:
# an unconditional touch made the CPU reference lanes start against a
# missing root and burn their full timeouts)
if [ $pre_rc -eq 0 ] && python3 -c "
import json, sys
d = json.load(open('$AROOT/results.json'))
print('adressa pretrain:', d.get('pretrain'))
sys.exit(0 if d.get('pretrain') else 1)"; then
  touch /tmp/adressa_ready
else
  echo "[post $(STAMP)] adressa pretrain FAILED - gate stays closed"
fi

for i in 4 5; do
  echo "[post $(STAMP)] faithful_warm_$i"
  timeout 4200 python scripts/yelp_scale_sweep.py --phase ours --root $YROOT \
    --key "perf_r3_final_faithful_warm_$i" --seed 2000 --evals \
    >> /tmp/r3b_postblock_runs.log 2>&1
done

echo "[post $(STAMP)] tunnel probe"
bash scripts/r3_jobs/045_tunnel_bw.sh > /tmp/tunnel_bw_r3.log 2>&1

echo "[post $(STAMP)] bench run 1 (pins torch baseline)"
SML_BENCH_REMEASURE=1 timeout 2400 python bench.py > /tmp/bench_run1.json 2>/tmp/bench_run1.log
echo "[post $(STAMP)] bench run 2 (stability)"
timeout 2400 python bench.py > /tmp/bench_run2.json 2>/tmp/bench_run2.log
cat /tmp/bench_run1.json /tmp/bench_run2.json

touch /tmp/perf_done_r3
echo "[post $(STAMP)] gates open"
