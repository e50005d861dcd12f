#!/bin/bash
# VERDICT r4 "Next" #4 measurement: (a) default-config ('auto') faithful
# cold sweep on a FRESH compile cache + fresh marker dir — must run
# unfused at the ~112 s class; (b) --fuse-period on, same cache — pays the
# ONE deduped scan compile (round-4: two programs, ~26 min; now one);
# (c) 'auto' again — the marker from (b) unlocks the fused path at
# warm-cache cost.
set -u
cd /root/repo
ROOT=/tmp/yelp_scale_r2
COLD=/tmp/sml_xla_r5_cold
MARK=/tmp/sml_marker_r5_cold
rm -rf $COLD $MARK
STAMP() { date -u +%H:%M:%S; }
echo "[120 $(STAMP)] (a) auto cold (fresh cache)"
SML_COMPILE_CACHE=$COLD SML_TPU_CACHE_DIR=$MARK timeout 3600 \
  python scripts/yelp_scale_sweep.py --phase ours --root $ROOT --evals \
  --seed 2000 --key perf_r5_auto_cold
echo "[120 $(STAMP)] (a) rc=$? markers: $(ls $MARK/fused_markers 2>/dev/null | wc -l)"
echo "[120 $(STAMP)] (b) fuse-period on (one deduped compile)"
SML_COMPILE_CACHE=$COLD SML_TPU_CACHE_DIR=$MARK timeout 10800 \
  python scripts/yelp_scale_sweep.py --phase ours --root $ROOT --evals \
  --seed 2000 --fuse-period on --key perf_r5_fused_compile
echo "[120 $(STAMP)] (b) rc=$? markers: $(ls $MARK/fused_markers 2>/dev/null | wc -l)"
echo "[120 $(STAMP)] (c) auto again (marker -> fused, warm cache)"
SML_COMPILE_CACHE=$COLD SML_TPU_CACHE_DIR=$MARK timeout 3600 \
  python scripts/yelp_scale_sweep.py --phase ours --root $ROOT --evals \
  --seed 2000 --key perf_r5_auto_warmfused
echo "[120 $(STAMP)] (c) rc=$?"
