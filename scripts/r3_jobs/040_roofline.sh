#!/bin/bash
# TPU-queue job: roofline/MFU measurements for BASELINE.md (VERDICT r2
# Weak #4 / "Next" #6).
set -u
cd /root/repo
echo "start roofline $(date -u +%H:%M:%S)"
timeout 3000 python scripts/roofline.py > /tmp/roofline_r3.json
rc=$?
echo "done rc=$rc $(date -u +%H:%M:%S)"
# never clobber a good checked-in copy with a truncated one
if [ $rc -eq 0 ] && python3 -m json.tool /tmp/roofline_r3.json >/dev/null 2>&1; then
  cp /tmp/roofline_r3.json /root/repo/roofline_r3.json
else
  echo "roofline output invalid; repo copy left untouched"
fi
