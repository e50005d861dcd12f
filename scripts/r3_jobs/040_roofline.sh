#!/bin/bash
# TPU-queue job: roofline/MFU measurements for BASELINE.md (VERDICT r2
# Weak #4 / "Next" #6).
set -u
cd /root/repo
echo "start roofline $(date -u +%H:%M:%S)"
timeout 3000 python scripts/roofline.py > /tmp/roofline_r3.json
echo "done rc=$? $(date -u +%H:%M:%S)"
cp /tmp/roofline_r3.json /root/repo/roofline_r3.json
