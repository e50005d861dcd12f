#!/bin/bash
cd /root/repo
timeout 3600 python scripts/scale_engine_run.py --users 5000000 --items 1000000 \
  --snapshot-dtype bfloat16 --key scale_5m_chip_bf16snap_r5 --out /tmp/benchmarks_scale_r5.json
echo rc=$?
