#!/bin/bash
# Measure-first probe for VERDICT r3 Weak #3: the refresh kernel's FC
# matmuls with bf16 inputs / f32 accumulation
# (TransferConfig.refresh_matmul_bf16) vs the f32 kernel, plus the
# numeric drift, on the real chip. Refresh section only.
set -u
cd /root/repo
for attempt in 1 2; do
  timeout 1800 python scripts/roofline.py --sections refresh \
      > /tmp/refresh_bf16_probe.json
  rc=$?
  echo "refresh probe attempt $attempt rc=$rc"
  [ $rc -eq 0 ] && break
  sleep 60
done
