#!/bin/bash
# Validate the round-5 stall-proof bench protocol on the real chip.
cd /root/repo
timeout 1800 python bench.py > /tmp/bench_r5_check.json 2> /tmp/bench_r5_check.log
echo "rc=$?"
cat /tmp/bench_r5_check.json
