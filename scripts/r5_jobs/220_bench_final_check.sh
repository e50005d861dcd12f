#!/bin/bash
cd /root/repo
timeout 1800 python bench.py > /tmp/bench_r5_final.json 2> /tmp/bench_r5_final.log
echo "rc=$?"
cat /tmp/bench_r5_final.json
