#!/bin/bash
# TPU-queue job: primitive decomposition of the eval hot path
# (VERDICT r3 "Next" #4). Output informs the production fast-eval mode.
set -u
cd /root/repo
timeout 3600 python scripts/eval_probe.py > /tmp/eval_probe_r4.json
echo "eval_probe rc=$?"
