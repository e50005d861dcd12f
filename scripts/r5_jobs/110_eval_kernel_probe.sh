#!/bin/bash
cd /root/repo
timeout 2400 python scripts/eval_kernel_probe.py --out /tmp/eval_kernel_probe.json
timeout 2400 python scripts/eval_kernel_probe.py --items 122880 --trials 6 --out /tmp/eval_kernel_probe_120k.json
