#!/bin/bash
cd /root/repo
timeout 1800 python scripts/eval_kernel_probe2.py --out /tmp/eval_kernel_probe2.json
timeout 1800 python scripts/eval_kernel_probe2.py --items 122880 --n 8 --trials 5 --out /tmp/eval_kernel_probe2_120k.json
