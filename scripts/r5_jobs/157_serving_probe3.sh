#!/bin/bash
cd /root/repo
timeout 2400 python scripts/serving_probe.py --out /tmp/serving_probe3.json
