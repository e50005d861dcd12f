#!/bin/bash
cd /root/repo
timeout 3600 python scripts/roofline.py > /tmp/roofline_r5.json 2> /tmp/roofline_r5.log
echo rc=$?
