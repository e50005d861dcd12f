#!/bin/bash
# Serial TPU job queue: exactly one TPU process at a time, ever.
# Jobs are shell files dropped into /tmp/tpuq/pending/NNN_name.sh; the
# runner executes them in lexical order, logging to /tmp/tpuq/logs/.
# Enqueue with: cp job.sh /tmp/tpuq/pending/   (or scripts/tpuq_add.sh)
# Stop the runner with: touch /tmp/tpuq/STOP
set -u
Q=/tmp/tpuq
mkdir -p $Q/pending $Q/running $Q/done $Q/logs
STAMP() { date -u +%H:%M:%S; }
echo "[tpuq $(STAMP)] runner up (pid $$)"
while true; do
  [ -f $Q/STOP ] && { echo "[tpuq $(STAMP)] STOP file seen, exiting"; exit 0; }
  job=$(ls $Q/pending 2>/dev/null | sort | head -1)
  if [ -z "$job" ]; then sleep 15; continue; fi
  mv "$Q/pending/$job" "$Q/running/$job"
  echo "[tpuq $(STAMP)] start $job"
  bash "$Q/running/$job" > "$Q/logs/${job%.sh}.log" 2>&1
  rc=$?
  mv "$Q/running/$job" "$Q/done/$job"
  echo "[tpuq $(STAMP)] done $job rc=$rc"
done
