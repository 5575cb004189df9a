#!/bin/bash
# Round-4 chip queue, phase C (chained behind phase B): the measured
# support matrix — one on-chip number per advertised (W x A) pair.
set -u
export PYTHONPATH="/root/repo:${PYTHONPATH:-}"
LOG=/tmp/chipq_r4c
mkdir -p $LOG

while ! grep -q "phase B done" /tmp/chipq_r4b/queue.log 2>/dev/null; do
  sleep 30
done

gate() {
  while true; do
    python /root/repo/scripts/health_wait.py 14400 >> $LOG/gate.log 2>&1 \
      && break
    echo "$(date +%T) gate expired, looping" >> $LOG/gate.log
  done
}

stage() {
  local name=$1 to=$2; shift 2
  gate
  echo "=== $name start $(date +%T)" | tee -a $LOG/queue.log
  timeout "$to" "$@" > "$LOG/$name.log" 2>&1
  echo "=== $name rc=$? end $(date +%T)" | tee -a $LOG/queue.log
}

stage support_matrix 7200 python /root/repo/scripts/tpu_support_matrix_bench.py
echo "=== phase C done $(date +%T)" | tee -a $LOG/queue.log
