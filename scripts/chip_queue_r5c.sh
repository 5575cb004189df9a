#!/bin/bash
# Round-5 chip queue, phase C: flash second-window + coverage (VERDICT
# item 5) and the 8B-scale device-side serving step (item 6).
set -u
export PYTHONPATH="/root/repo:${PYTHONPATH:-}"
LOG=/tmp/chipq_r5c
mkdir -p $LOG

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

stage flash_r5 7200 python /root/repo/scripts/tpu_flash_r5.py
stage serving_8b 5400 python /root/repo/scripts/benchmark_serving_8b.py
echo "=== phase C done $(date +%T)" | tee -a $LOG/queue.log
