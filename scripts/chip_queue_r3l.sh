#!/bin/bash
# Round-3 chip queue, phase L: re-tune + persist FA hints with the
# diag_sub=bq/2 default (82.4 TF/s causal s2048 vs the 66.0 on record).
# Waits for phase K.
set -u
export PYTHONPATH="/root/repo:${PYTHONPATH:-}"
LOG=/tmp/chipq_r3l
mkdir -p $LOG

while ! grep -q "phase K done" /tmp/chipq_r3k/queue.log 2>/dev/null; do
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

stage flash_check 2400 python /root/repo/scripts/tpu_flash_check.py
stage flash_tune4 5400 python /root/repo/scripts/tpu_flash_tune.py
echo "=== phase L done $(date +%T)" | tee -a $LOG/queue.log
