#!/bin/bash
# Round-3 chip queue, phase I: decide the causal-flash diagonal strategy
# in one window (diag_sub sweep). Waits for phase H.
set -u
export PYTHONPATH="/root/repo:${PYTHONPATH:-}"
LOG=/tmp/chipq_r3i
mkdir -p $LOG

while ! grep -q "phase H done" /tmp/chipq_r3h/queue.log 2>/dev/null; do
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

stage flash_diag 3600 python /root/repo/scripts/tpu_flash_diag_probe.py
echo "=== phase I done $(date +%T)" | tee -a $LOG/queue.log
