#!/bin/bash
# Round-4 chip queue, phase R (chained behind phase Q): extended smoke
# on-chip (pallas-decode rows are new Mosaic surface).
set -u
export PYTHONPATH="/root/repo:${PYTHONPATH:-}"
LOG=/tmp/chipq_r4r
mkdir -p $LOG

while ! grep -q "phase Q done" /tmp/chipq_r4q/queue.log 2>/dev/null; do
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

stage smoke3 3600 python /root/repo/scripts/tpu_format_smoke.py
echo "=== phase R done $(date +%T)" | tee -a $LOG/queue.log
