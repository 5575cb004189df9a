#!/bin/bash
# Round-4 chip queue, phase S (chained behind phase R): re-run the
# extended smoke (e5m2 + all int8-codes widths added post phase-R).
set -u
export PYTHONPATH="/root/repo:${PYTHONPATH:-}"
LOG=/tmp/chipq_r4s
mkdir -p $LOG

while ! grep -q "phase R done" /tmp/chipq_r4r/queue.log 2>/dev/null; do
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

stage smoke4 3600 python /root/repo/scripts/tpu_format_smoke.py
echo "=== phase S done $(date +%T)" | tee -a $LOG/queue.log
