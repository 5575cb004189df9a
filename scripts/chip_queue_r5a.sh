#!/bin/bash
# Round-5 chip queue, phase A: on-chip smoke + Mosaic gate recheck
# (standing cadence — libtpu bump detection before any new probe work).
set -u
export PYTHONPATH="/root/repo:${PYTHONPATH:-}"
LOG=/tmp/chipq_r5a
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

stage smoke 2400 python /root/repo/scripts/tpu_format_smoke.py
stage gate_recheck 2400 python /root/repo/scripts/tpu_gate_recheck.py
echo "=== phase A done $(date +%T)" | tee -a $LOG/queue.log
