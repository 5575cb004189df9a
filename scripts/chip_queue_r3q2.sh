#!/bin/bash
# Round-3 chip queue, phase Q2: in-window head-to-head (curated i2 large-M
# vs the taller-bm challenger phase Q surfaced at 8192), then the phase-R
# work (tp=8 m=16 serving cells + JSON export). Waits for phase Q.
set -u
export PYTHONPATH="/root/repo:${PYTHONPATH:-}"
LOG=/tmp/chipq_r3q2
mkdir -p $LOG

while ! grep -q "phase Q done" /tmp/chipq_r3q/queue.log 2>/dev/null; do
  sleep 15
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

stage headtohead 2400 python /root/repo/scripts/tpu_largem_headtohead.py
stage tp8_m16 5400 python /root/repo/scripts/tune_tp_serving_db.py 8 16 6
stage export 600 python /root/repo/scripts/export_tp_serving_hints.py
echo "=== phase Q2 done $(date +%T)" | tee -a $LOG/queue.log
