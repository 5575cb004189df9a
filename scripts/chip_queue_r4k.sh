#!/bin/bash
# Round-4 chip queue, phase K (chained behind phase J): W2A8-scaled
# m=4096 hint probe (support-matrix crash cell triage).
set -u
export PYTHONPATH="/root/repo:${PYTHONPATH:-}"
LOG=/tmp/chipq_r4k
mkdir -p $LOG

while ! grep -q "phase J done" /tmp/chipq_r4j/queue.log 2>/dev/null; do
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

stage w2a8probe 3600 python /root/repo/scripts/tpu_w2a8_scaled_probe.py
echo "=== phase K done $(date +%T)" | tee -a $LOG/queue.log
