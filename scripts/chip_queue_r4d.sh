#!/bin/bash
# Round-4 chip queue, phase D (chained behind phase C): first recorded
# on-chip MoE (Mixtral-geometry) decode numbers.
set -u
export PYTHONPATH="/root/repo:${PYTHONPATH:-}"
LOG=/tmp/chipq_r4d
mkdir -p $LOG

while ! grep -q "phase C done" /tmp/chipq_r4c/queue.log 2>/dev/null; do
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

stage moe_serving 4800 python /root/repo/scripts/benchmark_moe_serving.py
echo "=== phase D done $(date +%T)" | tee -a $LOG/queue.log
