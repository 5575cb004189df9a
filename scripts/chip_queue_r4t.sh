#!/bin/bash
# Round-4 chip queue, phase T (chained behind phase S): one more bench
# window (min-merge diversity + warms every candidate executable for
# the driver's end-of-round run).
set -u
export PYTHONPATH="/root/repo:${PYTHONPATH:-}"
LOG=/tmp/chipq_r4t
mkdir -p $LOG

while ! grep -q "phase S done" /tmp/chipq_r4s/queue.log 2>/dev/null; do
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

BITBLAS_TPU_BENCH_BUDGET=3000 stage bench5 4200 python /root/repo/bench.py
echo "=== phase T done $(date +%T)" | tee -a $LOG/queue.log
