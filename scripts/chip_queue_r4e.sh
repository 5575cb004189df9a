#!/bin/bash
# Round-4 chip queue, phase E (chained behind phase D): one full bench
# record against the exact-m-retiled curated table + refreshed DB.
set -u
export PYTHONPATH="/root/repo:${PYTHONPATH:-}"
LOG=/tmp/chipq_r4e
mkdir -p $LOG

while ! grep -q "phase D done" /tmp/chipq_r4d/queue.log 2>/dev/null; do
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

BITBLAS_TPU_BENCH_BUDGET=3600 stage bench2 5400 python /root/repo/bench.py
echo "=== phase E done $(date +%T)" | tee -a $LOG/queue.log
