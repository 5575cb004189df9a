#!/bin/bash
# Round-4 chip queue, phase P (chained behind phase O): final measured
# state with the Pallas-decode defaults — conv bench (materialize now
# pallas) and a full bench for the round record.
set -u
export PYTHONPATH="/root/repo:${PYTHONPATH:-}"
LOG=/tmp/chipq_r4p
mkdir -p $LOG

while ! grep -q "phase O done" /tmp/chipq_r4o/queue.log 2>/dev/null; do
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

stage conv3 3600 python /root/repo/scripts/tpu_conv_bench.py
BITBLAS_TPU_BENCH_BUDGET=3600 stage bench4 5400 python /root/repo/bench.py
echo "=== phase P done $(date +%T)" | tee -a $LOG/queue.log
