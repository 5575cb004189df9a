#!/bin/bash
# Round-4 chip queue, phase F (chained behind phase E): device-side
# decode-step timing for the llama-7B serving geometry (the phase-B
# serving run predates the chained-timer section).
set -u
export PYTHONPATH="/root/repo:${PYTHONPATH:-}"
LOG=/tmp/chipq_r4f
mkdir -p $LOG

while ! grep -q "phase E done" /tmp/chipq_r4e/queue.log 2>/dev/null; do
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

BITBLAS_TPU_SERVING_DEVICE_ONLY=1 stage serving_device 2400 \
  python /root/repo/scripts/benchmark_serving.py
echo "=== phase F done $(date +%T)" | tee -a $LOG/queue.log
