#!/bin/bash
# Round-4 chip queue, phase L (chained behind phase K): MoE device-time
# re-run with lifted weights (args, not closure constants) — default
# 1Lx4e twin plus the true 8-expert geometry.
set -u
export PYTHONPATH="/root/repo:${PYTHONPATH:-}"
LOG=/tmp/chipq_r4l
mkdir -p $LOG

while ! grep -q "phase K done" /tmp/chipq_r4k/queue.log 2>/dev/null; do
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

BITBLAS_TPU_SERVING_DEVICE_ONLY=1 stage moe_device 4800 \
  python /root/repo/scripts/benchmark_moe_serving.py
BITBLAS_TPU_SERVING_DEVICE_ONLY=1 BITBLAS_TPU_MOE_EXPERTS=8 \
  stage moe_device_8e 4800 \
  python /root/repo/scripts/benchmark_moe_serving.py
echo "=== phase L done $(date +%T)" | tee -a $LOG/queue.log
