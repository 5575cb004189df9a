#!/bin/bash
# Round-4 chip queue, phase G (chained behind phase F): conv2d measured
# state (dense XLA vs fused quantized) at ResNet-50 shapes.
set -u
export PYTHONPATH="/root/repo:${PYTHONPATH:-}"
LOG=/tmp/chipq_r4g
mkdir -p $LOG

while ! grep -q "phase F done" /tmp/chipq_r4f/queue.log 2>/dev/null; do
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

stage conv 3600 python /root/repo/scripts/tpu_conv_bench.py
echo "=== phase G done $(date +%T)" | tee -a $LOG/queue.log
