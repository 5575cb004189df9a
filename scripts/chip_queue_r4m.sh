#!/bin/bash
# Round-4 chip queue, phase M (chained behind phase L): transpose-free
# materialize-conv probe + MoE device timing retry (generalized
# pytree lift — phase L's run predated it and still 413'd).
set -u
export PYTHONPATH="/root/repo:${PYTHONPATH:-}"
LOG=/tmp/chipq_r4m
mkdir -p $LOG

while ! grep -q "phase L done" /tmp/chipq_r4l/queue.log 2>/dev/null; do
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

stage convmat 3600 python /root/repo/scripts/tpu_conv_mat_probe.py
BITBLAS_TPU_SERVING_DEVICE_ONLY=1 stage moe_device2 4800 \
  python /root/repo/scripts/benchmark_moe_serving.py
echo "=== phase M done $(date +%T)" | tee -a $LOG/queue.log
