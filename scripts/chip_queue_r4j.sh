#!/bin/bash
# Round-4 chip queue, phase J (chained behind phase I): conv2d bench with
# the new materialize route (decode-filter + native XLA conv) vs fused,
# and a retry of the phase-F device-side serving timing (both its rows
# died in the 11:53 worker-crash window).
set -u
export PYTHONPATH="/root/repo:${PYTHONPATH:-}"
LOG=/tmp/chipq_r4j
mkdir -p $LOG

while ! grep -q "phase I done" /tmp/chipq_r4i/queue.log 2>/dev/null; do
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

stage conv2 3600 python /root/repo/scripts/tpu_conv_bench.py
BITBLAS_TPU_SERVING_DEVICE_ONLY=1 stage serving_device2 2400 \
  python /root/repo/scripts/benchmark_serving.py
echo "=== phase J done $(date +%T)" | tee -a $LOG/queue.log
