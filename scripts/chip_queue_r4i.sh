#!/bin/bash
# Round-4 chip queue, phase I (chained behind phase H): re-runs after the
# sub-byte-activation fixes — extended smoke (int-act rows), the support
# matrix (18 previously-failed int-act cells now lower), and the MoE
# benchmark with the 1-layer device-time twin.
set -u
export PYTHONPATH="/root/repo:${PYTHONPATH:-}"
LOG=/tmp/chipq_r4i
mkdir -p $LOG

while ! grep -q "phase H done" /tmp/chipq_r4h/queue.log 2>/dev/null; do
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

stage smoke2 2400 python /root/repo/scripts/tpu_format_smoke.py
stage support_matrix2 7200 python /root/repo/scripts/tpu_support_matrix_bench.py
stage moe_serving2 4800 python /root/repo/scripts/benchmark_moe_serving.py
echo "=== phase I done $(date +%T)" | tee -a $LOG/queue.log
