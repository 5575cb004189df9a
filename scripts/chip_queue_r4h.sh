#!/bin/bash
# Round-4 chip queue, phase H (chained behind phase G): support matrix
# at the GEMM regime (m=4096) -> docs/support_matrix_bench_v5e_m4096.json,
# then a late full bench for window diversity before the driver's run.
set -u
export PYTHONPATH="/root/repo:${PYTHONPATH:-}"
LOG=/tmp/chipq_r4h
mkdir -p $LOG

while ! grep -q "phase G done" /tmp/chipq_r4g/queue.log 2>/dev/null; do
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

BITBLAS_TPU_SMB_MS=4096 stage support_matrix_m4096 7200 \
  python /root/repo/scripts/tpu_support_matrix_bench.py
BITBLAS_TPU_BENCH_BUDGET=3600 stage bench3 5400 python /root/repo/bench.py
echo "=== phase H done $(date +%T)" | tee -a $LOG/queue.log
