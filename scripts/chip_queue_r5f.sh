#!/bin/bash
# Round-5 session-2 follow-up queue (replaces the tail of r5e after
# support_m1_256): flash diag second-window confirm (the r5e rows died
# on a local-import shadowing bug), then 8B device serving, m=4096
# support sweep, and bench.
set -u
export PYTHONPATH="/root/repo:${PYTHONPATH:-}"
LOG=/tmp/chipq_r5f
mkdir -p $LOG

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

BITBLAS_TPU_FLASH_R5_ONLY=diag stage flash_diag 2400 \
  python /root/repo/scripts/tpu_flash_r5.py
BITBLAS_TPU_FLASH_R5_ONLY=pad64 stage flash_pad64 1800 \
  python /root/repo/scripts/tpu_flash_r5.py
BITBLAS_TPU_PROBE_FMTS=e5m2_float8 BITBLAS_TPU_PROBE_SKIP_DENSE=1 \
  stage e5m2_probe 2400 python /root/repo/scripts/tpu_decode_probe.py
stage serving_8b 5400 python /root/repo/scripts/benchmark_serving_8b.py
BITBLAS_TPU_SMB_MS=4096 stage support_m4096 9000 \
  python /root/repo/scripts/tpu_support_matrix_bench.py
BITBLAS_TPU_BENCH_BUDGET=3600 stage bench 5400 python /root/repo/bench.py
echo "=== phase F done $(date +%T)" | tee -a $LOG/queue.log
