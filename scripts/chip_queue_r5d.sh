#!/bin/bash
# Round-5 chip queue, phase D: refreshed measured support matrix (new bf16
# column + fp8 cross pairs + true-f32 cell) at m={1,256} and a clean
# m=4096 sweep (VERDICT item 4), then a full bench for the record.
set -u
export PYTHONPATH="/root/repo:${PYTHONPATH:-}"
LOG=/tmp/chipq_r5d
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

stage support_m1_256 9000 python /root/repo/scripts/tpu_support_matrix_bench.py
BITBLAS_TPU_SMB_MS=4096 stage support_m4096 9000 \
  python /root/repo/scripts/tpu_support_matrix_bench.py
BITBLAS_TPU_BENCH_BUDGET=3600 stage bench 5400 python /root/repo/bench.py
echo "=== phase D done $(date +%T)" | tee -a $LOG/queue.log
