#!/bin/bash
# Round-5 session-2 consolidated queue. The host wipe killed the queued
# B2->C->D chain and BOTH caches (operator DB + jax compile cache), so
# everything below runs cold — stage timeouts are sized for that.
# Order = VERDICT r4 priority: smoke sanity, decode-floor completion
# (e5m2 + select-free fp4), W4A8 grouped-scale probe, flash second
# window, support matrix (new bf16/fp8-cross columns), 8B device-side
# serving, m=4096 support re-sweep, bench (also warms the driver's
# end-of-round bench run).
set -u
export PYTHONPATH="/root/repo:${PYTHONPATH:-}"
LOG=/tmp/chipq_r5e
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

stage smoke 1800 python /root/repo/scripts/tpu_format_smoke.py
BITBLAS_TPU_PROBE_FMTS=e5m2_float8,fp4_e2m1 BITBLAS_TPU_PROBE_SKIP_DENSE=1 \
  stage decode_probe2 4800 python /root/repo/scripts/tpu_decode_probe.py
stage w4a8_probe 4800 python /root/repo/scripts/tpu_w4a8_scaled_probe.py
stage flash_r5 5400 python /root/repo/scripts/tpu_flash_r5.py
stage support_m1_256 9000 python /root/repo/scripts/tpu_support_matrix_bench.py
stage serving_8b 5400 python /root/repo/scripts/benchmark_serving_8b.py
BITBLAS_TPU_SMB_MS=4096 stage support_m4096 9000 \
  python /root/repo/scripts/tpu_support_matrix_bench.py
BITBLAS_TPU_BENCH_BUDGET=3600 stage bench 5400 python /root/repo/bench.py
echo "=== phase E done $(date +%T)" | tee -a $LOG/queue.log
