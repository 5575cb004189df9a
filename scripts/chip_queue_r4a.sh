#!/bin/bash
# Round-4 chip queue, phase A: on-chip smoke (insurance after the curated
# retile), Mosaic gate recheck (libtpu bump detection), then the full
# 16-row bench against the refreshed curated/DB winners, then a llama-
# shapes refresh that persists winners into the hint DB.
set -u
export PYTHONPATH="/root/repo:${PYTHONPATH:-}"
LOG=/tmp/chipq_r4a
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

stage smoke 2400 python /root/repo/scripts/tpu_format_smoke.py
stage gate_recheck 2400 python /root/repo/scripts/tpu_gate_recheck.py
BITBLAS_TPU_BENCH_BUDGET=3600 stage bench 5400 python /root/repo/bench.py
stage llama_shapes 3600 python /root/repo/scripts/tpu_llama_shapes_bench.py
echo "=== phase A done $(date +%T)" | tee -a $LOG/queue.log
