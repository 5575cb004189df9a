#!/bin/bash
# Round-4 chip queue, phase Q (chained behind phase P): NF4 materialize
# decode A/B (XLA take-gather vs in-kernel mux4 pallas).
set -u
export PYTHONPATH="/root/repo:${PYTHONPATH:-}"
LOG=/tmp/chipq_r4q
mkdir -p $LOG

while ! grep -q "phase P done" /tmp/chipq_r4p/queue.log 2>/dev/null; do
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

BITBLAS_TPU_PROBE_SECTION=nf stage decodeab_nf 3600 \
  python /root/repo/scripts/tpu_mat_decode_probe.py
echo "=== phase Q done $(date +%T)" | tee -a $LOG/queue.log
