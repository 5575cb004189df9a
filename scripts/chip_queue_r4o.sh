#!/bin/bash
# Round-4 chip queue, phase O (chained behind phase N): int-path
# materialize decode A/B at the bench i2 (int2 x int8) m=4096 rows.
set -u
export PYTHONPATH="/root/repo:${PYTHONPATH:-}"
LOG=/tmp/chipq_r4o
mkdir -p $LOG

while ! grep -q "phase N done" /tmp/chipq_r4n/queue.log 2>/dev/null; do
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

BITBLAS_TPU_PROBE_SECTION=int stage decodeab_int 3600 \
  python /root/repo/scripts/tpu_mat_decode_probe.py
echo "=== phase O done $(date +%T)" | tee -a $LOG/queue.log
