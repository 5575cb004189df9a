#!/bin/bash
# Round-4 chip queue, phase N (chained behind phase M): materialize
# decode A/B (XLA lane-relayout unpack vs Pallas segment decode) across
# conv routes, the i2 m=4096 GEMM plan, and the decode pass alone.
set -u
export PYTHONPATH="/root/repo:${PYTHONPATH:-}"
LOG=/tmp/chipq_r4n
mkdir -p $LOG

while ! grep -q "phase M done" /tmp/chipq_r4m/queue.log 2>/dev/null; do
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

stage decodeab 5400 python /root/repo/scripts/tpu_mat_decode_probe.py
echo "=== phase N done $(date +%T)" | tee -a $LOG/queue.log
