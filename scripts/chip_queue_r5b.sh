#!/bin/bash
# Round-5 chip queue, phase B: decode-floor probe campaign (NF4/fp8/fp4
# GEMV variants, VERDICT r4 item 1) then the W4A8 grouped-scale probe
# (item 3).
set -u
export PYTHONPATH="/root/repo:${PYTHONPATH:-}"
LOG=/tmp/chipq_r5b
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

stage decode_probe 7200 python /root/repo/scripts/tpu_decode_probe.py
stage w4a8_probe 4800 python /root/repo/scripts/tpu_w4a8_scaled_probe.py
echo "=== phase B done $(date +%T)" | tee -a $LOG/queue.log
