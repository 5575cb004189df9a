#!/bin/bash
# Round-3 chip queue, phase K: flash-decode bandwidth after the
# GQA-grouped grid + a correctness smoke of the grouped kernels on
# hardware (interpret mode cannot catch Mosaic lowering gaps).
# Waits for phase J.
set -u
export PYTHONPATH="/root/repo:${PYTHONPATH:-}"
LOG=/tmp/chipq_r3k
mkdir -p $LOG

while ! grep -q "phase J done" /tmp/chipq_r3j/queue.log 2>/dev/null; do
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

stage fd_check 2400 python /root/repo/scripts/tpu_flash_decode_quant_check.py
stage fd_probe 2400 python /root/repo/scripts/tpu_flash_decode_probe.py
echo "=== phase K done $(date +%T)" | tee -a $LOG/queue.log
