#!/bin/bash
# Round-3 chip queue, phase P: pipelined paged flash-decode on hardware
# (manual DMA + dynamic fori lowering check + bandwidth). Waits for
# phase O. NOTE (historical): phases O and P invoke the same probe FILE
# but measured different kernels — the paged kernel was rewritten from
# the per-page BlockSpec grid to the manual DMA pipeline between the two
# runs; do not re-run both against one code state.
set -u
export PYTHONPATH="/root/repo:${PYTHONPATH:-}"
LOG=/tmp/chipq_r3p
mkdir -p $LOG

while ! grep -q "phase O done" /tmp/chipq_r3o/queue.log 2>/dev/null; do
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

stage paged_probe2 3600 python /root/repo/scripts/tpu_flash_paged_probe.py
echo "=== phase P done $(date +%T)" | tee -a $LOG/queue.log
