#!/bin/bash
# Round-3 chip queue, phase Q: the never-run large-M tile sweep (taller bm
# cuts W re-decode passes — the one non-floor bench lever left), at both
# bench shapes. Waits for the format smoke started by this session.
set -u
export PYTHONPATH="/root/repo:${PYTHONPATH:-}"
LOG=/tmp/chipq_r3q
mkdir -p $LOG

SMOKE_PID=${1:-0}
while [ "$SMOKE_PID" != "0" ] && kill -0 "$SMOKE_PID" 2>/dev/null; do
  sleep 15
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

stage largem_4096 3600 python /root/repo/scripts/tpu_largem_sweep.py 4096
stage largem_8192 3600 python /root/repo/scripts/tpu_largem_sweep.py 8192
echo "=== phase Q done $(date +%T)" | tee -a $LOG/queue.log
