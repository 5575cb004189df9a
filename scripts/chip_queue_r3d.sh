#!/bin/bash
# Round-3 chip queue, phase D: exact-m small-M probe at 4096^2 (8192-sweep
# finding), then a fresh bench record against the updated DB.
set -u
export PYTHONPATH="/root/repo:${PYTHONPATH:-}"
LOG=/tmp/chipq_r3d
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

stage smallm_exact 3600 python /root/repo/scripts/tpu_smallm_exact_probe.py
# triangular-causal flash rework: correctness first, then re-tune
stage flash_check 2400 python /root/repo/scripts/tpu_flash_check.py
stage flash_tune2 5400 python /root/repo/scripts/tpu_flash_tune.py
echo "=== phase D done $(date +%T)" | tee -a $LOG/queue.log
