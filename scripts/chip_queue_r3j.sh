#!/bin/bash
# Round-3 chip queue, phase J: rerun the 70B studies with crash-retry
# (phase H's m16_tp4 'down' row was poisoned by a worker-crash window).
# Waits for phase I.
set -u
export PYTHONPATH="/root/repo:${PYTHONPATH:-}"
LOG=/tmp/chipq_r3j
mkdir -p $LOG

while ! grep -q "phase I done" /tmp/chipq_r3i/queue.log 2>/dev/null; do
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

stage study_m16_tp4 3600 python /root/repo/scripts/benchmark_llama70b_tp.py 16 4
stage study_m16_tp8 3600 python /root/repo/scripts/benchmark_llama70b_tp.py 16 8
stage study_m16_tp16 3600 python /root/repo/scripts/benchmark_llama70b_tp.py 16 16
stage study_m64_tp4 3600 python /root/repo/scripts/benchmark_llama70b_tp.py 64 4
stage study_m64_tp16 3600 python /root/repo/scripts/benchmark_llama70b_tp.py 64 16
echo "=== phase J done $(date +%T)" | tee -a $LOG/queue.log
