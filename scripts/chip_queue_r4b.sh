#!/bin/bash
# Round-4 chip queue, phase B (chained behind phase A's sentinel):
#   1. exact-block_m whole-K probe at 4096^2 — the r3 phase-D run of this
#      probe was never recorded (host wipe); u4 m=16 at 69% is the target.
#   2. serving-feature benchmark — decode tok/s float vs int8 KV, prefill
#      admission, speculation: implemented rounds ago, never measured.
set -u
export PYTHONPATH="/root/repo:${PYTHONPATH:-}"
LOG=/tmp/chipq_r4b
mkdir -p $LOG

while ! grep -q "phase A done" /tmp/chipq_r4a/queue.log 2>/dev/null; do
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

stage smallm_exact 3600 python /root/repo/scripts/tpu_smallm_exact_probe.py
stage serving 4800 python /root/repo/scripts/benchmark_serving.py
echo "=== phase B done $(date +%T)" | tee -a $LOG/queue.log
