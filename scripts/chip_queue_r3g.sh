#!/bin/bash
# Round-3 chip queue, phase G: batch-64 70B study rows (shows where the
# >=85% scaling efficiency holds as continuous batching raises m) + the
# Mosaic decode/dot overlap recheck on this libtpu (the u4-mask gate
# changed behavior this round — the round-2 "pipelining is a dead end"
# verdicts deserve one cheap recheck per libtpu bump). Waits for phase F.
set -u
export PYTHONPATH="/root/repo:${PYTHONPATH:-}"
LOG=/tmp/chipq_r3g
mkdir -p $LOG

while ! grep -q "phase F done" /tmp/chipq_r3f/queue.log 2>/dev/null; do
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

stage study70b_m64_tp4 2400 python /root/repo/scripts/benchmark_llama70b_tp.py 64 4
stage study70b_m64_tp16 2400 python /root/repo/scripts/benchmark_llama70b_tp.py 64 16
stage pipe_recheck 2400 python /root/repo/scripts/tpu_pipe_probe.py
stage i2_pipe_recheck 2400 python /root/repo/scripts/tpu_i2_pipe_probe.py
echo "=== phase G done $(date +%T)" | tee -a $LOG/queue.log
