#!/bin/bash
# Round-3 chip queue, phase E: TP serving DB for tp={4,16} (tp=8 already
# tuned), then the 70B scaling study per-tp (one invocation per tp so a
# worker crash costs one stage, not the sweep). Gates LOOP: a health-gate
# timeout re-gates, it never skips a stage.
set -u
export PYTHONPATH="/root/repo:${PYTHONPATH:-}"
LOG=/tmp/chipq_r3e
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

stage tune_tp4 4800 python /root/repo/scripts/tune_tp_serving_db.py 4 16
stage tune_tp16 4800 python /root/repo/scripts/tune_tp_serving_db.py 16 16
stage study70b_tp4 2400 python /root/repo/scripts/benchmark_llama70b_tp.py 16 4
stage study70b_tp8 2400 python /root/repo/scripts/benchmark_llama70b_tp.py 16 8
stage study70b_tp16 2400 python /root/repo/scripts/benchmark_llama70b_tp.py 16 16
# prefill-bucket M for the tp=8 serving path (chunked prefill dispatches
# m=256 buckets through the same DB)
stage tune_tp8_m256 4800 python /root/repo/scripts/tune_tp_serving_db.py 8 256
echo "=== phase E done $(date +%T)" | tee -a $LOG/queue.log
