#!/bin/bash
# Round-3 chip queue, phase C: TP serving DB (tp=4/16 + prefill Ms),
# 70B scaling refresh, u4-mask-int8 gate re-measure, serving benchmark.
# Gates LOOP — never skip a stage. Run AFTER phase B finishes.
set -u
export PYTHONPATH="/root/repo:${PYTHONPATH:-}"
LOG=/tmp/chipq_r3c
mkdir -p $LOG

gate() {
  while true; do
    python /root/repo/scripts/health_wait.py 14400 >> $LOG/gate.log 2>&1 \
      && break
    echo "$(date +%T) gate expired, looping" >> $LOG/gate.log
  done
}

stage() {  # stage <logname> <timeout_s> <cmd...>
  local name=$1 to=$2; shift 2
  gate
  echo "=== $name start $(date +%T)" | tee -a $LOG/queue.log
  timeout "$to" "$@" > "$LOG/$name.log" 2>&1
  echo "=== $name rc=$? end $(date +%T)" | tee -a $LOG/queue.log
}

stage u4_mask_i8 2400 python /root/repo/scripts/tpu_u4_mask_i8_probe.py
stage tp4_m16   3600 python /root/repo/scripts/tune_tp_serving_db.py 4 16 6
stage tp16_m16  3600 python /root/repo/scripts/tune_tp_serving_db.py 16 16 6
stage tp8_m256  3600 python /root/repo/scripts/tune_tp_serving_db.py 8 256 6
stage tp4_m256  3600 python /root/repo/scripts/tune_tp_serving_db.py 4 256 6
stage study70b  5400 python /root/repo/scripts/benchmark_llama70b_tp.py
stage serving   5400 python /root/repo/scripts/benchmark_serving.py
echo "=== phase C done $(date +%T)" | tee -a $LOG/queue.log
