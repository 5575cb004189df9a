#!/bin/bash
# Round-3 chip queue, phase H: deep force-retune of the TP-local serving
# shapes (the first TP sweep predates the exact-m whole-K candidate
# family; force mode keeps the old hint unless beaten head-to-head), then
# a final 70B study pass against the refreshed DB. Waits for phase G.
set -u
export PYTHONPATH="/root/repo:${PYTHONPATH:-}"
LOG=/tmp/chipq_r3h
mkdir -p $LOG

while ! grep -q "phase G done" /tmp/chipq_r3g/queue.log 2>/dev/null; do
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

stage tune_tp16_m16 5400 python /root/repo/scripts/tune_tp_serving_db.py 16 16 12 force
stage tune_tp16_m64 5400 python /root/repo/scripts/tune_tp_serving_db.py 16 64 12 force
stage tune_tp4_m64 5400 python /root/repo/scripts/tune_tp_serving_db.py 4 64 8 force
stage tune_tp8_m64 5400 python /root/repo/scripts/tune_tp_serving_db.py 8 64 8 force
stage study_m16_tp4 2400 python /root/repo/scripts/benchmark_llama70b_tp.py 16 4
stage study_m16_tp16 2400 python /root/repo/scripts/benchmark_llama70b_tp.py 16 16
stage study_m64_tp4 2400 python /root/repo/scripts/benchmark_llama70b_tp.py 64 4
stage study_m64_tp16 2400 python /root/repo/scripts/benchmark_llama70b_tp.py 64 16
echo "=== phase H done $(date +%T)" | tee -a $LOG/queue.log
