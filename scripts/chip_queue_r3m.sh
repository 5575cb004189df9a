#!/bin/bash
# Round-3 chip queue, phase M: rerun the serving benchmark — phase C's
# numbers predate the GQA-grouped flash decode (9.2x faster KV attention)
# and the persisted FA hints. Waits for phase L.
set -u
export PYTHONPATH="/root/repo:${PYTHONPATH:-}"
LOG=/tmp/chipq_r3m
mkdir -p $LOG

while ! grep -q "phase L done" /tmp/chipq_r3l/queue.log 2>/dev/null; do
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

stage serving2 5400 python /root/repo/scripts/benchmark_serving.py
echo "=== phase M done $(date +%T)" | tee -a $LOG/queue.log
