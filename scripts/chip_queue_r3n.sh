#!/bin/bash
# Round-3 chip queue, phase N: confirmation bench.py run against the
# current DB/curated state (the driver's official run comes at round
# end; this catches regressions while there is still time to fix them).
# Waits for phase M.
set -u
export PYTHONPATH="/root/repo:${PYTHONPATH:-}"
LOG=/tmp/chipq_r3n
mkdir -p $LOG

while ! grep -q "phase M done" /tmp/chipq_r3m/queue.log 2>/dev/null; do
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

stage bench_confirm 4200 python /root/repo/bench.py
echo "=== phase N done $(date +%T)" | tee -a $LOG/queue.log
