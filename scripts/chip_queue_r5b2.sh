#!/bin/bash
# Round-5 chip queue, phase B2: finish the decode probe (e5m2 rows — the
# first run wedged in a tunnel outage) including the select-free fp4 fast
# path that landed after B started.
set -u
export PYTHONPATH="/root/repo:${PYTHONPATH:-}"
LOG=/tmp/chipq_r5b2
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

# e5m2 all m; fp4 re-probe with the select-free fast path
BITBLAS_TPU_PROBE_FMTS=e5m2_float8,fp4_e2m1 BITBLAS_TPU_PROBE_SKIP_DENSE=1 stage decode_probe2 5400 \
  python /root/repo/scripts/tpu_decode_probe.py
echo "=== phase B2 done $(date +%T)" | tee -a $LOG/queue.log
