#!/bin/bash
# Round-3 chip queue, phase A: correctness + the two highest-value probes
# (VERDICT r2 #2 priority order). Each stage health-gates in a LOOP —
# never skip a stage on gate timeout (round-2 lesson). Phase B (llama
# shapes, bench, flash tune, tp DB) runs after the builder reviews these
# results and updates tuner/curated.py.
set -u
export PYTHONPATH="/root/repo:${PYTHONPATH:-}"
LOG=/tmp/chipq_r3a
mkdir -p $LOG

stage() {  # stage <name> <timeout_s> <cmd...>
  local name=$1 to=$2; shift 2
  while true; do
    python /root/repo/scripts/health_wait.py 14400 >> $LOG/gate.log 2>&1 \
      && break
    echo "$(date +%T) $name: gate expired, looping" >> $LOG/gate.log
  done
  echo "=== $name start $(date +%T)" | tee -a $LOG/queue.log
  timeout "$to" python "/root/repo/scripts/$name" > "$LOG/$name.log" 2>&1
  echo "=== $name rc=$? end $(date +%T)" | tee -a $LOG/queue.log
}

stage tpu_format_smoke.py      1800
stage tpu_gate_recheck.py      1800
stage tpu_asplit_probe.py      3600
stage tpu_nf4_gather_probe.py  5400
echo "=== phase A done $(date +%T)" | tee -a $LOG/queue.log
