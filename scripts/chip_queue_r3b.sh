#!/bin/bash
# Round-3 chip queue, phase B: overlap re-probe on the bumped libtpu,
# hint-DB seeding (curated + measured), the headline bench record, flash
# tune (+ FA hint persistence). Gates LOOP — never skip a stage.
set -u
export PYTHONPATH="/root/repo:${PYTHONPATH:-}"
LOG=/tmp/chipq_r3b
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

# curated seeding is host-side (no chip) but cheap — run first so the
# tuning stages below see a populated DB and skip already-known configs.
stage seed_curated 600 python /root/repo/scripts/seed_curated_hints.py

stage i2_pipe  2400 python /root/repo/scripts/tpu_i2_pipe_probe.py
stage tune_bench_db 7200 python /root/repo/scripts/tune_bench_db.py
stage llama_shapes  5400 python /root/repo/scripts/tpu_llama_shapes_bench.py
stage bench 4500 env BITBLAS_TPU_BENCH_BUDGET=3000 \
    python /root/repo/bench.py
stage flash_tune 5400 python /root/repo/scripts/tpu_flash_tune.py
echo "=== phase B done $(date +%T)" | tee -a $LOG/queue.log
