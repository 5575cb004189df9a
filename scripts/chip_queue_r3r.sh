#!/bin/bash
# Round-3 chip queue, phase R: tune the four missing tp=8 m=16 TP-serving
# cells (review finding — the committed table never covered them), then
# merge winners into the committed JSON. The corrected tp=16 qkv N=768
# cells need no re-tune: the rekeyed winners were measured on the
# physically-identical 768-padded kernel. Waits for phase Q.
set -u
export PYTHONPATH="/root/repo:${PYTHONPATH:-}"
LOG=/tmp/chipq_r3r
mkdir -p $LOG

while ! grep -q "phase Q done" /tmp/chipq_r3q/queue.log 2>/dev/null; do
  sleep 15
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

stage tp8_m16 5400 python /root/repo/scripts/tune_tp_serving_db.py 8 16 6
stage export 600 python /root/repo/scripts/export_tp_serving_hints.py
echo "=== phase R done $(date +%T)" | tee -a $LOG/queue.log
