#!/bin/bash
# Round-5 master chain: wait for phase B (decode+w4a8 probes), then run
# B2 (e5m2/fp4 re-probe), C (flash + 8B serving), D (support sweeps +
# bench) strictly sequentially so stages never compete for the chip.
set -u
while ! grep -q "phase B done" /tmp/chipq_r5b/queue.log 2>/dev/null; do
  sleep 60
done
bash /root/repo/scripts/chip_queue_r5b2.sh
bash /root/repo/scripts/chip_queue_r5c.sh
bash /root/repo/scripts/chip_queue_r5d.sh
echo "=== r5 master chain done $(date +%T)"
