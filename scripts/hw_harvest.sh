#!/bin/bash
# Mirror the round-4 hardware-queue outputs into the repo working tree
# so results survive even when the measurement queue finishes after the
# interactive session's turns are gone (the round driver commits any
# uncommitted work at round end).
#
#   nohup bash scripts/hw_harvest.sh > /tmp/hw_harvest.log 2>&1 &
#
# Copies every 10 min while the runbook runs, one final copy when it
# exits, then stops. Never commits — the working-tree copy is enough.
set -u
cd /root/repo
mkdir -p benchmarks/results

harvest() {
  [ -f /tmp/hw_r4.log ] && cp /tmp/hw_r4.log docs/HW_R4_LOG.txt
  [ -f /tmp/hst_bench_last_good.json ] && \
    cp /tmp/hst_bench_last_good.json benchmarks/results/last_good_r4.json
  [ -f /tmp/hst_serving_best.json ] && \
    cp /tmp/hst_serving_best.json benchmarks/results/serving_best_r4.json
  [ -f /tmp/tunnel_status.txt ] && \
    tail -50 /tmp/tunnel_status.txt > benchmarks/results/tunnel_status_tail.txt
}

RUNBOOK_PID=$(cat /tmp/hw_r4.pid 2>/dev/null || echo 0)
# pid 0 would make kill -0 signal our own process group (always true)
# and loop forever when the pid file is missing
while [ "$RUNBOOK_PID" -gt 0 ] && kill -0 "$RUNBOOK_PID" 2>/dev/null; do
  harvest
  sleep 600
done
harvest
echo "runbook exited; final harvest done at $(date +%H:%M:%S)"
