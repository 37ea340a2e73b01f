#!/bin/bash
# Round-4 hardware runbook (ROADMAP.md queue). Started alongside the
# tunnel poller; blocks until /tmp/tunnel_alive appears, then runs the
# measurement queue strictly sequentially (single tunnel client),
# each phase bounded, everything logged to /tmp/hw_r4.log.
#
#   nohup bash scripts/hw_runbook_r4.sh > /tmp/hw_r4.log 2>&1 &
#   echo $! > /tmp/hw_r4.pid
set -u
cd /root/repo

LOG() { echo "=== $(date +%H:%M:%S) $*"; }

LOG "waiting for /tmp/tunnel_alive (poller: /tmp/tunnel_poll.sh)"
while [ ! -f /tmp/tunnel_alive ]; do sleep 60; done
LOG "tunnel recovered — starting the round-4 queue"

# re-verify aliveness right before each heavy phase: the tunnel can
# re-wedge between phases (then we wait again instead of burning the
# phase's compile on a dead tunnel)
check_alive() {
  while true; do
    R=$(cd /tmp && timeout 90 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((256,256)); print('OK', jax.default_backend(), float((x@x).sum()))
" 2>&1 | tail -1)
    case "$R" in OK\ tpu*) return 0;; esac
    LOG "tunnel not answering ($R); sleeping 300"
    sleep 300
  done
}

run_phase() {
  local name="$1" tmo="$2"; shift 2
  check_alive
  LOG "phase $name: $*"
  timeout "$tmo" "$@"
  LOG "phase $name done rc=$?"
}

# 1. driver bench end-to-end with the prebuilt 10M artifacts
run_phase bench 1300 python bench.py
# 2. serving A/B: base / fusedplace / dedup / both at B=256/512
run_phase ab 3600 python benchmarks/hw_session.py 12
# 3. hardened re-measure of the SP rungs + 10M jaccard w/ attribution
run_phase rungs 3600 python benchmarks/hw_session.py 10
# 4. stage attribution incl. tile_stats_sub A/B
run_phase attrib 2400 python benchmarks/hw_session.py 11
# 5. funnel + configs chip rows
run_phase configs 3600 python benchmarks/hw_session.py 13
# 6. refresh last_good with a final clean bench
run_phase bench2 1300 python bench.py
LOG "round-4 hardware queue complete"
# 7. client-visible HTTP serving latency on the chip (appended while the
# runbook waited on recovery; see benchmarks/loadgen.py)
run_phase httplat 900 python benchmarks/loadgen.py --docs 200000 --qps 100 --duration 30
run_phase httplat_closed 900 python benchmarks/loadgen.py --docs 200000 --closed --workers 16 --duration 20
LOG "http latency phases done"
