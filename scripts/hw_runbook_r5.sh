#!/bin/bash
# Round-5 hardware measurement queue. Most-valuable-first, one phase at a
# time, everything under /tmp/hst_bench_lock (the tunnel is single-client;
# the background poller stands down while the lock exists). Each phase is
# its own process with its own timeout; a wedge costs one phase, not the
# queue. Outputs land in /tmp/*_r5*.out and are transcribed into
# BENCH_CONFIGS.md afterwards.
#
# Usage: nohup scripts/hw_runbook_r5.sh > /tmp/hw_r5.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/hw_r5.log

probe() {
  # fresh-process tunnel probe; returns 0 only on a live TPU backend
  timeout 240 python -c "
import jax, jax.numpy as jnp
assert jax.default_backend() == 'tpu', jax.default_backend()
x = jnp.ones((1024, 1024), dtype=jnp.bfloat16)
print('PROBE_OK', float((x @ x).sum()))
" 2>&1 | grep -q PROBE_OK
}

wait_alive() {
  # poll until the tunnel answers (wedges last 30 min - hours)
  for _ in $(seq 1 "$1"); do
    probe && return 0
    sleep 90
  done
  return 1
}

phase() {
  name=$1; budget=$2; shift 2
  echo "== phase $name start $(date -u +%H:%M:%S)"
  touch /tmp/hst_bench_lock
  timeout "$budget" "$@" > "/tmp/${name}_r5.out" 2> "/tmp/${name}_r5.err"
  rc=$?
  rm -f /tmp/hst_bench_lock
  echo "== phase $name rc=$rc $(date -u +%H:%M:%S)"
  tail -c 1200 "/tmp/${name}_r5.out" 2>/dev/null
  echo
  if [ $rc -ne 0 ]; then
    # give a wedged tunnel time to recover before the next phase
    wait_alive 8 || true
  fi
}

wait_alive 40 || { echo "tunnel never recovered"; exit 1; }

# 1. stage attribution (VERDICT r4 ask 3) — decides the serving levers
if ! grep -q '"full_ms_sp4"' /tmp/attr_r5.log 2>/dev/null; then
  touch /tmp/hst_bench_lock
  HST_ATTR_SP=2,4 HST_ATTR_ITERS=6 timeout 3300 \
    python benchmarks/attr_supertile.py 10000000 1024 >> /tmp/attr_r5.log 2>&1
  rm -f /tmp/hst_bench_lock
  echo "== attr done rc=$? $(date -u +%H:%M:%S)"
  grep '{' /tmp/attr_r5.log | tail -3
fi

# 2. the driver-protocol bench (headline record): dense + repeat + hybrid
phase bench 1150 env HST_BENCH_DEADLINE_S=1100 python bench.py

# 3. funnel throughput + CE MFU at 200k (VERDICT r4 ask 6)
phase funnel_b64 900 env HST_BENCH_N=200000 HST_BENCH_BATCH=64 \
  python benchmarks/bench_funnel.py
phase funnel_b512 900 env HST_BENCH_N=200000 HST_BENCH_BATCH=512 \
  python benchmarks/bench_funnel.py

# 4. HTTP serving with dynamic batching at 200k (VERDICT r4 ask 5)
phase loadgen_closed 900 python benchmarks/loadgen.py --docs 200000 \
  --closed --workers 16 --duration 20
phase loadgen_open 700 python benchmarks/loadgen.py --docs 200000 \
  --qps 100 --duration 20 --workers 32

# 5. certified int8-swept dense row at 10M
phase int8swept 900 env HST_BENCH_DTYPE=int8_swept HST_BENCH_CHILD=1 \
  HST_BENCH_PHASE=dense HST_BENCH_DEADLINE_S=850 HST_BENCH_AB=0 \
  HST_BENCH_SKIP_HYBRID=1 python bench.py

echo "== queue complete $(date -u +%H:%M:%S)"
