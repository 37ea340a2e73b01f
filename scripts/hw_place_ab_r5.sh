#!/bin/bash
# Placement-lever A/B on chip (after benchmarks/micro_place.py showed
# tlhs+skip = 4.2x the placement kernel and fused faults the worker):
# fixed-SP rungs base vs lever, then the serving ladder with the lever.
# Single-client discipline via /tmp/hst_bench_lock; per-phase children.
#
# Usage: nohup scripts/hw_place_ab_r5.sh > /tmp/hw_place_ab.log 2>&1 &
set -u
cd "$(dirname "$0")/.."

probe() {
  timeout 240 python -c "
import jax, jax.numpy as jnp
assert jax.default_backend() == 'tpu', jax.default_backend()
x = jnp.ones((1024, 1024), dtype=jnp.bfloat16)
print('PROBE_OK', float((x @ x).sum()))
" 2>&1 | grep -q PROBE_OK
}

wait_alive() {
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
  grep -v WARNING "/tmp/${name}_r5.out" 2>/dev/null | tail -2
  echo
  if [ $rc -ne 0 ]; then
    wait_alive 8 || true
  fi
}

wait_alive 20 || { echo "tunnel never recovered"; exit 1; }

COMMON="HST_BENCH_SUPERHYB=1 HST_BENCH_N=10000000 HST_BENCH_BATCH=1024 HST_BENCH_ITERS=6"
LEVER="HST_PLACE_TLHS=1 HST_PLACE_SKIP=1"

phase sp2_base  900 env $COMMON HST_BENCH_SP=2 \
  python benchmarks/bench_hybrid.py
phase sp2_lever 900 env $COMMON HST_BENCH_SP=2 $LEVER \
  python benchmarks/bench_hybrid.py
phase sp4_lever 900 env $COMMON HST_BENCH_SP=4 $LEVER \
  python benchmarks/bench_hybrid.py
phase ladder_lever 1200 env $COMMON HST_BENCH_LADDER=1 $LEVER \
  python benchmarks/bench_hybrid.py

echo "== place A/B complete $(date -u +%H:%M:%S)"
