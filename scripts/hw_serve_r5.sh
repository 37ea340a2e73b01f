#!/bin/bash
# Serving follow-on after the placement A/B: promoted-lever loadgen rows
# (clustered supertile ladder vs source impact path, 64 workers), the
# int8-swept dense row, then a full bench.py refresh with the promoted
# serving record. Usage:
#   nohup scripts/hw_serve_r5.sh <prev_pid> > /tmp/hw_serve_r5.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
PREV=${1:-}

if [ -n "$PREV" ]; then
  while kill -0 "$PREV" 2>/dev/null; do sleep 30; done
  echo "== prev pid $PREV gone $(date -u +%H:%M:%S)"
fi

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

LEVER="HST_PLACE_TLHS=1 HST_PLACE_SKIP=1"

wait_alive 20 || { echo "tunnel never recovered"; exit 1; }

# 1. product-path loadgen with the promoted levers, 64 workers
phase loadgen_cl64 1200 env $LEVER python benchmarks/loadgen.py \
  --docs 200000 --closed --workers 64 --duration 20 --layout clustered
phase loadgen_src64 1200 env $LEVER python benchmarks/loadgen.py \
  --docs 200000 --closed --workers 64 --duration 20 --layout source

# 2. certified int8-swept dense row at 10M (r4 ask 4's chip half)
phase int8swept 900 env HST_BENCH_DTYPE=int8_swept HST_BENCH_CHILD=1 \
  HST_BENCH_PHASE=dense HST_BENCH_DEADLINE_S=850 HST_BENCH_AB=0 \
  HST_BENCH_SKIP_HYBRID=1 python bench.py

# 3. full driver-protocol bench refresh (dense + hybrid with the
#    promoted serving record /tmp/hst_serving_best.json)
phase bench_full 1400 python bench.py

echo "== serve follow-on complete $(date -u +%H:%M:%S)"
