#!/bin/bash
# Second follow-on: after the attr rerun (hw_followup_r5.sh), measure the
# round-5 CE fix (memoized wordpiece + coalesced dispatches) on the funnel,
# and the hybrid serving row with the fixed on-device measurement loop
# (corpus as traced args). Single-client discipline via /tmp/hst_bench_lock.
#
# Usage: nohup scripts/hw_followup2_r5.sh <followup_pid> > /tmp/hw_r5_followup2.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
QPID=${1:?followup pid}

while kill -0 "$QPID" 2>/dev/null; do sleep 30; done
echo "== followup pid $QPID gone $(date -u +%H:%M:%S)"

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
  tail -c 1500 "/tmp/${name}_r5.out" 2>/dev/null
  echo
  if [ $rc -ne 0 ]; then
    wait_alive 8 || true
  fi
}

wait_alive 20 || { echo "tunnel never recovered"; exit 1; }

# 1. funnel with the CE fix (VERDICT ask 6: >=500 qps batched)
phase funnel2_b64 900 env HST_BENCH_N=200000 HST_BENCH_BATCH=64 \
  python benchmarks/bench_funnel.py
phase funnel2_b512 900 env HST_BENCH_N=200000 HST_BENCH_BATCH=512 \
  python benchmarks/bench_funnel.py

# 2. hybrid serving row with the fixed on-device loop (real in-window
#    number to replace the replayed last-good)
phase hybrid2 900 env HST_BENCH_CHILD=1 HST_BENCH_PHASE=hybrid \
  HST_BENCH_DEADLINE_S=850 python bench.py

# 3. loadgen with the CE+tokenizer fix in the server path
phase loadgen2_closed 900 python benchmarks/loadgen.py --docs 200000 \
  --closed --workers 16 --duration 20

echo "== followup2 complete $(date -u +%H:%M:%S)"
