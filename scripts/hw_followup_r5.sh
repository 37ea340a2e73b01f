#!/bin/bash
# Follow-on to hw_runbook_r5.sh: once the main queue exits, run the FIXED
# stage-attribution harness (CSR tables as traced args — the closure-constant
# version broke the tunnel's remote_compile twice on 2026-08-19). Same
# single-client discipline: everything under /tmp/hst_bench_lock.
#
# Usage: nohup scripts/hw_followup_r5.sh <queue_pid> > /tmp/hw_r5_followup.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
QPID=${1:?queue pid}

# wait for the main queue to finish (it owns the tunnel until then)
while kill -0 "$QPID" 2>/dev/null; do sleep 30; done
echo "== queue pid $QPID gone $(date -u +%H:%M:%S)"

probe() {
  timeout 240 python -c "
import jax, jax.numpy as jnp
assert jax.default_backend() == 'tpu', jax.default_backend()
x = jnp.ones((1024, 1024), dtype=jnp.bfloat16)
print('PROBE_OK', float((x @ x).sum()))
" 2>&1 | grep -q PROBE_OK
}

for _ in $(seq 1 20); do
  probe && break
  sleep 90
done

echo "== attr2 start $(date -u +%H:%M:%S)"
touch /tmp/hst_bench_lock
HST_ATTR_SP=2,4 HST_ATTR_ITERS=6 timeout 3300 \
  python benchmarks/attr_supertile.py 10000000 1024 > /tmp/attr2_r5.log 2>&1
rc=$?
rm -f /tmp/hst_bench_lock
echo "== attr2 rc=$rc $(date -u +%H:%M:%S)"
grep '{' /tmp/attr2_r5.log | tail -4
echo "== followup complete $(date -u +%H:%M:%S)"
