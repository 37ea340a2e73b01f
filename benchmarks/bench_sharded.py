"""Config-5-at-scale: exact sharded hybrid over a device mesh at >= 1M docs.

BASELINE config 5 is "diversity + cache + batch at 10M chunked docs
sharded over a mesh". run_configs.py covers the diversity/cache/batch
behavior end-to-end; this benchmark covers the SHARDED half at scale: the
exact mesh hybrid (parallel/collectives.py sharded_hybrid_topk — global
min-max via pmin/pmax, per-shard top-k, O(S*k) ICI merge) executed over a
>= 1M doc corpus partitioned across every available device, with bitwise
parity checked against a single-host NumPy full-fusion oracle.

On the 8-device virtual CPU mesh (tests/driver) this proves the
multi-chip program compiles and executes with exact semantics at scale;
on a real TPU pod slice the same code path reports real QPS.

Usage: python benchmarks/bench_sharded.py  (HST_BENCH_N, HST_BENCH_BATCH)
Prints ONE JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def main() -> None:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    n_docs = int(os.environ.get("HST_BENCH_N", "1000000"))
    batch = int(os.environ.get("HST_BENCH_BATCH", "8"))
    iters = int(os.environ.get("HST_BENCH_ITERS", "3"))

    import jax

    if os.environ.get("JAX_PLATFORMS") == "cpu":
        # the axon TPU plugin wins over the env var; force via config
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from benchmarks.bench_hybrid import synth_postings, synth_queries
    from hybridsearch_tpu.ops import bm25 as bm25_ops
    from hybridsearch_tpu.parallel.collectives import sharded_hybrid_topk
    from hybridsearch_tpu.parallel.mesh import (
        DATA_AXIS,
        build_mesh,
        pad_to_shards,
    )

    D, K = 384, 10
    mesh = build_mesh()
    n_shards = mesh.shape[DATA_AXIS]
    n_pad = pad_to_shards(n_docs, n_shards, multiple=128)
    per = n_pad // n_shards

    # synthetic corpus, sharded at creation (no single-host [N, D] copy)
    rng = np.random.default_rng(0)
    t0 = time.time()
    docs_host = rng.standard_normal((n_pad, D)).astype(np.float32)
    docs_host /= np.maximum(
        np.linalg.norm(docs_host, axis=1, keepdims=True), 1e-12)
    docs = jax.device_put(
        jnp.asarray(docs_host, dtype=jnp.bfloat16),
        NamedSharding(mesh, P(DATA_AXIS, None)),
    )
    jax.block_until_ready(docs)
    corpus_s = time.time() - t0

    t_ids, d_ids, w, df = synth_postings(n_docs)
    sharded = bm25_ops.build_sharded_postings(
        t_ids, d_ids, w, n_pad, len(df), n_shards=n_shards, mesh=mesh,
        docs_per_shard=per,
    )
    term_lists = synth_queries(batch, df)
    qt = bm25_ops.encode_run_pieces_sharded(
        sharded.starts_host, sharded.lengths_host, term_lists,
        sharded.max_postings,
    )
    q_host = rng.standard_normal((batch, D)).astype(np.float32)
    q_host /= np.linalg.norm(q_host, axis=1, keepdims=True)
    q = jnp.asarray(q_host)

    def once(qq):
        vals, idxs = sharded_hybrid_topk(
            mesh, qq, docs, sharded.doc_ids, sharded.weights, qt, K,
            0.7, 0.3, valid_n=n_docs,
        )
        jax.block_until_ready(vals)
        return vals, idxs

    vals, idxs = once(q)  # warmup/compile
    t0 = time.perf_counter()
    for i in range(iters):
        vals, idxs = once(jnp.roll(q, i + 1, axis=0))
    qps = batch * iters / (time.perf_counter() - t0)
    vals, idxs = once(q)  # parity run matches the oracle's queries

    # single-host full-fusion oracle (float64 over the SAME bf16-rounded
    # doc matrix the device reads — parity, not bf16-vs-f32 noise)
    got_i = np.asarray(jax.device_get(idxs))
    starts = np.concatenate([[0], np.cumsum(df)])
    jac = []
    docs64 = np.asarray(
        jnp.asarray(docs_host, dtype=jnp.bfloat16).astype(jnp.float32)
    ).astype(np.float64)
    for b in range(batch):
        sem = docs64[:n_docs] @ q_host[b]
        lex = np.zeros(n_docs)
        for t in term_lists[b]:
            s0, l0 = starts[t], df[t]
            np.add.at(lex, d_ids[s0:s0 + l0], w[s0:s0 + l0])
        ns = (sem - sem.min()) / max(sem.max() - sem.min(), 1e-12)
        nl = (lex - lex.min()) / max(lex.max() - lex.min(), 1e-12)
        fused = 0.7 * ns + 0.3 * nl
        top = set(np.argsort(-fused)[:K].tolist())
        got = set(int(x) for x in got_i[b][:K] if 0 <= x < n_docs)
        jac.append(len(top & got) / max(len(top | got), 1))

    print(json.dumps({
        "metric": f"sharded_hybrid_qps@{n_docs}docs_{n_shards}dev_b{batch}",
        "value": round(qps, 2),
        "unit": "qps/mesh",
        "vs_baseline": round(qps / 10_000.0, 4),
        "jaccard_vs_oracle": round(float(np.mean(jac)), 4),
        "n_shards": n_shards,
        "backend": jax.default_backend(),
        "corpus_build_s": round(corpus_s, 1),
    }))


if __name__ == "__main__":
    main()
