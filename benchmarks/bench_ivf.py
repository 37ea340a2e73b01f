"""IVF recall@10-vs-QPS sweep against the exact kernel.

The 'distributed FAISS IVF' the reference only roadmapped
(reference README.md:396), measured: build the device IVF index
(index/ivf.py — blocked k-means, cluster-ordered contiguous chunks, bf16
storage) at HST_BENCH_N docs, then for each nprobe record recall@10 vs the
exact streaming top-k (ops/dense.py tiled_dense_topk) and cache-busted,
async-pipelined QPS. With HST_BENCH_MESH=1 the sweep runs the collective
mesh program instead (virtual 8-device CPU mesh in tests/driver).

Prints one JSON line per nprobe plus a summary line.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

D = 384
TOP_K = 10


def main() -> None:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import jax

    if os.environ.get("JAX_PLATFORMS") == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from benchmarks.bench_hybrid import build_correlated_corpus
    from hybridsearch_tpu.index.ivf import IVFIndex
    from hybridsearch_tpu.ops.dense import tiled_dense_topk

    n_docs = int(os.environ.get("HST_BENCH_N", "1000000"))
    batch = int(os.environ.get("HST_BENCH_BATCH", "256"))
    iters = int(os.environ.get("HST_BENCH_ITERS", "4"))
    if jax.default_backend() == "cpu":
        n_docs = min(n_docs, 100_000)

    # topic-clustered corpus (bench_hybrid.synth_correlated's dense half):
    # IVF's speed/recall trade only exists when embeddings cluster, which
    # real sentence embeddings do — iid gaussian docs are the no-structure
    # worst case where ANY coarse quantizer degrades to exhaustive search
    n_topics = 1024
    rng = np.random.default_rng(0)
    topic_of = rng.integers(0, n_topics, n_docs)
    docs, cent = build_correlated_corpus(n_docs, topic_of,
                                         n_topics=n_topics)
    q_topics = rng.integers(0, n_topics, batch)
    from benchmarks.bench_hybrid import query_vectors

    q = query_vectors(q_topics, cent)

    # exact reference ids
    _, exact_ids = tiled_dense_topk(q, docs, TOP_K,
                                    block_n=min(262144, n_docs))
    exact_ids = np.asarray(jax.device_get(exact_ids))

    mesh = None
    if os.environ.get("HST_BENCH_MESH") == "1":
        from hybridsearch_tpu.parallel.mesh import build_mesh

        mesh = build_mesh()

    # the build consumes the device bf16 corpus DIRECTLY: k-means runs on
    # the storage dtype (per-block normalization) and the build releases
    # the source before uploading its permuted storage, so peak HBM is
    # one corpus copy + block temps — the old host-f32 round trip put a
    # 15.4 GB f32 copy on the chip and OOMed at 10M
    t0 = time.time()
    box = [docs]
    del docs  # ownership moves into the build; no caller reference keeps
    #           the source alive when the build releases it pre-upload
    idx = IVFIndex(dim=D, nprobe=8, mesh=mesh,
                   storage_dtype=jnp.bfloat16).build(box.pop())
    build_s = time.time() - t0

    q_np = np.asarray(q)
    best = None
    for nprobe in (1, 2, 4, 8, 16, 32, 64):
        if nprobe > idx._centroids.shape[-2]:
            break
        _, got = idx.search(q_np, TOP_K, nprobe=nprobe)  # warmup/compile
        t0 = time.perf_counter()
        for i in range(iters):
            _, got_i = idx.search(np.roll(q_np, i + 1, axis=0), TOP_K,
                                  nprobe=nprobe)
        qps = batch * iters / (time.perf_counter() - t0)
        rec = np.mean([
            len(set(got[b]) & set(exact_ids[b])) / TOP_K
            for b in range(batch)
        ])
        row = {"metric": f"ivf_recall_qps@{n_docs}docs_nprobe{nprobe}",
               "nprobe": nprobe, "recall@10": round(float(rec), 4),
               "value": round(qps, 2), "unit": "qps/chip",
               "vs_baseline": round(qps / 10_000.0, 4)}
        print(json.dumps(row), flush=True)
        if rec >= 0.95 and (best is None or qps > best["value"]):
            best = row
    print(json.dumps({
        "metric": f"ivf_best_qps_at_recall95@{n_docs}docs",
        "value": best["value"] if best else 0.0,
        "unit": "qps/chip",
        "vs_baseline": round((best["value"] if best else 0.0) / 10_000.0, 4),
        "build_s": round(build_s, 1),
        "mesh": mesh is not None,
    }))


if __name__ == "__main__":
    main()
