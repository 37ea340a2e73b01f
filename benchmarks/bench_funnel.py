"""Multi-stage funnel benchmark: batched vs per-query, recompile audit.

Measures the 100->20->5 funnel (reference pipelines.py:470-511) both ways:
  per-query   MultiStagePipeline.search in a Python loop (the reference's
              only mode)
  batched     run_funnel_batch — one dense kernel, one candidate-BM25
              kernel, one length-bucketed cross-encoder pass for all
              B*stage2_k pairs

and audits recompile churn: the cross-encoder jit cache size must stay
bounded by the (batch-bucket x length-bucket) grid across a mixed-length
query stream — growth beyond that grid means shape churn.

Prints one JSON line with both QPS figures and the compile counts.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/hst_jax_cache")


def _mixed_corpus(n: int, rng) -> list:
    vocab = [f"term{i}" for i in range(4000)]
    docs = []
    for i in range(n):
        ln = int(rng.choice([6, 12, 30, 80, 160]))  # mixed lengths
        docs.append(" ".join(rng.choice(vocab, size=ln)))
    return docs


def main() -> None:
    if os.environ.get("JAX_PLATFORMS") == "cpu":
        # the axon TPU plugin wins over the env var; force via config
        jax.config.update("jax_platforms", "cpu")
    from hybridsearch_tpu.models.encoder import HashingEncoder
    from hybridsearch_tpu.pipelines import MultiStagePipeline, run_funnel_batch

    backend = jax.default_backend()
    n_docs = int(os.environ.get("HST_BENCH_N",
                                "200000" if backend != "cpu" else "20000"))
    B = int(os.environ.get("HST_BENCH_BATCH", "64"))
    rng = np.random.default_rng(5)
    pipe = MultiStagePipeline(encoder=HashingEncoder(dim=128),
                              stage1_k=100, stage2_k=20, final_k=5)
    corpus = _mixed_corpus(n_docs, rng)  # host synth outside the timer
    t0 = time.time()
    build_info = pipe.index(corpus)
    build_s = time.time() - t0

    vocab = [f"term{i}" for i in range(4000)]
    queries = [" ".join(rng.choice(vocab, size=int(rng.integers(2, 7))))
               for _ in range(B)]

    # warm both paths (compiles)
    pipe.search(queries[0])
    pipe.search_batch(queries[:8])

    t0 = time.perf_counter()
    for q in queries:
        pipe.search(q)
    per_query_qps = B / (time.perf_counter() - t0)

    cache_before = pipe.reranker.model._fwd._cache_size()
    t0 = time.perf_counter()
    rows, meta = run_funnel_batch(pipe.indexer, pipe.reranker, queries,
                                  stage1_k=100, stage2_k=20, final_k=5)
    batched_qps = B / (time.perf_counter() - t0)
    # steady state (second batched run, everything compiled)
    t0 = time.perf_counter()
    _rows2, meta2 = run_funnel_batch(pipe.indexer, pipe.reranker, queries,
                                     stage1_k=100, stage2_k=20, final_k=5)
    batched_qps2 = B / (time.perf_counter() - t0)
    cache_after = pipe.reranker.model._fwd._cache_size()

    # CE-forward MFU on the steady-state pass (VERDICT r4 ask 6): padded
    # FLOPs accounted inside predict / wall time of the CE stage, over
    # the chip's peak (v5e bf16 ~197 TF/s; CPU rows report flops only)
    peak = 197e12 if backend == "tpu" else None
    ce_mfu = None
    if meta2.get("ce_flops") and meta2.get("t_ce_s") and peak:
        ce_mfu = meta2["ce_flops"] / meta2["t_ce_s"] / peak

    # mixed-length stream recompile audit: after the bucket grid is built,
    # a fresh stream of different mixed-length queries must add ZERO
    # cross-encoder compiles
    queries2 = [" ".join(rng.choice(vocab, size=int(rng.integers(2, 7))))
                for _ in range(B)]
    run_funnel_batch(pipe.indexer, pipe.reranker, queries2,
                     stage1_k=100, stage2_k=20, final_k=5)
    cache_stream = pipe.reranker.model._fwd._cache_size()

    print(json.dumps({
        "metric": f"funnel_qps@{n_docs}docs_b{B}_100-20-5",
        "value": round(batched_qps2, 2),
        "unit": "qps",
        "vs_baseline": round(batched_qps2 / max(per_query_qps, 1e-9), 2),
        "per_query_qps": round(per_query_qps, 2),
        "batched_qps_first": round(batched_qps, 2),
        "ce_compiles_during_batch": cache_after - cache_before,
        "ce_compiles_on_fresh_stream": cache_stream - cache_after,
        "index_build_s": round(build_s, 1),
        "index_build_timings": build_info.get("timings_s"),
        "stage_s": {k: meta2[k] for k in
                    ("t_encode_s", "t_dense_s", "t_bm25_s", "t_ce_s")
                    if k in meta2},
        "ce_pairs": meta2.get("ce_pairs"),
        "ce_tokens_padded": meta2.get("ce_tokens_padded"),
        "ce_tflops": round(meta2.get("ce_flops", 0) / 1e12, 3),
        "ce_mfu": round(ce_mfu, 4) if ce_mfu is not None else None,
        # provenance: the chip row must show the TRAINED cross-encoder
        # served the rerank stage (VERDICT r3 ask 5)
        "ce": type(pipe.reranker).__name__,
        "ce_pretrained": getattr(pipe.reranker.model, "pretrained", None),
        "ce_weights_origin": getattr(pipe.reranker.model,
                                     "weights_origin", None),
        "backend": backend,
    }))


if __name__ == "__main__":
    main()
