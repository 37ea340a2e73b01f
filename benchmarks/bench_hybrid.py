"""Full hybrid benchmark at corpus scale on one chip.

Measures the engine's actual serving hot path at 10M docs — the
sparse-correction exact hybrid (ops/hybrid.py): one streaming dense sweep
(Pallas fused matmul+tile-max with exact global min/max stats) + block-max
lexical tile bounds + exact CSR candidate rescoring + min-max fusion with a
per-query exactness certificate — the path Searcher.search_batch takes for
every corpus >= 200k docs. This is the TPU-native equivalent of the
reference's whole Searcher.search (reference core.py:199-271: semantic +
lexical arms, min-max normalize, weighted fusion, top-k), which the round-1
headline bench only half-covered (dense arm alone; VERDICT.md weak #1).

The lexical corpus is synthetic but structurally realistic: term document
frequencies follow a Zipf law over a 50k vocabulary, posting runs are
doc-sorted CSR exactly as BM25.fit builds them, and queries mix
mid-frequency informative terms (the post-stopword regime the reference's
extractor produces, reference extractor.py:6-31) with occasional hot terms
that exercise run splitting (LENGTH_BUCKETS / T_CAPS ladder).

Run directly for a one-line JSON report, or via bench.py (the default
headline mode).
"""

from __future__ import annotations

import json
import os
import time
from typing import List, Tuple

import numpy as np

D = 384
TOP_K = 10
TARGET_QPS = 10_000.0


def synth_postings(
    n_docs: int,
    vocab_size: int = 50_000,
    avg_postings_per_doc: int = 12,
    seed: int = 3,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """(term_ids, doc_ids, weights, df) in term-major doc-sorted order.

    df follows Zipf (df_r ~ 1/r, capped at n_docs/4). Doc ids within each
    term run are generated ALREADY sorted via cumsum of exponential gaps —
    O(P) vectorized with no global sort, which matters on this 1-core host.
    """
    rng = np.random.default_rng(seed)
    total = n_docs * avg_postings_per_doc
    ranks = np.arange(1, vocab_size + 1, dtype=np.float64)
    df = total * (1.0 / ranks) / np.log(vocab_size + 1)
    df = np.minimum(df, n_docs // 4).astype(np.int64)
    df = np.maximum(df, 1)
    nnz = int(df.sum())

    term_ids = np.repeat(np.arange(vocab_size, dtype=np.int64), df)
    # sorted-within-run doc ids: normalized cumsum of Exp(1) gaps per run
    gaps = rng.exponential(1.0, nnz).astype(np.float64) + 1e-9
    cum = np.cumsum(gaps)
    starts = np.concatenate([[0], np.cumsum(df)])[:-1]
    run_base = cum[starts] - gaps[starts]  # cumsum value before each run
    rel = cum - np.repeat(run_base, df)  # per-run ascending positions
    run_total = np.repeat(rel[np.cumsum(df) - 1], df)
    doc_ids = np.floor(rel / (run_total + 1e-9) * (n_docs - 1)).astype(np.int64)
    weights = rng.exponential(2.0, nnz).astype(np.float32) + 0.1
    return term_ids, doc_ids, weights, df


def synth_queries(
    batch: int, df: np.ndarray, hot_frac: float = 0.2, seed: int = 11
) -> List[List[int]]:
    """Per-query term-id lists: 4-8 mid-frequency terms (df in [64, 65536]),
    plus one hot term (df > 65536) on `hot_frac` of queries."""
    rng = np.random.default_rng(seed)
    mid = np.flatnonzero((df >= 64) & (df <= 65_536))
    hot = np.flatnonzero(df > 65_536)
    out: List[List[int]] = []
    for i in range(batch):
        n_terms = int(rng.integers(4, 9))
        # log-uniform over the mid-frequency band (short-head skew, like
        # real query-term df distributions)
        pos = (np.exp(rng.uniform(0, np.log(len(mid)), n_terms)) - 1).astype(int)
        terms = mid[np.clip(pos, 0, len(mid) - 1)].tolist()
        if len(hot) and rng.random() < hot_frac:
            terms.append(int(hot[rng.integers(0, len(hot))]))
        out.append(terms)
    return out


def run(n_docs: int, batch: int, iters: int) -> dict:
    import jax
    import jax.numpy as jnp

    from bench import build_corpus
    from hybridsearch_tpu.ops import bm25 as bm25_ops
    from hybridsearch_tpu.ops.hybrid import hybrid_sparse_topk
    from hybridsearch_tpu.retrieval.searcher import _SPARSE_LADDER

    docs = build_corpus(n_docs)

    t_ids, d_ids, w, df = synth_postings(n_docs)
    po = bm25_ops.build_postings_arrays(
        t_ids, d_ids.astype(np.int32), w, n_docs, len(df)
    )
    jax.block_until_ready(po.weights)

    term_lists = synth_queries(batch, df)
    hot = bm25_ops.encode_hot_terms(po, term_lists)
    exclude = (set(np.flatnonzero(po.hot_rows_of >= 0).tolist())
               if hot is not None else None)
    groups = bm25_ops.encode_run_pieces(
        po.starts_host, po.lengths_host, term_lists, po.max_postings,
        exclude=exclude,
    )
    qkey = jax.random.PRNGKey(17)
    q = jax.random.normal(qkey, (batch, D), dtype=jnp.float32)
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)

    def serve_once() -> Tuple[int, int]:
        """One serving dispatch exactly as Searcher._sparse_hybrid: first
        ladder rung, escalate only the uncertified remainder."""
        rungs = 0
        for kd, mt, cl in _SPARSE_LADDER:
            rungs += 1
            res = hybrid_sparse_topk(
                q, docs, po, groups, TOP_K, 0.7, 0.3,
                k_dense=kd, m_tiles=mt, c_lex=cl, n_alive=n_docs, hot=hot,
            )
            exact = np.asarray(jax.device_get(res.exact))
            if exact.all():
                break
        jax.block_until_ready(res.values)
        return int(exact.sum()), rungs

    n_exact, rungs = serve_once()  # warmup/compile
    t0 = time.perf_counter()
    for _ in range(iters):
        n_exact, rungs = serve_once()
    dt = time.perf_counter() - t0
    qps = batch * iters / dt
    return {
        "metric": f"hybrid_sparse_topk_qps@{n_docs}docs_{D}d_k{TOP_K}_b{batch}",
        "value": round(qps, 2),
        "unit": "qps/chip",
        "vs_baseline": round(qps / TARGET_QPS, 4),
        "exact_pct": round(100.0 * n_exact / batch, 2),
        "ladder_rungs": rungs,
    }


def main() -> None:
    n_docs = int(os.environ.get("HST_BENCH_N", "10000000"))
    batch = int(os.environ.get("HST_BENCH_BATCH", "256"))
    import jax

    if jax.default_backend() == "cpu":
        n_docs = min(n_docs, 200_000)
    iters = int(os.environ.get("HST_BENCH_ITERS", "8"))
    print(json.dumps(run(n_docs, batch, iters)))


if __name__ == "__main__":
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    main()
