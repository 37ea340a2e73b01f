"""Tile-resident joint-bound hybrid (ops/hybrid.py hybrid_tile_topk) —
quality, certificate soundness, and the dense tile primitives.

Reference semantics being matched: reference core.py:199-271 (normalize
both full score arrays, fuse, top-k). The tile path must return the same
fused top-k wherever its per-query `exact` flag is True, for any layout,
and must never claim exactness falsely."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hybridsearch_tpu.index.sparse_index import BM25
from hybridsearch_tpu.ops.dense import (
    dense_tile_stats,
    gather_tile_scores,
    l2_normalize,
    tiled_dense_topk,
)
from hybridsearch_tpu.ops.hybrid import hybrid_tile_topk
from hybridsearch_tpu.retrieval.searcher import _fuse_and_topk, _semantic_full


@pytest.fixture
def rng():
    return np.random.default_rng(42)


def _oracle(bm25, docs, queries, q, w_s, w_l, bias, k):
    sem = _semantic_full(q, docs)
    lex = jnp.asarray(bm25.batch_scores(queries))
    if bias is None:
        bias = jnp.zeros(docs.shape[0], jnp.float32)
    return _fuse_and_topk(sem, lex, jnp.float32(w_s), jnp.float32(w_l),
                          bias, k)


def _mk_corpus(rng, n, n_vocab, d=32, doc_len=(4, 14)):
    vocab = [f"t{i}" for i in range(n_vocab)]
    texts = [" ".join(rng.choice(vocab, size=int(rng.integers(*doc_len))))
             for _ in range(n)]
    bm25 = BM25().fit(texts)
    docs = l2_normalize(jnp.asarray(
        rng.standard_normal((n, d)).astype(np.float32)))
    return vocab, bm25, docs


def test_tile_hybrid_matches_oracle(rng):
    """Full-coverage regime (p_depth >= every df, kt >= n_tiles): every
    query must certify AND match full fusion."""
    n = 2048
    vocab, bm25, docs = _mk_corpus(rng, n, 120)
    queries = [" ".join(rng.choice(vocab, size=3)) for _ in range(4)]
    q = l2_normalize(jnp.asarray(
        rng.standard_normal((4, 32)).astype(np.float32)))
    imp, enc = bm25.encode_queries_impact(queries, p_depth=4096,
                                          p_max=4096)
    po = bm25._state.postings
    res = hybrid_tile_topk(q, docs, imp, enc, 5, 0.7, 0.3, kt=64,
                           p_depth=4096,
                           full_postings=(po.doc_ids, po.weights))
    ovals, oidx = _oracle(bm25, docs, queries, q, 0.7, 0.3, None, 5)
    assert bool(res.exact.all()), "full coverage must certify"
    np.testing.assert_allclose(np.asarray(res.values), np.asarray(ovals),
                               rtol=1e-4, atol=1e-5)
    rv, ov = np.asarray(res.values), np.asarray(ovals)
    ri, oi = np.asarray(res.indices), np.asarray(oidx)
    for b in range(rv.shape[0]):
        mism = ri[b] != oi[b]
        if mism.any():  # disagreements must be exact-score ties
            np.testing.assert_allclose(rv[b][mism], ov[b][mism],
                                       rtol=1e-5, atol=1e-6)


def test_tile_hybrid_tombstones_never_returned(rng):
    n = 1024
    vocab, bm25, docs = _mk_corpus(rng, n, 80)
    queries = [" ".join(rng.choice(vocab, size=3)) for _ in range(3)]
    q = l2_normalize(jnp.asarray(
        rng.standard_normal((3, 32)).astype(np.float32)))
    bias_np = np.zeros(n, np.float32)
    dead = rng.choice(n, size=n // 4, replace=False)
    bias_np[dead] = -np.inf
    imp, enc = bm25.encode_queries_impact(queries, p_depth=1024,
                                          p_max=4096)
    po = bm25._state.postings
    res = hybrid_tile_topk(q, docs, imp, enc, 10, 0.6, 0.4,
                           bias=jnp.asarray(bias_np), kt=16,
                           full_postings=(po.doc_ids, po.weights))
    ri = np.asarray(res.indices)
    assert not np.isin(ri[ri >= 0], dead).any()


def test_tile_hybrid_certificate_soundness_fuzz():
    """Wherever exact=True the result equals full fusion — randomized
    corpora, weights, probe budgets, prune depths, tombstones, layouts
    (clustered or not: soundness is layout-independent)."""
    rng = np.random.default_rng(1234)
    for trial in range(8):
        n = int(rng.choice([512, 1024, 3000]))
        vocab, bm25, docs = _mk_corpus(rng, n, int(rng.choice([50, 300])))
        nq = 3
        queries = [" ".join(rng.choice(vocab,
                                       size=int(rng.integers(1, 5))))
                   for _ in range(nq)]
        q = l2_normalize(jnp.asarray(
            rng.standard_normal((nq, 32)).astype(np.float32)))
        w_s = float(rng.choice([0.3, 0.7, 1.0]))
        kt = int(rng.choice([2, 8, 64]))
        pd = int(rng.choice([64, 1024]))
        p_max = int(rng.choice([256, 4096]))
        margin = int(rng.choice([16, 128]))
        bias = None
        if rng.random() < 0.5:
            bias_np = np.zeros(n, np.float32)
            bias_np[rng.choice(n, size=n // 10, replace=False)] = -np.inf
            bias = jnp.asarray(bias_np)
        imp, enc = bm25.encode_queries_impact(queries, p_depth=pd,
                                              p_max=p_max)
        po = bm25._state.postings
        res = hybrid_tile_topk(
            q, docs, imp, enc, 5, w_s, 1.0 - w_s, bias=bias, kt=kt,
            p_depth=pd, margin=margin,
            full_postings=(po.doc_ids, po.weights))
        ovals, _ = _oracle(bm25, docs, queries, q, w_s, 1.0 - w_s, bias, 5)
        ex = np.asarray(res.exact)
        rv, ov = np.asarray(res.values), np.asarray(ovals)
        for b in range(nq):
            if ex[b]:
                np.testing.assert_allclose(
                    rv[b], ov[b], rtol=1e-4, atol=1e-4,
                    err_msg=f"trial {trial} q{b}: claimed exact, kt={kt} "
                            f"pd={pd} p_max={p_max} w_s={w_s} "
                            f"margin={margin}")


def test_searcher_tile_path_parity(monkeypatch, rng):
    """search_batch through the clustered tile-resident path must return
    exactly what the full fused path returns (same corpus, queries)."""
    from hybridsearch_tpu.config import EngineConfig
    from hybridsearch_tpu.models.encoder import HashingEncoder
    from hybridsearch_tpu.retrieval import searcher as searcher_mod
    from hybridsearch_tpu.retrieval.searcher import Searcher

    vocab = [f"w{i}" for i in range(150)]
    topics = [" ".join(f"z{z}t{j}" for j in range(8)) for z in range(5)]
    texts = [f"{topics[i % 5]} " +
             " ".join(rng.choice(vocab, size=8)) for i in range(900)]
    queries = [f"z2t1 z2t3 {vocab[7]}", f"z4t0 z4t5", "w3 w11 w42"]
    cfg = EngineConfig()
    cfg.index.layout = "clustered"
    s = Searcher(encoder=HashingEncoder(dim=64), use_query_memory=False,
                 config=cfg)
    s.indexer.index_documents(texts)
    full = s.search_batch(queries, top_k=5, log=False)
    monkeypatch.setattr(searcher_mod, "SPARSE_HYBRID_MIN_DOCS", 100)
    tile = s.search_batch(queries, top_k=5, log=False)
    for a, b in zip(full, tile):
        assert [i for _v, _c, i in a] == [i for _v, _c, i in b]
        np.testing.assert_allclose([v for v, _c, _i in a],
                                   [v for v, _c, _i in b],
                                   rtol=1e-4, atol=1e-5)


def test_dense_tile_stats_parity(rng):
    """Tile maxima + alive min/max must equal brute force, bias included."""
    n, d, B = 1000, 64, 5
    docs = l2_normalize(jnp.asarray(
        rng.standard_normal((n, d)).astype(np.float32)))
    q = l2_normalize(jnp.asarray(
        rng.standard_normal((B, d)).astype(np.float32)))
    bias_np = np.zeros(n, np.float32)
    bias_np[rng.choice(n, size=100, replace=False)] = -np.inf
    bias = jnp.asarray(bias_np)
    tile_max, smin, smax = dense_tile_stats(q, docs, bias, block_n=256)
    scores = np.asarray(q @ docs.T, np.float32)
    alive = bias_np >= 0
    np.testing.assert_allclose(np.asarray(smax),
                               scores[:, alive].max(axis=1), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(smin),
                               scores[:, alive].min(axis=1), rtol=1e-5)
    n_tiles = -(-n // 128)
    pad = np.full((B, n_tiles * 128 - n), -np.inf, np.float32)
    sb = np.concatenate([np.where(alive, scores, -np.inf), pad], axis=1)
    tm_ref = sb.reshape(B, n_tiles, 128).max(axis=2)
    np.testing.assert_allclose(np.asarray(tile_max), tm_ref, rtol=1e-5)
    # parity with the established with_stats sweep
    _, _, smin2, smax2 = tiled_dense_topk(q, docs, 8, bias=bias,
                                          with_stats=True, block_n=512)
    np.testing.assert_allclose(np.asarray(smin), np.asarray(smin2),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(smax), np.asarray(smax2),
                               rtol=1e-6)


def test_gather_tile_scores_parity(rng):
    n, d, B, KT = 700, 32, 3, 4
    docs = l2_normalize(jnp.asarray(
        rng.standard_normal((n, d)).astype(np.float32)))
    q = l2_normalize(jnp.asarray(
        rng.standard_normal((B, d)).astype(np.float32)))
    n_tiles = -(-n // 128)
    tt = jnp.asarray(rng.choice(n_tiles, size=(B, KT), replace=True)
                     .astype(np.int32))
    s, gidx = gather_tile_scores(q, docs, tt)
    scores = np.asarray(q @ docs.T, np.float32)
    s_np, g_np = np.asarray(s), np.asarray(gidx)
    for b in range(B):
        for j in range(KT * 128):
            gi = g_np[b, j]
            if gi < n:
                np.testing.assert_allclose(s_np[b, j], scores[b, gi],
                                           rtol=1e-5, atol=1e-6)
            else:
                assert s_np[b, j] == -np.inf
