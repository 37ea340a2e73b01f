"""Sparse-correction hybrid (ops/hybrid.py) vs the full-fusion oracle.

The full [B, N] fused path (_fuse_and_topk over complete score arrays) is
the semantics oracle; hybrid_sparse_topk must match it wherever its TA
certificate reports exact=True — and the certificate must hold on normal
corpora with default candidate budgets.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from hybridsearch_tpu.index.sparse_index import BM25
from hybridsearch_tpu.ops.dense import l2_normalize
from hybridsearch_tpu.ops.fusion import max_normalize
from hybridsearch_tpu.ops.hybrid import hybrid_sparse_topk
from hybridsearch_tpu.retrieval.searcher import _fuse_and_topk, _semantic_full

VOCAB = [f"word{i}" for i in range(1000)]
N, D, B, K = 4096, 64, 4, 10


@pytest.fixture(scope="module")
def corpus(rng):
    toks = rng.choice(VOCAB, size=(N, 12))
    texts = [" ".join(row) for row in toks]
    bm25 = BM25().fit(texts)
    docs = l2_normalize(jnp.asarray(
        rng.standard_normal((N, D)).astype(np.float32)))
    queries = [" ".join(rng.choice(VOCAB, size=3)) for _ in range(B)]
    q = l2_normalize(jnp.asarray(
        rng.standard_normal((B, D)).astype(np.float32)))
    return bm25, docs, queries, q


def _oracle(bm25, docs, queries, q, w_s, w_l, bias, k):
    sem = _semantic_full(q, docs)
    lex = jnp.asarray(bm25.batch_scores(queries))
    return _fuse_and_topk(sem, lex, jnp.float32(w_s), jnp.float32(w_l),
                          bias, k)


def _assert_match(res, ovals, oidx):
    assert bool(res.exact.all()), "certificate must hold on this corpus"
    np.testing.assert_allclose(np.asarray(res.values), np.asarray(ovals),
                               rtol=1e-4, atol=1e-5)
    # ids must agree except across exact value ties
    rv, ov = np.asarray(res.values), np.asarray(ovals)
    ri, oi = np.asarray(res.indices), np.asarray(oidx)
    for b in range(rv.shape[0]):
        mism = ri[b] != oi[b]
        if mism.any():
            # any disagreement must be a tie at the same score
            np.testing.assert_allclose(rv[b][mism], ov[b][mism],
                                       rtol=1e-5, atol=1e-6)


def test_matches_full_fusion_minmax(corpus):
    bm25, docs, queries, q = corpus
    groups = bm25.encode_queries_bucketed(queries)
    bias = jnp.zeros((N,), jnp.float32)
    res = hybrid_sparse_topk(q, docs, bm25.postings, groups, K, 0.7, 0.3,
                             bias=bias, block_n=1024)
    ovals, oidx = _oracle(bm25, docs, queries, q, 0.7, 0.3, bias, K)
    _assert_match(res, ovals, oidx)


def test_matches_full_fusion_with_tombstones(corpus, rng):
    bm25, docs, queries, q = corpus
    groups = bm25.encode_queries_bucketed(queries)
    bias_np = np.zeros(N, np.float32)
    dead = rng.choice(N, size=200, replace=False)
    bias_np[dead] = -np.inf
    bias = jnp.asarray(bias_np)
    res = hybrid_sparse_topk(q, docs, bm25.postings, groups, K, 0.6, 0.4,
                             bias=bias, block_n=1024)
    ovals, oidx = _oracle(bm25, docs, queries, q, 0.6, 0.4, bias, K)
    _assert_match(res, ovals, oidx)
    assert not np.isin(np.asarray(res.indices), dead).any()


def test_max_norm_mode(corpus):
    """HybridBM25Pipeline's divide-by-max quirk, no [B, N] arrays."""
    bm25, docs, queries, q = corpus
    groups = bm25.encode_queries_bucketed(queries)
    res = hybrid_sparse_topk(q, docs, bm25.postings, groups, K, 0.5, 0.5,
                             norm="max", block_n=1024)
    sem = _semantic_full(q, docs)
    lex = jnp.asarray(bm25.batch_scores(queries))
    fused = max_normalize(sem) * 0.5 + max_normalize(lex) * 0.5
    ovals, oidx = jax_topk(fused, K)
    assert bool(res.exact.all())
    np.testing.assert_allclose(np.asarray(res.values), ovals,
                               rtol=1e-4, atol=1e-5)


def jax_topk(fused, k):
    import jax.lax as lax

    v, i = lax.top_k(fused, k)
    return np.asarray(v), np.asarray(i)


def test_semantic_only_queries(corpus):
    """Queries with no vocabulary hits: lexical arm is all zeros, fusion
    degrades to the constant-input normalization edge case."""
    bm25, docs, _queries, q = corpus
    queries = ["zzz qqq xxx" for _ in range(B)]
    groups = bm25.encode_queries_bucketed(queries)
    res = hybrid_sparse_topk(q, docs, bm25.postings, groups, K, 0.7, 0.3,
                             block_n=1024)
    ovals, oidx = _oracle(bm25, docs, queries, q, 0.7, 0.3,
                          jnp.zeros((N,), jnp.float32), K)
    _assert_match(res, ovals, oidx)


def test_certificate_fails_safely_on_tiny_budget(corpus):
    """With a starved lexical budget the kernel must either stay exact or
    say it is not — never silently wrong."""
    bm25, docs, queries, q = corpus
    groups = bm25.encode_queries_bucketed(queries)
    res = hybrid_sparse_topk(q, docs, bm25.postings, groups, K, 0.1, 0.9,
                             m_tiles=1, c_lex=8, k_dense=K, block_n=1024)
    ovals, oidx = _oracle(bm25, docs, queries, q, 0.1, 0.9,
                          jnp.zeros((N,), jnp.float32), K)
    ex = np.asarray(res.exact)
    rv, ov = np.asarray(res.values), np.asarray(ovals)
    for b in range(B):
        if ex[b]:
            np.testing.assert_allclose(rv[b], ov[b], rtol=1e-4, atol=1e-5)


@pytest.fixture(scope="module")
def small_engine(rng):
    from hybridsearch_tpu.models.encoder import HashingEncoder
    from hybridsearch_tpu.retrieval.searcher import Searcher

    texts = [" ".join(rng.choice(VOCAB, size=10)) for _ in range(1500)]
    s = Searcher(encoder=HashingEncoder(dim=64), use_query_memory=False)
    s.indexer.index_documents(texts)
    queries = [" ".join(rng.choice(VOCAB, size=3)) for _ in range(3)]
    return s, texts, queries


def test_searcher_sparse_path_parity(monkeypatch, small_engine):
    """search_batch through the sparse-correction path must return exactly
    what the full fused path returns (same corpus, same queries)."""
    from hybridsearch_tpu.retrieval import searcher as searcher_mod

    s, _texts, queries = small_engine
    full = s.search_batch(queries, top_k=5, log=False)
    monkeypatch.setattr(searcher_mod, "SPARSE_HYBRID_MIN_DOCS", 100)
    sparse = s.search_batch(queries, top_k=5, log=False)
    for a, b in zip(full, sparse):
        assert [i for _v, _c, i in a] == [i for _v, _c, i in b]
        np.testing.assert_allclose([v for v, _c, _i in a],
                                   [v for v, _c, _i in b],
                                   rtol=1e-4, atol=1e-5)


def test_searcher_sparse_path_with_delete(monkeypatch, small_engine):
    from hybridsearch_tpu.retrieval import searcher as searcher_mod

    s, _texts, queries = small_engine
    monkeypatch.setattr(searcher_mod, "SPARSE_HYBRID_MIN_DOCS", 100)
    before = s.search_batch(queries, top_k=5, log=False)
    victim = before[0][0][2]
    s.indexer.delete_documents([victim])  # fixture's last use: no restore
    after = s.search_batch(queries, top_k=5, log=False)
    assert all(i != victim for _v, _c, i in after[0])


def test_hybrid_bm25_pipeline_sparse_parity(monkeypatch, rng):
    import hybridsearch_tpu.pipelines as pl
    from hybridsearch_tpu.models.encoder import HashingEncoder

    texts = [" ".join(rng.choice(VOCAB, size=10)) for _ in range(1200)]
    p = pl.create_pipeline("hybrid_bm25", encoder=HashingEncoder(dim=64),
                           semantic_weight=0.6, bm25_weight=0.4)
    p.index(texts)
    q = " ".join(rng.choice(VOCAB, size=3))
    full = p.search(q, top_k=5)
    monkeypatch.setattr(pl, "HYBRID_BM25_SPARSE_MIN", 100)
    sparse = p.search(q, top_k=5)
    assert sparse.metadata.get("exact") is True
    assert [i for _v, _c, i in full.results] == [
        i for _v, _c, i in sparse.results
    ]
    np.testing.assert_allclose(
        [v for v, _c, _i in full.results],
        [v for v, _c, _i in sparse.results], rtol=1e-4, atol=1e-5,
    )


def test_values_sorted_and_ids_valid(corpus):
    bm25, docs, queries, q = corpus
    groups = bm25.encode_queries_bucketed(queries)
    res = hybrid_sparse_topk(q, docs, bm25.postings, groups, K, 0.7, 0.3,
                             block_n=1024)
    v = np.asarray(res.values)
    assert (np.diff(v, axis=1) <= 1e-7).all()
    i = np.asarray(res.indices)
    assert ((i >= -1) & (i < N)).all()
    # no duplicate ids within a row
    for b in range(B):
        row = i[b][i[b] >= 0]
        assert len(set(row.tolist())) == len(row)


# -- hot terms (df > LENGTH_BUCKETS[-1]) ----------------------------------------------


@pytest.fixture()
def hot_corpus(rng, monkeypatch):
    """Corpus where one stopword-grade term appears in most docs. The hot
    threshold is lowered so the test corpus stays small; exactness of the
    hot path (precomputed tile bounds + bisection) holds for any cutoff."""
    from hybridsearch_tpu.ops import bm25 as bm25_ops

    monkeypatch.setattr(bm25_ops, "HOT_DF_THRESHOLD", 64)
    toks = rng.choice(VOCAB, size=(N, 10))
    texts = [
        " ".join(row) + (" verycommon" if i % 3 else "")
        for i, row in enumerate(toks)
    ]
    bm25 = BM25().fit(texts)
    po = bm25._state.postings
    assert po.hot_tile_bounds is not None
    assert (po.hot_rows_of >= 0).sum() >= 1
    docs = l2_normalize(jnp.asarray(
        rng.standard_normal((N, D)).astype(np.float32)))
    queries = ["verycommon " + " ".join(rng.choice(VOCAB, size=2))
               for _ in range(B)]
    return bm25, texts, docs, queries


def test_hot_term_table_built(hot_corpus, rng):
    """Fit-time per-tile bound rows equal a direct scatter of the term's
    posting weights."""
    bm25, texts, docs, queries = hot_corpus
    po = bm25._state.postings
    hot_tids = np.flatnonzero(po.hot_rows_of >= 0)
    for tid in hot_tids:
        st = int(po.starts_host[tid])
        ln = int(po.lengths_host[tid])
        d = np.asarray(po.doc_ids)[st:st + ln]
        w = np.asarray(po.weights)[st:st + ln]
        want = np.bincount(d // 128, weights=w,
                           minlength=po.hot_tile_bounds.shape[1])
        row = np.asarray(po.hot_tile_bounds)[int(po.hot_rows_of[tid])]
        np.testing.assert_allclose(row, want[: len(row)], rtol=1e-5)


def test_cand_scores_bisect_matches_gather(hot_corpus, rng):
    from hybridsearch_tpu.ops import bm25 as bm25_ops

    bm25, texts, docs, queries = hot_corpus
    po = bm25._state.postings
    state = bm25._state
    term_lists = [state.vocab.encode(q.split()) for q in queries]
    hot = bm25_ops.encode_hot_terms(po, term_lists)
    assert hot is not None
    rows, starts, lens = hot
    cands = jnp.asarray(rng.integers(0, N, size=(B, 32)).astype(np.int32))
    got = np.asarray(bm25_ops.cand_scores_bisect(
        po.doc_ids, po.weights, starts, lens, cands))
    # oracle: direct lookups in the CSR runs
    d_np = np.asarray(po.doc_ids)
    w_np = np.asarray(po.weights)
    want = np.zeros((B, 32), np.float32)
    for b in range(B):
        for j in range(starts.shape[1]):
            st, ln = int(starts[b, j]), int(lens[b, j])
            run = d_np[st:st + ln]
            for c in range(32):
                pos = np.searchsorted(run, int(cands[b, c]))
                if pos < ln and run[pos] == int(cands[b, c]):
                    want[b, c] += w_np[st + pos]
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_hot_path_matches_full_fusion(hot_corpus):
    """End to end: hybrid_sparse_topk with hot terms diverted through the
    tile-bound table + bisection must match the full-fusion oracle."""
    bm25, texts, docs, queries = hot_corpus
    q = l2_normalize(jnp.asarray(
        np.random.default_rng(5).standard_normal((B, D)).astype(np.float32)))
    groups, hot = bm25.encode_queries_sparse(queries)
    assert hot is not None
    po = bm25._state.postings
    bias = jnp.zeros((N,), jnp.float32)
    # a stopword-grade term inflates every tile's bound, so certification
    # needs all tiles as candidates here (the searcher ladder escalates to
    # the same place on real corpora)
    res = hybrid_sparse_topk(q, docs, po, groups, K, 0.7, 0.3, bias=bias,
                             k_dense=64, m_tiles=32, c_lex=512,
                             n_alive=N, hot=hot)
    ovals, oidx = _oracle(bm25, docs, queries, q, 0.7, 0.3, bias, K)
    _assert_match(res, ovals, oidx)


def test_searcher_uses_hot_path(hot_corpus, monkeypatch):
    """Searcher._sparse_hybrid flows through encode_queries_sparse and
    matches the small-corpus fused path on the same corpus."""
    from hybridsearch_tpu.models.encoder import HashingEncoder
    from hybridsearch_tpu.retrieval.searcher import Searcher

    bm25, texts, docs, queries = hot_corpus
    monkeypatch.setenv("HST_SPARSE_HYBRID_MIN_DOCS", "1")
    import hybridsearch_tpu.retrieval.searcher as searcher_mod

    monkeypatch.setattr(searcher_mod, "SPARSE_HYBRID_MIN_DOCS", 1)
    enc = HashingEncoder(dim=64)
    sparse = Searcher(encoder=enc)
    sparse.indexer.index_documents(texts)
    # force the hot threshold onto the searcher's own BM25 fit
    from hybridsearch_tpu.ops import bm25 as bm25_ops

    assert bm25_ops.HOT_DF_THRESHOLD == 64  # monkeypatched by the fixture
    sparse.indexer.bm25.fit(texts)
    po = sparse.indexer.bm25._state.postings
    assert po.hot_tile_bounds is not None
    res = sparse.search("verycommon " + texts[7][:30], top_k=5, log=False)
    assert len(res) == 5
