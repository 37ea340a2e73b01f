"""Dense retrieval kernel parity vs the NumPy oracle."""

import jax.numpy as jnp
import numpy as np
import pytest

from hybridsearch_tpu.evaluation import oracle
from hybridsearch_tpu.ops import dense


@pytest.mark.parametrize("n,d,b,k,block", [(100, 64, 3, 5, 32), (1000, 384, 4, 17, 256),
                                           (257, 128, 1, 10, 128)])
def test_scan_topk_matches_oracle(rng, n, d, b, k, block):
    docs = rng.standard_normal((n, d)).astype(np.float32)
    qs = rng.standard_normal((b, d)).astype(np.float32)
    docs_n = oracle.l2_normalize(docs).astype(np.float32)
    qs_n = oracle.l2_normalize(qs).astype(np.float32)

    ov, oi = oracle.dense_topk(qs_n, docs_n, k, normalized=True)
    kv, ki = dense.scan_dense_topk(jnp.asarray(qs_n), jnp.asarray(docs_n), k,
                                   block_n=block)
    np.testing.assert_allclose(np.asarray(kv), ov, rtol=0, atol=1e-2)
    # indices can differ on exact ties; verify score-equivalence per slot
    sv = np.take_along_axis(qs_n @ docs_n.T, np.asarray(ki), axis=1)
    np.testing.assert_allclose(sv, ov, rtol=0, atol=1e-2)


def test_topk_k_larger_than_n(rng):
    docs = rng.standard_normal((5, 32)).astype(np.float32)
    qs = rng.standard_normal((2, 32)).astype(np.float32)
    kv, ki = dense.dense_topk(jnp.asarray(qs), jnp.asarray(docs), 10, normalized=False)
    assert kv.shape == (2, 5)


def test_cosine_scores_match(rng):
    docs = rng.standard_normal((50, 48)).astype(np.float32)
    qs = rng.standard_normal((2, 48)).astype(np.float32)
    got = np.asarray(dense.cosine_scores(jnp.asarray(qs), jnp.asarray(docs)))
    want = oracle.cosine_scores(qs, docs)
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-2)


def test_permutation_invariance(rng):
    """Scores are invariant under document permutation (property test)."""
    docs = rng.standard_normal((64, 32)).astype(np.float32)
    q = rng.standard_normal((1, 32)).astype(np.float32)
    perm = rng.permutation(64)
    v1, i1 = dense.dense_topk(jnp.asarray(q), jnp.asarray(docs), 8, normalized=False)
    v2, i2 = dense.dense_topk(jnp.asarray(q), jnp.asarray(docs[perm]), 8,
                              normalized=False)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), rtol=0, atol=1e-2)
    assert set(np.asarray(i1).ravel().tolist()) == set(
        perm[np.asarray(i2).ravel()].tolist()
    )


def test_scatter_topk_to_dense(rng):
    vals = jnp.asarray([[0.9, 0.5], [0.8, 0.1]], dtype=jnp.float32)
    idx = jnp.asarray([[3, 0], [1, -1]], dtype=jnp.int32)
    out = np.asarray(dense.scatter_topk_to_dense(vals, idx, 5))
    want = np.zeros((2, 5), dtype=np.float32)
    want[0, 3], want[0, 0] = 0.9, 0.5
    want[1, 1] = 0.8  # -1 slot dropped
    np.testing.assert_allclose(out, want)


def test_pairwise_cosine(rng):
    x = rng.standard_normal((10, 16)).astype(np.float32)
    got = np.asarray(dense.pairwise_cosine(jnp.asarray(x)))
    xn = oracle.l2_normalize(x)
    np.testing.assert_allclose(got, (xn @ xn.T).astype(np.float32), rtol=0,
                               atol=1e-2)
    np.testing.assert_allclose(np.diag(got), np.ones(10), rtol=0, atol=1e-2)


def test_tiled_topk_matches_oracle(rng):
    """Tile-max two-phase exact selection (incl. hierarchical supertile
    branch) vs oracle."""
    from hybridsearch_tpu.ops.dense import tiled_dense_topk

    for n, k, bn in [(1000, 7, 512), (5000, 10, 131072), (12345, 5, 4096),
                     (200_000, 10, 65536)]:
        docs = oracle.l2_normalize(rng.standard_normal((n, 32))).astype(np.float32)
        qs = oracle.l2_normalize(rng.standard_normal((3, 32))).astype(np.float32)
        v, i = tiled_dense_topk(jnp.asarray(qs), jnp.asarray(docs), k, block_n=bn)
        ov, oi = oracle.dense_topk(qs, docs, k, normalized=True)
        np.testing.assert_allclose(np.asarray(v), ov, rtol=0, atol=1e-2)
        for b in range(3):
            assert set(np.asarray(i)[b].tolist()) == set(oi[b].tolist()), (n, k, bn)


def test_tiled_topk_bias_mask(rng):
    from hybridsearch_tpu.ops.dense import tiled_dense_topk

    n = 512
    docs = oracle.l2_normalize(rng.standard_normal((n, 32))).astype(np.float32)
    q = docs[42:43]
    bias = np.zeros(n, np.float32)
    bias[42] = -np.inf
    _, i = tiled_dense_topk(jnp.asarray(q), jnp.asarray(docs), 5, block_n=256,
                            bias=jnp.asarray(bias))
    assert 42 not in np.asarray(i)[0].tolist()


def test_tiled_matrix_topk_matches_sort(rng):
    from hybridsearch_tpu.ops.dense import tiled_matrix_topk

    for n, k in [(1000, 7), (200_000, 10), (513, 5)]:
        s = rng.standard_normal((3, n)).astype(np.float32)
        v, i = tiled_matrix_topk(jnp.asarray(s), k)
        want_i = np.argsort(-s, axis=1, kind="stable")[:, :k]
        want_v = np.take_along_axis(s, want_i, axis=1)
        np.testing.assert_allclose(np.asarray(v), want_v, rtol=0, atol=1e-5)
        for b in range(3):
            assert set(np.asarray(i)[b].tolist()) == set(want_i[b].tolist())


def test_tiled_topk_int8_mode(rng):
    """int8-quantized docs: recall vs the fp32 exact oracle stays high, and
    selection is exact with respect to the quantized scores."""
    from hybridsearch_tpu.ops.dense import tiled_dense_topk

    n, d, k = 20000, 128, 10
    docs = oracle.l2_normalize(rng.standard_normal((n, d))).astype(np.float32)
    qs = oracle.l2_normalize(rng.standard_normal((4, d))).astype(np.float32)
    d8 = np.clip(np.round(docs * 127.0), -127, 127).astype(np.int8)
    v, i = tiled_dense_topk(jnp.asarray(qs), jnp.asarray(d8), k, block_n=4096)
    ov, oi = oracle.dense_topk(qs, docs, k, normalized=True)
    # quantized scores approximate cosine
    np.testing.assert_allclose(np.asarray(v), ov, rtol=0, atol=0.03)
    recalls = [len(set(np.asarray(i)[b]) & set(oi[b])) / k for b in range(4)]
    assert np.mean(recalls) >= 0.8, recalls
    # exact wrt quantized scoring: compare against a quantized oracle
    q8 = np.clip(np.round(qs * 127.0), -127, 127)
    sq = (q8 @ d8.astype(np.float64).T) / (127.0 * 127.0)
    want_i = np.argsort(-sq, axis=1, kind="stable")[:, :k]
    for b in range(4):
        got_set = set(np.asarray(i)[b].tolist())
        want_vals = sq[b][want_i[b]]
        got_vals = sq[b][np.asarray(i)[b]]
        np.testing.assert_allclose(np.sort(got_vals), np.sort(want_vals),
                                   atol=1e-6)


def test_tiled_topk_with_stats_exact_minmax(rng):
    """with_stats=True returns the EXACT per-query min/max of scores over
    ALIVE docs — the normalization statistics every hybrid certificate
    rests on — including with tombstone/filter bias."""
    from hybridsearch_tpu.ops.dense import tiled_dense_topk

    n, d, k = 8192, 64, 7
    docs = oracle.l2_normalize(rng.standard_normal((n, d))).astype(np.float32)
    qs = oracle.l2_normalize(rng.standard_normal((5, d))).astype(np.float32)
    bias_np = np.zeros(n, np.float32)
    dead = rng.choice(n, size=500, replace=False)
    bias_np[dead] = -np.inf
    vals, idxs, smin, smax = tiled_dense_topk(
        jnp.asarray(qs), jnp.asarray(docs), k, block_n=1024,
        bias=jnp.asarray(bias_np), with_stats=True,
    )
    scores = qs @ docs.T  # [5, n] fp32 oracle
    alive = bias_np >= 0
    np.testing.assert_allclose(np.asarray(smin), scores[:, alive].min(1),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(smax), scores[:, alive].max(1),
                               rtol=1e-5, atol=1e-5)
    # selection with stats matches selection without
    v2, i2 = tiled_dense_topk(jnp.asarray(qs), jnp.asarray(docs), k,
                              block_n=1024, bias=jnp.asarray(bias_np))
    np.testing.assert_allclose(np.asarray(vals), np.asarray(v2),
                               rtol=1e-6, atol=1e-6)
    assert not np.isin(np.asarray(idxs), dead).any()


def test_probe_tiles_budget_covered_flag(rng):
    """probe_tiles bounds pass-3's gather; where covered=True the result
    must equal the unbudgeted exact top-k, and a clustered layout (ids
    grouped) must cover with a small budget."""
    import jax.numpy as jnp

    from hybridsearch_tpu.ops.dense import l2_normalize, tiled_dense_topk

    n, d, b, k = 4096, 64, 4, 32
    # cluster-ordered layout: docs sorted by topic, queries near topics
    topics = rng.standard_normal((8, d)).astype(np.float32)
    assign = np.sort(rng.integers(0, 8, n))
    vecs = topics[assign] + 0.3 * rng.standard_normal((n, d)).astype(
        np.float32)
    docs = l2_normalize(jnp.asarray(vecs))
    q = l2_normalize(jnp.asarray(
        topics[:b] + 0.2 * rng.standard_normal((b, d)).astype(np.float32)))
    vals, idxs = tiled_dense_topk(q, docs, k, block_n=512)
    pv, pi, cov = tiled_dense_topk(q, docs, k, block_n=512, probe_tiles=8)
    cov = np.asarray(cov)
    assert cov.any(), "clustered layout should cover with 8 tiles"
    np.testing.assert_allclose(np.asarray(pv)[cov], np.asarray(vals)[cov],
                               rtol=1e-5, atol=1e-6)
    # scrambled layout: tiny budgets may not cover — flags must say so
    # honestly; where they claim coverage the values still match
    perm = rng.permutation(n)
    docs_s = docs[perm]
    vals_s, _ = tiled_dense_topk(q, docs_s, k, block_n=512)
    pv_s, _pi, cov_s = tiled_dense_topk(q, docs_s, k, block_n=512,
                                        probe_tiles=2)
    cov_s = np.asarray(cov_s)
    np.testing.assert_allclose(np.asarray(pv_s)[cov_s],
                               np.asarray(vals_s)[cov_s],
                               rtol=1e-5, atol=1e-6)


def test_probe_tiles_with_stats_and_hybrid_cert(rng):
    """kd_tiles in the hybrid: uncovered queries must never be claimed
    exact; covered+certified ones must match full fusion."""
    import jax.numpy as jnp

    from hybridsearch_tpu.index.sparse_index import BM25
    from hybridsearch_tpu.ops.dense import l2_normalize
    from hybridsearch_tpu.ops.hybrid import hybrid_impact_topk
    from hybridsearch_tpu.retrieval.searcher import (
        _fuse_and_topk,
        _semantic_full,
    )

    vocab = [f"w{i}" for i in range(500)]
    n, d, b, k = 2048, 64, 4, 10
    texts = [" ".join(rng.choice(vocab, size=10)) for _ in range(n)]
    bm25 = BM25().fit(texts)
    docs = l2_normalize(jnp.asarray(
        rng.standard_normal((n, d)).astype(np.float32)))
    queries = [" ".join(rng.choice(vocab, size=3)) for _ in range(b)]
    q = l2_normalize(jnp.asarray(
        rng.standard_normal((b, d)).astype(np.float32)))
    imp, enc = bm25.encode_queries_impact(queries, p_depth=256)
    res = hybrid_impact_topk(q, docs, imp, enc, k, 0.7, 0.3,
                             k_dense=512, c_per_term=64, p_depth=256,
                             block_n=1024, kd_tiles=15)
    sem = _semantic_full(q, docs)
    lex = jnp.asarray(bm25.batch_scores(queries))
    ovals, _ = _fuse_and_topk(sem, lex, jnp.float32(0.7), jnp.float32(0.3),
                              jnp.zeros((n,), jnp.float32), k)
    ex = np.asarray(res.exact)
    rv, ov = np.asarray(res.values), np.asarray(ovals)
    for bi in range(b):
        if ex[bi]:
            np.testing.assert_allclose(rv[bi], ov[bi], rtol=1e-4, atol=1e-5)
