"""Impact-pruned lexical arm (ops/impact.py) + hybrid_impact_topk vs the
full-fusion oracle.

The impact path is the at-scale serving hybrid (searcher._sparse_hybrid):
pruned candidate generation + one-hot-matmul rescore. Wherever its
exactness certificate reports True the result must equal full [B, N]
fusion bit-for-bit (up to f32 tolerance); where pruning genuinely loses
information the certificate must say so.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from hybridsearch_tpu.index.sparse_index import BM25
from hybridsearch_tpu.ops.dense import l2_normalize
from hybridsearch_tpu.ops.fusion import max_normalize
from hybridsearch_tpu.ops.hybrid import hybrid_impact_topk
from hybridsearch_tpu.ops.impact import (
    build_impact_postings,
    encode_impact_queries,
    impact_scores_np,
    onehot_rescore,
    slice_impact_runs,
)
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
    rv, ov = np.asarray(res.values), np.asarray(ovals)
    ri, oi = np.asarray(res.indices), np.asarray(oidx)
    for b in range(rv.shape[0]):
        mism = ri[b] != oi[b]
        if mism.any():  # disagreements must be exact-score ties
            np.testing.assert_allclose(rv[b][mism], ov[b][mism],
                                       rtol=1e-5, atol=1e-6)


# -- build + primitive ops -------------------------------------------------------------


def test_build_impact_ordering_and_slack(rng):
    V, nd = 50, 500
    t = rng.integers(0, V, size=4000)
    d = rng.integers(0, nd, size=4000)
    # dedup (term, doc) pairs the way BM25 COO guarantees
    uniq = {}
    for ti, di in zip(t, d):
        uniq[(int(ti), int(di))] = rng.random() + 0.01
    t = np.array([k[0] for k in uniq], np.int64)
    d = np.array([k[1] for k in uniq], np.int64)
    w = np.array(list(uniq.values()), np.float32)
    P = 16
    imp = build_impact_postings(t, d, w, nd, V, p_max=P)
    df = np.bincount(t, minlength=V)
    for tid in range(V):
        s0 = int(imp.starts_host[tid])
        ln = int(imp.lengths_host[tid])
        assert ln == min(df[tid], P)
        run_w = imp.weights_host[s0:s0 + ln]
        assert (np.diff(run_w) <= 1e-7).all(), "runs must be impact-ordered"
        mask = t == tid
        full_sorted = np.sort(w[mask])[::-1]
        np.testing.assert_allclose(run_w, full_sorted[:ln], rtol=1e-6)
        if df[tid] > P:
            assert imp.slack_host[tid] == pytest.approx(full_sorted[P - 1])
            # every dropped weight is bounded by the slack
            assert (full_sorted[P:] <= imp.slack_host[tid] + 1e-7).all()
        else:
            assert imp.slack_host[tid] == 0.0


def test_onehot_rescore_matches_oracle(rng):
    V, nd, P = 40, 300, 8
    t = np.repeat(np.arange(V), 20).astype(np.int64)
    d = np.concatenate([rng.choice(nd, 20, replace=False) for _ in range(V)])
    w = (rng.random(V * 20) + 0.01).astype(np.float32)
    imp = build_impact_postings(t, d.astype(np.int64), w, nd, V, p_max=P)
    term_lists = [rng.choice(V, 4, replace=False).tolist() for _ in range(3)]
    enc = encode_impact_queries(imp, term_lists)
    ids_r, ws_r = slice_impact_runs(imp.doc_ids, imp.weights, enc.starts,
                                    enc.lengths, p_depth=P, n_docs=nd)
    Bq = len(term_lists)
    ids_f = ids_r.reshape(Bq, -1)
    ws_f = ws_r.reshape(Bq, -1)
    cand = jnp.asarray(rng.integers(0, nd, size=(Bq, 64)).astype(np.int32))
    got = np.asarray(onehot_rescore(cand, ids_f, ws_f, bq=2))
    for b in range(Bq):
        dense = impact_scores_np(imp, term_lists[b])
        np.testing.assert_allclose(got[b], dense[np.asarray(cand[b])],
                                   rtol=1e-5, atol=1e-6)


def test_encode_flags(rng):
    V, nd = 10, 2000
    # term 0 is stopword-grade (df 1500 > p_max); others tiny
    t = np.concatenate([np.zeros(1500, np.int64),
                        np.repeat(np.arange(1, V), 5)])
    d = np.concatenate([np.arange(1500), rng.integers(0, nd, 5 * (V - 1))])
    w = (rng.random(len(t)) + 0.01).astype(np.float32)
    imp = build_impact_postings(t, d.astype(np.int64), w, nd, V, p_max=64)
    enc = encode_impact_queries(imp, [[0, 1], [1, 2]], p_depth=64)
    assert not enc.complete[0] and enc.complete[1]
    assert not enc.certifiable_deeper[0] and enc.certifiable_deeper[1]


# -- end-to-end vs full fusion ---------------------------------------------------------


def test_matches_full_fusion_minmax(corpus):
    bm25, docs, queries, q = corpus
    imp, enc = bm25.encode_queries_impact(queries, p_depth=256)
    bias = jnp.zeros((N,), jnp.float32)
    res = hybrid_impact_topk(q, docs, imp, enc, K, 0.7, 0.3, bias=bias,
                             k_dense=512, c_per_term=64, p_depth=256,
                             block_n=1024)
    ovals, oidx = _oracle(bm25, docs, queries, q, 0.7, 0.3, bias, K)
    _assert_match(res, ovals, oidx)


def test_matches_full_fusion_with_tombstones(corpus, rng):
    bm25, docs, queries, q = corpus
    imp, enc = bm25.encode_queries_impact(queries, p_depth=256)
    bias_np = np.zeros(N, np.float32)
    dead = rng.choice(N, size=200, replace=False)
    bias_np[dead] = -np.inf
    bias = jnp.asarray(bias_np)
    res = hybrid_impact_topk(q, docs, imp, enc, K, 0.6, 0.4, bias=bias,
                             k_dense=512, c_per_term=64, p_depth=256,
                             block_n=1024)
    ovals, oidx = _oracle(bm25, docs, queries, q, 0.6, 0.4, bias, K)
    _assert_match(res, ovals, oidx)
    assert not np.isin(np.asarray(res.indices), dead).any()


def test_max_norm_mode(corpus):
    bm25, docs, queries, q = corpus
    imp, enc = bm25.encode_queries_impact(queries, p_depth=256)
    res = hybrid_impact_topk(q, docs, imp, enc, K, 0.5, 0.5, norm="max",
                             k_dense=512, c_per_term=64, p_depth=256,
                             block_n=1024)
    sem = _semantic_full(q, docs)
    lex = jnp.asarray(bm25.batch_scores(queries))
    fused = max_normalize(sem) * 0.5 + max_normalize(lex) * 0.5
    import jax.lax as lax

    ovals, _ = lax.top_k(fused, K)
    assert bool(res.exact.all())
    np.testing.assert_allclose(np.asarray(res.values), np.asarray(ovals),
                               rtol=1e-4, atol=1e-5)


def test_semantic_only_queries(corpus):
    bm25, docs, _queries, q = corpus
    queries = ["zzz qqq xxx" for _ in range(B)]
    imp, enc = bm25.encode_queries_impact(queries, p_depth=256)
    res = hybrid_impact_topk(q, docs, imp, enc, K, 0.7, 0.3,
                             k_dense=512, c_per_term=64, p_depth=256,
                             block_n=1024)
    ovals, oidx = _oracle(bm25, docs, queries, q, 0.7, 0.3,
                          jnp.zeros((N,), jnp.float32), K)
    _assert_match(res, ovals, oidx)


def test_shallow_slice_never_claims_exact(corpus):
    """p_depth below the encoded run lengths drops posting tails from the
    rescore; the certificate must refuse to claim exactness."""
    bm25, docs, queries, q = corpus
    imp, enc = bm25.encode_queries_impact(queries, p_depth=256)
    if int(np.asarray(enc.lengths).max()) <= 1:
        pytest.skip("corpus has no runs deeper than 1")
    res = hybrid_impact_topk(q, docs, imp, enc, K, 0.7, 0.3,
                             k_dense=512, c_per_term=1, p_depth=1,
                             block_n=1024)
    ex = np.asarray(res.exact)
    deep = np.asarray(jnp.any(enc.lengths > 1, axis=1))
    assert not ex[deep].any()


def test_starved_budget_exact_or_flagged(corpus):
    """Tiny candidate budgets: every exact=True row must still match the
    oracle; exact=False rows may differ but must never be claimed."""
    bm25, docs, queries, q = corpus
    imp, enc = bm25.encode_queries_impact(queries, p_depth=256)
    res = hybrid_impact_topk(q, docs, imp, enc, K, 0.1, 0.9,
                             k_dense=K, c_per_term=8, p_depth=256,
                             block_n=1024)
    ovals, _ = _oracle(bm25, docs, queries, q, 0.1, 0.9,
                       jnp.zeros((N,), jnp.float32), K)
    ex = np.asarray(res.exact)
    rv, ov = np.asarray(res.values), np.asarray(ovals)
    for b in range(B):
        if ex[b]:
            np.testing.assert_allclose(rv[b], ov[b], rtol=1e-4, atol=1e-5)


def test_values_sorted_ids_valid_no_dups(corpus):
    bm25, docs, queries, q = corpus
    imp, enc = bm25.encode_queries_impact(queries, p_depth=256)
    res = hybrid_impact_topk(q, docs, imp, enc, K, 0.7, 0.3,
                             k_dense=512, c_per_term=64, p_depth=256,
                             block_n=1024)
    v = np.asarray(res.values)
    assert (np.diff(v, axis=1) <= 1e-7).all()
    i = np.asarray(res.indices)
    assert ((i >= -1) & (i < N)).all()
    for b in range(B):
        row = i[b][i[b] >= 0]
        assert len(set(row.tolist())) == len(row)


def test_margin_correction_matches_oracle(rng):
    """Hot-term margin correction: with full postings supplied, the
    top-k VALUES must equal full-fusion oracle values even though the
    impact tier truncates the stopword-grade run hard."""
    n, d, b, k = 2048, 64, 4, 10
    toks = rng.choice(VOCAB, size=(n, 10))
    # 'common' appears in every doc -> df = n >> p_max below
    texts = [" ".join(r) + " common" for r in toks]
    bm25 = BM25().fit(texts)
    docs = l2_normalize(jnp.asarray(
        rng.standard_normal((n, d)).astype(np.float32)))
    queries = ["common " + " ".join(rng.choice(VOCAB, size=3))
               for _ in range(b)]
    q = l2_normalize(jnp.asarray(
        rng.standard_normal((b, d)).astype(np.float32)))
    imp, enc = bm25.encode_queries_impact(queries, p_depth=256, p_max=256)
    assert enc.hot_starts is not None
    po = bm25._state.postings
    res = hybrid_impact_topk(q, docs, imp, enc, k, 0.5, 0.5, k_dense=512,
                             c_per_term=64, p_depth=256, block_n=1024,
                             full_postings=(po.doc_ids, po.weights))
    sem = _semantic_full(q, docs)
    lex = jnp.asarray(bm25.batch_scores(queries))
    ovals, _ = _fuse_and_topk(sem, lex, jnp.float32(0.5), jnp.float32(0.5),
                              jnp.zeros((n,), jnp.float32), k)
    np.testing.assert_allclose(np.asarray(res.values), np.asarray(ovals),
                               rtol=1e-4, atol=1e-4)
    # truncated-term queries are never CLAIMED exact (conservative cert)
    assert not np.asarray(res.exact).any()


def test_pruned_quality_jaccard():
    """Hard pruning on a corpus with correlated arms (the realistic case)
    must stay near-exact even where certificates fail: top-10 Jaccard vs
    full fusion >= 0.9."""
    rng = np.random.default_rng(1234)  # own seed: the shared session rng's
    # position depends on test order, and this is a statistical threshold
    n, d = 2048, 64
    topics = rng.standard_normal((8, d)).astype(np.float32)
    assign = rng.integers(0, 8, size=n)
    vecs = topics[assign] + 0.5 * rng.standard_normal((n, d)).astype(
        np.float32)
    docs = l2_normalize(jnp.asarray(vecs))
    # lexical signal correlates with topic: docs share topic vocabulary
    texts = [
        " ".join(rng.choice(
            [f"t{assign[i]}w{j}" for j in range(40)], size=10))
        for i in range(n)
    ]
    bm25 = BM25().fit(texts)
    queries = [f"t{z}w0 t{z}w1 t{z}w2" for z in range(4)]
    q = l2_normalize(jnp.asarray(
        topics[:4] + 0.3 * rng.standard_normal((4, d)).astype(np.float32)))
    imp, enc = bm25.encode_queries_impact(queries, p_depth=256, p_max=256)
    res = hybrid_impact_topk(q, docs, imp, enc, 10, 0.6, 0.4,
                             k_dense=128, c_per_term=32, p_depth=256,
                             block_n=1024)
    ovals, oidx = _oracle(bm25, docs, queries, q, 0.6, 0.4,
                          jnp.zeros((n,), jnp.float32), 10)
    oi = np.asarray(oidx)
    ri = np.asarray(res.indices)
    jac = []
    for b in range(4):
        a, g = set(oi[b].tolist()), set(x for x in ri[b].tolist() if x >= 0)
        jac.append(len(a & g) / len(a | g))
    assert np.mean(jac) >= 0.9, jac


# -- Pallas kernels (interpret mode on CPU; compiled on TPU) ---------------------------


def test_pallas_slice_runs_interpret(rng):
    from hybridsearch_tpu.ops.pallas_impact import pallas_slice_runs

    nnz, b, t, p = 5000, 4, 8, 64
    ids = jnp.asarray(rng.integers(0, 1000, nnz + p).astype(np.int32))
    ws = jnp.asarray(rng.random(nnz + p).astype(np.float32))
    starts = jnp.asarray(rng.integers(0, nnz, (b, t)).astype(np.int32))
    oi, ow = pallas_slice_runs(ids, ws, starts, p=p, align=1,
                               interpret=True)
    ids_np, ws_np = np.asarray(ids), np.asarray(ws)
    for g, s in enumerate(np.asarray(starts).reshape(-1)):
        np.testing.assert_array_equal(np.asarray(oi)[g], ids_np[s:s + p])
        np.testing.assert_allclose(np.asarray(ow)[g], ws_np[s:s + p])


def test_pallas_onehot_rescore_interpret(rng):
    from hybridsearch_tpu.ops.pallas_impact import pallas_onehot_rescore

    b, c, w = 8, 256, 2048
    cand = jnp.asarray(rng.integers(0, 500, (b, c)).astype(np.int32))
    idsf = jnp.asarray(rng.integers(0, 500, (b, w)).astype(np.int32))
    wsf = jnp.asarray(rng.random((b, w)).astype(np.float32))
    got = np.asarray(pallas_onehot_rescore(cand, idsf, wsf, w_blk=512,
                                           interpret=True))
    for bi in range(b):
        ids_b = np.asarray(idsf[bi])
        for ci in range(0, c, 37):  # sampled columns keep the oracle fast
            want = float(np.asarray(wsf[bi])[ids_b == int(cand[bi, ci])].sum())
            assert abs(got[bi, ci] - want) < 1e-5


def test_aligned_build_and_sliced_parity(rng):
    """align=1024 builds pad run starts to the boundary; scores and
    slack are unchanged vs the unaligned build."""
    V, nd = 30, 400
    t = np.repeat(np.arange(V), 30).astype(np.int64)
    d = np.concatenate([rng.choice(nd, 30, replace=False) for _ in range(V)])
    w = (rng.random(V * 30) + 0.01).astype(np.float32)
    plain = build_impact_postings(t, d, w, nd, V, p_max=16)
    aligned = build_impact_postings(t, d, w, nd, V, p_max=16, align=1024)
    assert (aligned.starts_host % 1024 == 0).all()
    np.testing.assert_array_equal(plain.lengths_host, aligned.lengths_host)
    np.testing.assert_allclose(plain.slack_host, aligned.slack_host)
    for tid in range(V):
        s_p, s_a = int(plain.starts_host[tid]), int(aligned.starts_host[tid])
        ln = int(plain.lengths_host[tid])
        np.testing.assert_array_equal(
            np.asarray(plain.doc_ids[s_p:s_p + ln]),
            np.asarray(aligned.doc_ids[s_a:s_a + ln]))
        np.testing.assert_allclose(
            np.asarray(plain.weights[s_p:s_p + ln]),
            np.asarray(aligned.weights[s_a:s_a + ln]))
        np.testing.assert_allclose(
            aligned.weights_host[s_a:s_a + ln],
            np.asarray(aligned.weights[s_a:s_a + ln]))


def test_searcher_uncertified_counter_increments(monkeypatch, rng):
    """When the exactness certificate cannot close after the ladder, the
    searcher serves best-effort and bumps the /metrics counter exactly as
    documented (VERDICT round-1 item 8)."""
    import warnings

    import hybridsearch_tpu.retrieval.searcher as searcher_mod
    from hybridsearch_tpu.models.encoder import HashingEncoder
    from hybridsearch_tpu.retrieval.searcher import Searcher
    from hybridsearch_tpu.utils.tracing import GLOBAL_COUNTERS

    texts = [" ".join(rng.choice(VOCAB, size=10)) for _ in range(1200)]
    s = Searcher(encoder=HashingEncoder(dim=64), use_query_memory=False)
    s.indexer.index_documents(texts)
    monkeypatch.setattr(searcher_mod, "SPARSE_HYBRID_MIN_DOCS", 100)
    # a starved ladder that cannot close coverage certificates on an
    # uncorrelated corpus (dense/lexical winners disjoint)
    monkeypatch.setattr(searcher_mod, "_IMPACT_LADDER", ((10, 1, 256),))
    before = GLOBAL_COUNTERS.get("hybrid_sparse_uncertified")
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        res = s.search_batch(
            [" ".join(rng.choice(VOCAB, size=3)) for _ in range(4)],
            top_k=5, log=False)
    after = GLOBAL_COUNTERS.get("hybrid_sparse_uncertified")
    assert after > before
    assert all(len(r) == 5 for r in res)  # best-effort results still served


def test_hot_cols_only_marked_when_bisected(rng):
    """A query touching more truncated terms than the bisect ladder cap
    must mark hot_cols ONLY for the terms actually bisected — the margin
    correction subtracts every marked column's pruned prefix, so a
    marked-but-unbisected term would corrupt scores below uncorrected."""
    from hybridsearch_tpu.ops.impact import _HOT_H_LADDER

    V, nd, P = 8, 600, 4
    # every term is stopword-grade at this p_max (df 80 > 4)
    t = np.repeat(np.arange(V), 80).astype(np.int64)
    d = np.concatenate([rng.choice(nd, 80, replace=False)
                        for _ in range(V)]).astype(np.int64)
    w = (rng.random(V * 80) + 0.01).astype(np.float32)
    imp = build_impact_postings(t, d, w, nd, V, p_max=P)
    df = np.bincount(t, minlength=V)
    starts_full = np.concatenate([[0], np.cumsum(df)])[:-1]
    enc = encode_impact_queries(imp, [list(range(V))], p_depth=P,
                                full_starts=starts_full,
                                full_lengths=df.astype(np.int64))
    cap = _HOT_H_LADDER[-1]
    n_marked = int(np.asarray(enc.hot_cols)[0].sum())
    n_bisected = int((np.asarray(enc.hot_lens)[0] > 0).sum())
    assert n_marked == n_bisected <= cap


def test_certificate_soundness_fuzz():
    """Property: wherever exact=True, the result equals full fusion — for
    randomized corpora, weights, budgets, prune depths, and tombstones.
    The certificate may be conservative (False on exact results) but must
    NEVER claim exactness falsely."""
    rng = np.random.default_rng(77)
    from hybridsearch_tpu.ops.impact import IMPACT_P_LADDER

    for trial in range(8):
        n = int(rng.choice([512, 1024, 2048]))
        d = 32
        n_vocab = int(rng.choice([50, 200, 800]))
        vocab = [f"t{i}" for i in range(n_vocab)]
        texts = [" ".join(rng.choice(vocab, size=int(rng.integers(4, 14))))
                 for _ in range(n)]
        bm25 = BM25().fit(texts)
        docs = l2_normalize(jnp.asarray(
            rng.standard_normal((n, d)).astype(np.float32)))
        nq = 3
        queries = [" ".join(rng.choice(vocab,
                                       size=int(rng.integers(1, 5))))
                   for _ in range(nq)]
        q = l2_normalize(jnp.asarray(
            rng.standard_normal((nq, d)).astype(np.float32)))
        w_s = float(rng.choice([0.3, 0.5, 0.7, 1.0]))
        w_l = 1.0 - w_s
        kd = int(rng.choice([8, 64, 512]))
        cp = int(rng.choice([4, 16, 64]))
        pd = int(rng.choice(IMPACT_P_LADDER[:2]))
        p_max = int(rng.choice([16, 256, 4096]))
        bias_np = np.zeros(n, np.float32)
        if rng.random() < 0.5:
            bias_np[rng.choice(n, size=n // 10, replace=False)] = -np.inf
        bias = jnp.asarray(bias_np)
        use_full = rng.random() < 0.5
        imp, enc = bm25.encode_queries_impact(queries, p_depth=pd,
                                              p_max=p_max)
        po = bm25._state.postings
        res = hybrid_impact_topk(
            q, docs, imp, enc, 5, w_s, w_l, bias=bias, k_dense=kd,
            c_per_term=cp, p_depth=pd, block_n=512,
            full_postings=(po.doc_ids, po.weights) if use_full else None,
        )
        ovals, _ = _oracle(bm25, docs, queries, q, w_s, w_l, bias, 5)
        ex = np.asarray(res.exact)
        rv, ov = np.asarray(res.values), np.asarray(ovals)
        for b in range(nq):
            if ex[b]:
                np.testing.assert_allclose(
                    rv[b], ov[b], rtol=1e-4, atol=1e-4,
                    err_msg=f"trial {trial} query {b}: claimed exact, "
                            f"kd={kd} cp={cp} pd={pd} p_max={p_max} "
                            f"w=({w_s},{w_l}) full={use_full}")


def test_row_gather_slice_parity_with_general_path(rng):
    """align=1024 builds take the row-gather fast path in
    slice_impact_runs; its output must equal the general dynamic-slice
    path bit-for-bit, for every ladder depth."""
    V, nd = 24, 800
    t = np.repeat(np.arange(V), 40).astype(np.int64)
    d = np.concatenate([rng.choice(nd, 40, replace=False)
                        for _ in range(V)]).astype(np.int64)
    w = (rng.random(V * 40) + 0.01).astype(np.float32)
    imp = build_impact_postings(t, d, w, nd, V, p_max=32, align=1024)
    assert imp.align == 1024
    enc = encode_impact_queries(
        imp, [rng.choice(V, 4, replace=False).tolist() for _ in range(4)])
    for p in (256, 1024):
        fast = slice_impact_runs(imp.doc_ids, imp.weights, enc.starts,
                                 enc.lengths, p_depth=p, n_docs=nd,
                                 align=imp.align)
        slow = slice_impact_runs(imp.doc_ids, imp.weights, enc.starts,
                                 enc.lengths, p_depth=p, n_docs=nd,
                                 align=1)
        np.testing.assert_array_equal(np.asarray(fast[0]),
                                      np.asarray(slow[0]))
        np.testing.assert_array_equal(np.asarray(fast[1]),
                                      np.asarray(slow[1]))


def test_margin_cushion_covers_requested_k(rng):
    """ADVICE r2 (medium): k > margin must still return k result columns
    — the cushion widens to the requested k instead of silently
    truncating to margin."""
    n, d, b = 2048, 64, 2
    toks = rng.choice(VOCAB, size=(n, 10))
    texts = [" ".join(r) + " common" for r in toks]  # hot term everywhere
    bm25 = BM25().fit(texts)
    docs = l2_normalize(jnp.asarray(
        rng.standard_normal((n, d)).astype(np.float32)))
    queries = ["common " + " ".join(rng.choice(VOCAB, size=3))
               for _ in range(b)]
    q = l2_normalize(jnp.asarray(
        rng.standard_normal((b, d)).astype(np.float32)))
    imp, enc = bm25.encode_queries_impact(queries, p_depth=256, p_max=256)
    assert enc.hot_starts is not None and enc.full_postings is not None
    k = 40
    res = hybrid_impact_topk(q, docs, imp, enc, k, 0.5, 0.5, k_dense=512,
                             c_per_term=64, p_depth=256, block_n=1024,
                             margin=16)  # margin < k
    assert res.values.shape[1] == k
    assert (np.asarray(res.indices) >= 0).all()
    sem = _semantic_full(q, docs)
    lex = jnp.asarray(bm25.batch_scores(queries))
    ovals, _ = _fuse_and_topk(sem, lex, jnp.float32(0.5), jnp.float32(0.5),
                              jnp.zeros((n,), jnp.float32), k)
    np.testing.assert_allclose(np.asarray(res.values), np.asarray(ovals),
                               rtol=1e-4, atol=1e-4)


def test_margin_certificate_closes_on_hot_term_queries():
    """The margin-path certificate: queries touching truncated
    (stopword-grade) terms CAN certify exactness when every truncated term
    is bisected and the bounds close — the `complete` gate alone never
    fires for them (VERDICT r2 item 3). Where it claims exact, the result
    must equal full fusion; and on this easy corpus (one hot term, ample
    budgets) it must actually close for most queries."""
    rng = np.random.default_rng(424)  # own seed: the close-fraction
    # threshold is statistical; the shared session rng's position depends
    # on test order
    n, d, b, k = 2048, 64, 6, 10
    toks = rng.choice(VOCAB, size=(n, 10))
    # hot term in 80% of docs: df >> p_max (truncated) while the true
    # lexical min stays 0 (some alive doc holds no query term), which the
    # min-max certificate requires
    texts = [" ".join(r) + (" common" if rng.random() < 0.8 else "")
             for r in toks]
    bm25 = BM25().fit(texts)
    docs = l2_normalize(jnp.asarray(
        rng.standard_normal((n, d)).astype(np.float32)))
    queries = ["common " + " ".join(rng.choice(VOCAB, size=3))
               for _ in range(b)]
    q = l2_normalize(jnp.asarray(
        rng.standard_normal((b, d)).astype(np.float32)))
    imp, enc = bm25.encode_queries_impact(queries, p_depth=256, p_max=256)
    assert not enc.complete.any()  # the old gate can never certify these
    assert enc.corrected_complete.all()
    assert (enc.full_touched < n).all()
    res = hybrid_impact_topk(q, docs, imp, enc, k, 0.5, 0.5, k_dense=1024,
                             c_per_term=64, p_depth=256, block_n=1024,
                             margin=256)
    ex = np.asarray(res.exact)
    ovals, oidx = _oracle(bm25, docs, queries, q, 0.5, 0.5,
                          jnp.zeros((n,), jnp.float32), k)
    rv, ov = np.asarray(res.values), np.asarray(ovals)
    for bi in range(b):
        if ex[bi]:
            np.testing.assert_allclose(rv[bi], ov[bi], rtol=1e-4, atol=1e-4)
    assert ex.mean() >= 0.5, (
        f"margin certificate closed on only {ex.mean():.0%} of easy "
        f"hot-term queries")


def test_margin_certificate_never_false_claims_uncorrected(rng):
    """Queries with MORE truncated terms than the bisect ladder cap are
    not fully corrected; the margin certificate must refuse them."""
    V, nd, P = 8, 600, 4
    t = np.repeat(np.arange(V), 80).astype(np.int64)
    d = np.concatenate([rng.choice(nd, 80, replace=False)
                        for _ in range(V)]).astype(np.int64)
    w = (rng.random(V * 80) + 0.01).astype(np.float32)
    imp = build_impact_postings(t, d, w, nd, V, p_max=P)
    df = np.bincount(t, minlength=V)
    starts_full = np.concatenate([[0], np.cumsum(df)])[:-1]
    enc = encode_impact_queries(imp, [list(range(V))], p_depth=P,
                                full_starts=starts_full,
                                full_lengths=df.astype(np.int64))
    assert not enc.corrected_complete[0]  # 8 truncated terms > cap of 4


def test_sortmerge_rescore_matches_onehot(rng):
    """The sort-merge rescore must equal the one-hot rescore exactly
    (same pruned sums, no prefix-cancellation error)."""
    from hybridsearch_tpu.ops.impact import sortmerge_rescore

    B, C, W, nd = 4, 96, 512, 3000
    cand = jnp.asarray(rng.integers(0, nd, (B, C)).astype(np.int32))
    # realistic posting rows: repeated ids within a row allowed
    ids = jnp.asarray(rng.integers(0, nd, (B, W)).astype(np.int32))
    ws = jnp.asarray((rng.random((B, W)) + 0.01).astype(np.float32))
    # plant exact matches so the test isn't vacuous
    cand = cand.at[:, :32].set(ids[:, :32])
    got = np.asarray(sortmerge_rescore(cand, ids, ws))
    want = np.asarray(onehot_rescore(cand, ids, ws, bq=2))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
    # sentinel candidates (>= n_docs, never in postings) must score 0
    sent = jnp.full((B, C), nd + 2, jnp.int32)
    np.testing.assert_array_equal(
        np.asarray(sortmerge_rescore(sent, ids, ws)), 0.0)


def test_sortmerge_rescore_chunked_matches_unchunked(rng, monkeypatch):
    """Chunking the posting axis must be exact (additivity over chunks),
    including a ragged last chunk and the multi-weight path."""
    from hybridsearch_tpu.ops.impact import (
        _sortmerge_core,
        sortmerge_rescore_multi,
    )

    B, C, W, nd = 3, 64, 1000, 2000  # W % chunk != 0 on purpose
    cand = jnp.asarray(rng.integers(0, nd, (B, C)).astype(np.int32))
    ids = jnp.asarray(rng.integers(0, nd, (B, W)).astype(np.int32))
    w1 = jnp.asarray((rng.random((B, W)) + 0.01).astype(np.float32))
    w2 = jnp.asarray((rng.random((B, W)) + 0.01).astype(np.float32))
    cand = cand.at[:, :16].set(ids[:, :16])
    want = _sortmerge_core(cand, ids, (w1, w2))
    monkeypatch.setenv("HST_SORTMERGE_CHUNK", "256")
    got = sortmerge_rescore_multi(cand, ids, (w1, w2))
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=1e-5, atol=1e-5)
