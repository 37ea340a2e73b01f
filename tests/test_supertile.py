"""Supertile exact-resident hybrid (ops/supertile.py) — oracle parity,
certificate soundness, window/overflow handling, and the searcher route.

Reference semantics being matched: reference core.py:199-271 (min-max
normalize both full score arrays over alive docs, weighted fusion,
top-k). Wherever `exact` is True the result must equal full fusion, for
any layout, and exactness must never be claimed falsely."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hybridsearch_tpu.index.sparse_index import BM25
from hybridsearch_tpu.ops.dense import l2_normalize
from hybridsearch_tpu.ops.supertile import (
    SuperPostings,
    build_super_postings,
    encode_super_queries,
    hybrid_supertile_topk,
)
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


def _sp_from_bm25(bm25, super_tiles=4):
    return bm25.super_postings(super_tiles=super_tiles)


def test_supertile_full_coverage_matches_oracle(rng):
    """Probing every supertile must certify AND match full fusion."""
    n = 2048
    vocab, bm25, docs = _mk_corpus(rng, n, 120)
    queries = [" ".join(rng.choice(vocab, size=3)) for _ in range(4)]
    q = l2_normalize(jnp.asarray(
        rng.standard_normal((4, 32)).astype(np.float32)))
    sp, enc = bm25.encode_queries_super(queries)
    assert isinstance(sp, SuperPostings)
    sp = _sp_from_bm25(bm25)  # small supertiles so several exist
    enc = encode_super_queries(sp, [
        bm25.vocab.encode(qq.split()) for qq in queries])
    res = hybrid_supertile_topk(q, docs, sp, enc, 5, 0.7, 0.3,
                                s_probe=sp.n_super)
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


def test_supertile_tombstones_never_returned(rng):
    n = 1024
    vocab, bm25, docs = _mk_corpus(rng, n, 80)
    queries = [" ".join(rng.choice(vocab, size=3)) for _ in range(3)]
    q = l2_normalize(jnp.asarray(
        rng.standard_normal((3, 32)).astype(np.float32)))
    bias_np = np.zeros(n, np.float32)
    dead = rng.choice(n, size=200, replace=False)
    bias_np[dead] = -np.inf
    sp = _sp_from_bm25(bm25)
    enc = encode_super_queries(sp, [
        bm25.vocab.encode(qq.split()) for qq in queries])
    res = hybrid_supertile_topk(q, docs, sp, enc, 10, 0.7, 0.3,
                                bias=jnp.asarray(bias_np),
                                s_probe=sp.n_super,
                                n_alive=n - len(dead))
    idx = np.asarray(res.indices)
    assert not np.isin(idx[idx >= 0], dead).any()
    ovals, oidx = _oracle(bm25, docs, queries, q, 0.7, 0.3,
                          jnp.asarray(bias_np), 10)
    assert bool(res.exact.all())
    np.testing.assert_allclose(np.asarray(res.values), np.asarray(ovals),
                               rtol=1e-4, atol=1e-5)


def test_supertile_certificate_soundness_fuzz():
    """Wherever exact=True the result equals full fusion — randomized
    corpora, weights, probe budgets, supertile sizes, tombstones; the
    corpus is NOT clustered (soundness is layout-independent)."""
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
        st = int(rng.choice([2, 4, 8]))
        s_probe = int(rng.choice([1, 2, 4]))
        bias = None
        n_alive = n
        if rng.random() < 0.5:
            bias_np = np.zeros(n, np.float32)
            dead = rng.choice(n, size=n // 10, replace=False)
            bias_np[dead] = -np.inf
            bias = jnp.asarray(bias_np)
            n_alive = n - len(dead)
        sp = bm25.super_postings(super_tiles=st)
        bm25._super_cache = None  # per-trial supertile sizes
        enc = encode_super_queries(sp, [
            bm25.vocab.encode(qq.split()) for qq in queries])
        res = hybrid_supertile_topk(q, docs, sp, enc, 5, w_s, 1.0 - w_s,
                                    bias=bias, s_probe=s_probe,
                                    n_alive=n_alive)
        ovals, _ = _oracle(bm25, docs, queries, q, w_s, 1.0 - w_s, bias, 5)
        ex = np.asarray(res.exact)
        rv, ov = np.asarray(res.values), np.asarray(ovals)
        for b in range(nq):
            if ex[b]:
                np.testing.assert_allclose(
                    rv[b], ov[b], rtol=1e-4, atol=1e-4,
                    err_msg=f"trial {trial} q{b}: claimed exact, st={st} "
                            f"s_probe={s_probe} w_s={w_s}")


def test_supertile_max_norm_full_probe(rng):
    """norm='max' (the hybrid_bm25 pipeline's fusion) at full probing:
    certified and equal to the max-norm oracle."""
    n = 1024
    vocab, bm25, docs = _mk_corpus(rng, n, 100)
    queries = [" ".join(rng.choice(vocab, size=3)) for _ in range(3)]
    q = l2_normalize(jnp.asarray(
        rng.standard_normal((3, 32)).astype(np.float32)))
    sp = _sp_from_bm25(bm25)
    enc = encode_super_queries(sp, [
        bm25.vocab.encode(qq.split()) for qq in queries])
    res = hybrid_supertile_topk(q, docs, sp, enc, 5, 0.7, 0.3,
                                s_probe=sp.n_super, norm="max")
    sem = np.asarray(_semantic_full(q, docs))
    lex = np.asarray(bm25.batch_scores(queries))

    def mx(x):
        m = x.max(1, keepdims=True)
        return np.where(m > 1e-12, x / np.maximum(m, 1e-12), x)

    fused = 0.7 * mx(sem) + 0.3 * mx(lex)
    oidx = np.argsort(-fused, axis=1)[:, :5]
    ovals = np.take_along_axis(fused, oidx, axis=1)
    assert bool(np.asarray(res.exact).all())
    np.testing.assert_allclose(np.asarray(res.values), ovals, rtol=1e-4,
                               atol=1e-5)


def test_supertile_wcap_overflow_is_flagged(rng):
    """A window cap smaller than a term's widest supertile window must
    clear the certificate (never a wrong exact claim) and never crash."""
    n = 1024
    vocab = [f"t{i}" for i in range(200)]
    # 'hotterm' lives in ~300 contiguous docs: its window inside one
    # 512-doc supertile exceeds the forced 128 cap, while the corpus
    # still has term-free docs (the lexical-min-0 certificate can hold)
    texts = [("hotterm " if i < 300 else "")
             + " ".join(rng.choice(vocab, size=6)) for i in range(n)]
    bm25 = BM25().fit(texts)
    docs = l2_normalize(jnp.asarray(
        rng.standard_normal((n, 32)).astype(np.float32)))
    queries = ["hotterm " + " ".join(rng.choice(vocab, size=2))
               for _ in range(2)]
    q = l2_normalize(jnp.asarray(
        rng.standard_normal((2, 32)).astype(np.float32)))
    sp = _sp_from_bm25(bm25)
    assert sp.win_max_host.max() > 128  # tiny vocab -> wide windows
    term_lists = [bm25.vocab.encode(qq.split()) for qq in queries]
    enc = encode_super_queries(sp, term_lists, wcap=128)
    res = hybrid_supertile_topk(q, docs, sp, enc, 5, 0.7, 0.3,
                                s_probe=sp.n_super)
    assert not bool(np.asarray(res.exact).any())
    # the auto-picked cap covers the widest window and certifies
    enc2 = encode_super_queries(sp, term_lists)
    assert enc2.wcap >= int(sp.win_max_host[
        np.asarray([t for ts in term_lists for t in ts])].max())
    res2 = hybrid_supertile_topk(q, docs, sp, enc2, 5, 0.7, 0.3,
                                 s_probe=sp.n_super)
    assert bool(np.asarray(res2.exact).all())


def test_supertile_wide_wcap_chunked_placement(rng):
    """A window cap above the placement chunk width (2048) must still
    match full fusion — exercises the multi-chunk one-hot scan."""
    n = 2048
    vocab, bm25, docs = _mk_corpus(rng, n, 120)
    queries = [" ".join(rng.choice(vocab, size=3)) for _ in range(3)]
    q = l2_normalize(jnp.asarray(
        rng.standard_normal((3, 32)).astype(np.float32)))
    sp = _sp_from_bm25(bm25)
    enc = encode_super_queries(sp, [
        bm25.vocab.encode(qq.split()) for qq in queries], wcap=4096)
    res = hybrid_supertile_topk(q, docs, sp, enc, 5, 0.7, 0.3,
                                s_probe=sp.n_super)
    ovals, _ = _oracle(bm25, docs, queries, q, 0.7, 0.3, None, 5)
    assert bool(res.exact.all())
    np.testing.assert_allclose(np.asarray(res.values), np.asarray(ovals),
                               rtol=1e-4, atol=1e-5)


def test_supertile_build_matches_numpy_oracle(rng):
    """sup_max / win_max / CSR rows against a brute-force build."""
    V, n = 40, 700
    tl, dl, wl = [], [], []
    for t in range(V):
        df = int(rng.integers(1, 60))
        ds = np.sort(rng.choice(n, size=df, replace=False))
        tl.append(np.full(df, t))
        dl.append(ds)
        wl.append(rng.exponential(1.0, df).astype(np.float32))
    t_ids = np.concatenate(tl)
    d_ids = np.concatenate(dl)
    w = np.concatenate(wl)
    st = 2
    sp = build_super_postings(t_ids, d_ids, w, n, V, super_tiles=st)
    sd = st * 128
    n_super = sp.n_super
    ref = np.zeros((V, n_super), np.float32)
    wid = np.zeros(V, np.int64)
    for t in range(V):
        m = t_ids == t
        for s in range(n_super):
            sel = m & (d_ids // sd == s)
            if sel.any():
                ref[t, s] = w[sel].max()
                wid[t] = max(wid[t], sel.sum())
    np.testing.assert_allclose(np.asarray(sp.sup_max)[:V], ref, rtol=1e-6)
    np.testing.assert_array_equal(sp.win_max_host, wid)
    # boundary positions: first CSR position of term t with doc in
    # supertile >= s (== searchsorted over the term's doc-sorted run)
    pos = np.asarray(sp.sup_pos)
    for t in range(V):
        s0, l0 = int(sp.starts_host[t]), int(sp.df_host[t])
        run = d_ids[s0:s0 + l0]
        for s in range(n_super + 1):
            want = s0 + np.searchsorted(run, s * sd)
            assert pos[t, s] == want, (t, s)
    assert (pos[V] == 0).all()
    flat_ids = np.asarray(sp.ids_rows).reshape(-1)
    np.testing.assert_array_equal(flat_ids[: len(d_ids)], d_ids)
    assert (flat_ids[len(d_ids):] == n).all()


def test_pallas_place_fused_interpret_parity(rng):
    """The gather-fused placement kernel (interpret mode) must match the
    two-step path (_resident_windows staging + _place_windows) on a real
    build: same windows, same buffers, including empty/clamped windows
    and per-slot caps."""
    from hybridsearch_tpu.ops.pallas_supertile import pallas_place_fused
    from hybridsearch_tpu.ops.supertile import (
        _place_windows,
        _resident_windows,
        _window_bounds,
    )

    n, st = 2048, 4
    vocab, bm25, _docs = _mk_corpus(rng, n, 120)
    queries = [" ".join(rng.choice(vocab, size=4)) for _ in range(6)]
    sp, enc = bm25.encode_queries_super(queries)
    sd = sp.super_docs if sp.super_tiles == st else st * 128
    sp = _sp_from_bm25(bm25, super_tiles=st)
    enc = encode_super_queries(sp, [
        [t for t in ids if t < sp.sup_max.shape[0] - 1]
        for ids in ([bm25.vocab.get(w) for w in q.split()
                     if bm25.vocab.get(w) is not None] for q in queries)
    ])
    B = len(queries)
    S = min(3, sp.n_super)
    sup_s = jnp.sort(jnp.stack([
        jnp.asarray(rng.choice(sp.n_super + 1, size=S, replace=False),
                    jnp.int32)
        for _ in range(B)
    ]))  # may include one past-the-table id (empty windows)
    sd = sp.super_docs
    wcaps = tuple(min(w, sd) for w in enc.wcaps)
    l_cat, w_cat, ovf = _resident_windows(
        sp.sup_pos, sp.ids_rows, sp.ws_rows, enc.term_ids, sup_s, sd,
        wcaps)
    want = _place_windows(l_cat, w_cat, sp.super_tiles, use_pallas=False)

    lo, hi = _window_bounds(sp.sup_pos, enc.term_ids, sup_s)
    T = enc.term_ids.shape[1]
    got = pallas_place_fused(
        lo.transpose(0, 2, 1).reshape(B * S, T),
        hi.transpose(0, 2, 1).reshape(B * S, T),
        (sup_s * sd).astype(jnp.int32).reshape(B * S),
        sp.ids_rows, sp.ws_rows, wcaps=wcaps,
        super_tiles=sp.super_tiles, interpret=True,
    ).reshape(B, S, sp.super_tiles, 128)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_pallas_place_windows_interpret_parity(rng):
    """The Pallas placement kernel (interpret mode) must bit-match the
    jnp scatter oracle on random windows, including invalid ids."""
    from hybridsearch_tpu.ops.pallas_supertile import pallas_place_windows

    BS, TE, St, Tl = 8, 1024, 16, 128
    R = St * Tl
    l = rng.integers(-200, R + 300, (BS, TE)).astype(np.int32)
    w = rng.exponential(1.0, (BS, TE)).astype(np.float32)
    w[l < 0] = 0.0
    w[l >= R] = 0.0
    out = pallas_place_windows(jnp.asarray(l), jnp.asarray(w),
                               super_tiles=St, tile=Tl, ech=512,
                               interpret=True)
    ref = np.zeros((BS, R), np.float32)
    for b in range(BS):
        ok = (l[b] >= 0) & (l[b] < R)
        np.add.at(ref[b], l[b][ok], w[b][ok])
    np.testing.assert_allclose(np.asarray(out).reshape(BS, R), ref,
                               rtol=1e-5, atol=1e-5)
    # the transposed-LHS variant is the same exact contraction in the
    # MXU-native [M,K]x[K,N] layout — bit-identical values
    out_t = pallas_place_windows(jnp.asarray(l), jnp.asarray(w),
                                 super_tiles=St, tile=Tl, ech=512,
                                 interpret=True, tlhs=True)
    np.testing.assert_array_equal(np.asarray(out_t), np.asarray(out))
    # chunk skipping drops only all-zero-weight chunks — bit-identical;
    # zero a contiguous span so whole chunks actually skip
    w2 = w.copy()
    w2[:, 256:768] = 0.0
    ref2 = pallas_place_windows(jnp.asarray(l), jnp.asarray(w2),
                                super_tiles=St, tile=Tl, ech=512,
                                interpret=True)
    for tl in (False, True):
        out_s = pallas_place_windows(jnp.asarray(l), jnp.asarray(w2),
                                     super_tiles=St, tile=Tl, ech=512,
                                     interpret=True, tlhs=tl, skip=True)
        np.testing.assert_array_equal(np.asarray(out_s), np.asarray(ref2))


def test_pallas_super_scores_interpret_parity(rng):
    """The fused DMA+dot scores kernel (interpret mode) must match the
    plain einsum on every probed slot, including clamped out-of-range
    chunks (those slots are masked by gid >= N)."""
    from hybridsearch_tpu.ops.pallas_supertile import pallas_super_scores

    B, D, sd, S = 5, 128, 512, 2
    N = 4096  # 8 supertiles, N % ch == 0
    docs = jnp.asarray(rng.standard_normal((N, D)).astype(np.float32))
    q = jnp.asarray(rng.standard_normal((B, D)).astype(np.float32))
    sup = jnp.asarray(np.sort(rng.integers(0, N // sd, (B, S)), axis=1)
                      .astype(np.int32))
    out = pallas_super_scores(q, docs, sup, sd, ch=256, interpret=True)
    gidx = (np.asarray(sup)[:, :, None] * sd
            + np.arange(sd)[None, None, :]).reshape(B, S * sd)
    ref = np.take(np.asarray(docs), gidx.reshape(-1), axis=0).reshape(
        B, S * sd, D)
    ref = np.einsum("brd,bd->br", ref, np.asarray(q))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-4)


def test_dedup_pairs_invariants(rng):
    """dedup_pairs: sorted tids, rep = first of each equal-tid run
    clamped to the 8-group start, inv restores query-major order."""
    from hybridsearch_tpu.ops.pallas_supertile import dedup_pairs

    B, S, n_super = 16, 4, 6  # heavy duplication across the batch
    sup = jnp.asarray(np.sort(rng.integers(0, n_super, (B, S)), axis=1)
                      .astype(np.int32))
    tid, qid, rep, inv = dedup_pairs(sup)
    t, q_, r_, iv = (np.asarray(x) for x in (tid, qid, rep, inv))
    P = B * S
    assert (np.diff(t) >= 0).all()
    for p in range(P):
        g0 = (p // 8) * 8
        assert g0 <= r_[p] <= p
        assert t[r_[p]] == t[p]
        # rep is the FIRST same-tid pair at or after the group start
        assert r_[p] == g0 or t[r_[p] - 1] != t[p] or r_[p] - 1 < g0
    # inverse permutation restores (query, slot) order
    flat = np.asarray(sup).reshape(-1)
    assert (t[iv] == flat).all()
    assert (q_[iv] == np.arange(P) // S).all()


def test_pallas_super_scores_dedup_interpret_parity(rng):
    """The batch-deduped scores kernel (interpret mode) must match
    pallas_super_scores after unpermutation — including duplicated
    probes across queries and clamped out-of-range chunks."""
    from hybridsearch_tpu.ops.pallas_supertile import (
        dedup_pairs,
        pallas_super_scores,
        pallas_super_scores_dedup,
    )

    B, D, sd, S = 8, 128, 512, 2
    N = 2048  # 4 supertiles: forced duplication across 16 pairs
    docs = jnp.asarray(rng.standard_normal((N, D)).astype(np.float32))
    q = jnp.asarray(rng.standard_normal((B, D)).astype(np.float32))
    sup = jnp.asarray(np.sort(rng.integers(0, N // sd, (B, S)), axis=1)
                      .astype(np.int32))
    ref = np.asarray(
        pallas_super_scores(q, docs, sup, sd, ch=256, interpret=True))
    tid, qid, rep, inv = dedup_pairs(sup)
    out = pallas_super_scores_dedup(
        jnp.take(q, qid, axis=0), docs, tid, rep, sd, ch=256,
        interpret=True)
    got = np.asarray(jnp.take(out, inv, axis=0).reshape(B, S * sd))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_pallas_super_scores_dedup_mxu_interpret_parity(rng, monkeypatch):
    """HST_DEDUP_MXU=1: the uniform-group MXU dot must bit-match the
    per-pair VPU path for BOTH group kinds — a batch built so some
    8-pair groups are single-tid runs (MXU branch) and others are mixed
    (VPU fallback)."""
    from hybridsearch_tpu.ops.pallas_supertile import (
        dedup_pairs,
        pallas_super_scores_dedup,
    )

    B, D, sd, S = 16, 128, 512, 2
    N = 2048
    docs = jnp.asarray(rng.standard_normal((N, D)).astype(np.float32))
    q = jnp.asarray(rng.standard_normal((B, D)).astype(np.float32))
    # half the batch probes one hot supertile twice (long uniform runs),
    # the rest is random (mixed groups)
    sup_np = np.sort(rng.integers(0, N // sd, (B, S)), axis=1)
    sup_np[: B // 2] = 1
    sup = jnp.asarray(sup_np.astype(np.int32))
    tid, qid, rep, inv = dedup_pairs(sup)
    rep_np, P = np.asarray(rep), B * S
    uniform = [rep_np[g * 8 + 7] == g * 8 for g in range(P // 8)]
    assert any(uniform) and not all(uniform), "need both group kinds"
    qp = jnp.take(q, qid, axis=0)
    base = np.asarray(pallas_super_scores_dedup(
        qp, docs, tid, rep, sd, ch=256, interpret=True))
    monkeypatch.setenv("HST_DEDUP_MXU", "1")
    pallas_super_scores_dedup.clear_cache()
    got = np.asarray(pallas_super_scores_dedup(
        qp, docs, tid, rep, sd, ch=256, interpret=True))
    pallas_super_scores_dedup.clear_cache()  # drop the gated trace
    np.testing.assert_allclose(got, base, rtol=1e-5, atol=1e-5)


def test_searcher_supertile_uncertifiable_serves_best_effort(monkeypatch,
                                                             rng):
    """A query whose terms exceed every T rung (dropped terms: complete
    is False at any probe budget) must terminate the ladder and still
    serve reasonable results."""
    from hybridsearch_tpu.config import EngineConfig
    from hybridsearch_tpu.models.encoder import HashingEncoder
    from hybridsearch_tpu.retrieval import searcher as searcher_mod
    from hybridsearch_tpu.retrieval.searcher import Searcher

    vocab = [f"w{i}" for i in range(100)]
    texts = ["target alpha beta " + " ".join(rng.choice(vocab, size=6))
             for _ in range(400)]
    cfg = EngineConfig()
    cfg.index.layout = "clustered"
    s = Searcher(encoder=HashingEncoder(dim=64), use_query_memory=False,
                 config=cfg)
    s.indexer.index_documents(texts)
    monkeypatch.setattr(searcher_mod, "SPARSE_HYBRID_MIN_DOCS", 100)
    # 40 distinct terms > SUPER_T_LADDER[-1] == 32 -> some are dropped
    q = "target alpha " + " ".join(f"w{i}" for i in range(40))
    out = s.search(q, top_k=5, log=False)
    assert len(out) == 5
    assert all(0 <= i < 400 for _v, _c, i in out)


def test_searcher_supertile_delete_and_add(monkeypatch, rng):
    """Deletes (tombstones) and incremental adds must flow through the
    supertile route: deleted docs never return, added docs are findable,
    and the per-state super cache rebuilds."""
    from hybridsearch_tpu.config import EngineConfig
    from hybridsearch_tpu.models.encoder import HashingEncoder
    from hybridsearch_tpu.retrieval import searcher as searcher_mod
    from hybridsearch_tpu.retrieval.searcher import Searcher

    vocab = [f"w{i}" for i in range(100)]
    texts = ["needle alpha " + " ".join(rng.choice(vocab, size=6))
             if i % 37 == 0 else " ".join(rng.choice(vocab, size=8))
             for i in range(500)]
    cfg = EngineConfig()
    cfg.index.layout = "clustered"
    s = Searcher(encoder=HashingEncoder(dim=64), use_query_memory=False,
                 config=cfg)
    s.indexer.index_documents(texts)
    monkeypatch.setattr(searcher_mod, "SPARSE_HYBRID_MIN_DOCS", 100)
    top = s.search("needle alpha", top_k=3, log=False)
    assert top, "needle docs must surface"
    victim = top[0][2]
    s.indexer.delete_documents([victim])
    after = [r[2] for r in s.search("needle alpha", top_k=10, log=False)]
    assert victim not in after
    n0 = len(s.indexer.contents)
    s.indexer.add_documents(["zzuniqueterm fresh document about needles"])
    got = [r[2] for r in s.search("zzuniqueterm", top_k=3, log=False)]
    assert n0 in got, "the added doc must be retrievable"


def test_pallas_tile_stats_subchunk_parity(rng, monkeypatch):
    """The sub-chunked tile-stats kernel body (HST_TILE_STATS_SUB=1,
    interpret mode) must bit-match the single-dot body and the numpy
    oracle, including masked/dead rows."""
    from hybridsearch_tpu.ops.pallas_topk import pallas_tile_stats_t

    D, B, N = 128, 128, 4096
    docs = jnp.asarray(rng.standard_normal((N, D)).astype(np.float32))
    q_t = jnp.asarray(rng.standard_normal((D, B)).astype(np.float32))
    bias_np = np.zeros(N, np.float32)
    bias_np[rng.choice(N, size=300, replace=False)] = -np.inf
    bias = jnp.asarray(bias_np)
    n_valid = N - 100
    outs = {}
    for flag in ("0", "1"):
        monkeypatch.setenv("HST_TILE_STATS_SUB", flag)
        outs[flag] = pallas_tile_stats_t(
            q_t, docs, bias, n_valid=n_valid,
            block_n=2048 + (0 if flag == "0" else 0), with_min=True,
            interpret=True)
        # distinct trace per flag: interpret + env read at trace time
        pallas_tile_stats_t._clear_cache()
    for a, b in zip(outs["0"], outs["1"]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)
    s = np.asarray(jnp.dot(docs, q_t))
    s_max = np.where((np.arange(N) < n_valid)[:, None],
                     s + bias_np[:, None], -np.inf)
    ref_max = s_max.reshape(-1, 128, B).max(axis=1)
    got_max = np.asarray(outs["1"][0]).reshape(-1, B)
    np.testing.assert_allclose(got_max, ref_max, rtol=1e-4, atol=1e-4)


def test_searcher_supertile_path_parity(monkeypatch, rng):
    """search_batch through the clustered supertile path must return
    exactly what the full fused path returns (same corpus, queries)."""
    from hybridsearch_tpu.config import EngineConfig
    from hybridsearch_tpu.models.encoder import HashingEncoder
    from hybridsearch_tpu.retrieval import searcher as searcher_mod
    from hybridsearch_tpu.retrieval.searcher import Searcher

    vocab = [f"w{i}" for i in range(150)]
    topics = [" ".join(f"z{z}t{j}" for j in range(8)) for z in range(5)]
    texts = [f"{topics[i % 5]} " +
             " ".join(rng.choice(vocab, size=8)) for i in range(900)]
    queries = [f"z2t1 z2t3 {vocab[7]}", "z4t0 z4t5", "w3 w11 w42"]
    cfg = EngineConfig()
    cfg.index.layout = "clustered"
    s = Searcher(encoder=HashingEncoder(dim=64), use_query_memory=False,
                 config=cfg)
    s.indexer.index_documents(texts)
    full = s.search_batch(queries, top_k=5, log=False)
    monkeypatch.setattr(searcher_mod, "SPARSE_HYBRID_MIN_DOCS", 100)
    monkeypatch.setenv("HST_TILE_HYBRID", "0")  # force the supertile route
    sup = s.search_batch(queries, top_k=5, log=False)
    for a, b in zip(full, sup):
        assert [i for _v, _c, i in a] == [i for _v, _c, i in b]
        np.testing.assert_allclose([v for v, _c, _i in a],
                                   [v for v, _c, _i in b],
                                   rtol=1e-4, atol=1e-5)


def test_super_postings_save_load_roundtrip(tmp_path, rng):
    """Persisted supertile artifacts reload bit-identical (the driver
    bench loads these instead of rebuilding at 10M — VERDICT r3 #2)."""
    from hybridsearch_tpu.ops.supertile import (
        build_super_postings,
        load_super_postings,
        save_super_postings,
    )

    V, N, nnz = 500, 4096, 20000
    t = np.sort(rng.integers(0, V, nnz))
    d = rng.integers(0, N, nnz)
    order = np.lexsort((d, t))
    t, d = t[order], d[order]
    w = rng.random(nnz).astype(np.float32)
    sp = build_super_postings(t, d, w, N, V, super_tiles=8)
    path = str(tmp_path / "super")
    save_super_postings(sp, path)
    sp2 = load_super_postings(path)
    assert (sp2.n_docs, sp2.n_super, sp2.super_tiles) == (
        sp.n_docs, sp.n_super, sp.super_tiles)
    for name in ("sup_max", "sup_pos", "ids_rows", "ws_rows"):
        np.testing.assert_array_equal(np.asarray(getattr(sp, name)),
                                      np.asarray(getattr(sp2, name)))
    for name in ("starts_host", "df_host", "win_max_host"):
        np.testing.assert_array_equal(getattr(sp, name), getattr(sp2, name))


def test_return_probes_surface(rng):
    """return_probes exposes the probed supertile ids (quality-harness
    attribution); probes are sorted, in range, and consistent with the
    default return."""
    from hybridsearch_tpu.ops.supertile import (
        build_super_postings,
        encode_super_queries,
        hybrid_supertile_topk,
    )
    import jax.numpy as jnp

    V, N, nnz = 300, 8192, 30000
    t = np.sort(rng.integers(0, V, nnz))
    d = rng.integers(0, N, nnz)
    order = np.lexsort((d, t))
    t, d = t[order], d[order]
    w = rng.random(nnz).astype(np.float32)
    sp = build_super_postings(t, d, w, N, V, super_tiles=8)
    docs = rng.standard_normal((N, 128)).astype(np.float32)
    docs /= np.linalg.norm(docs, axis=1, keepdims=True)
    q = docs[:4] + 0.01
    enc = encode_super_queries(sp, [[1, 2], [3], [5, 7], [2]])
    res1 = hybrid_supertile_topk(jnp.asarray(q), jnp.asarray(docs), sp,
                                 enc, 5, 0.7, 0.3, s_probe=2)
    res2, probes = hybrid_supertile_topk(jnp.asarray(q), jnp.asarray(docs),
                                         sp, enc, 5, 0.7, 0.3, s_probe=2,
                                         return_probes=True)
    probes = np.asarray(probes)
    assert probes.shape == (4, 2)
    assert (probes >= 0).all() and (probes < sp.n_super).all()
    assert (np.diff(probes, axis=1) >= 0).all()  # sorted ascending
    np.testing.assert_array_equal(np.asarray(res1.indices),
                                  np.asarray(res2.indices))


def test_searcher_supertile_gated_levers_interpret_integration(monkeypatch,
                                                               rng):
    """The EXACT gated composition the hardware A/B flips on
    (HST_PLACE_FUSED + HST_SCORES_DEDUP, hw_session phase 12) runs
    end-to-end through the searcher with every Pallas kernel in
    interpret mode (HST_SUPER_INTERPRET=1) and matches the full fused
    path — integration coverage so a tunnel window never burns on a
    wiring bug."""
    from hybridsearch_tpu.config import EngineConfig
    from hybridsearch_tpu.models.encoder import HashingEncoder
    from hybridsearch_tpu.retrieval import searcher as searcher_mod
    from hybridsearch_tpu.retrieval.searcher import Searcher

    vocab = [f"w{i}" for i in range(300)]
    topics = [" ".join(f"z{z}t{j}" for j in range(6)) for z in range(12)]
    texts = [f"{topics[i % 12]} " +
             " ".join(rng.choice(vocab, size=6)) for i in range(17000)]
    # 8 queries: B*S divisible by 8 for the dedup grouping; topic
    # overlap forces duplicated probes across the batch
    queries = [f"z{z}t1 z{z}t3 {vocab[z]}" for z in (2, 2, 5, 5)] + \
              [f"z{z}t0 {vocab[10 + z]}" for z in (7, 7, 9, 11)]
    cfg = EngineConfig()
    cfg.index.layout = "clustered"
    cfg.index.dim = 128  # the Pallas gate needs Dm % 128 == 0
    s = Searcher(encoder=HashingEncoder(dim=128), use_query_memory=False,
                 config=cfg)
    s.indexer.index_documents(texts)
    # capacity (snap rows) is a 4096 multiple -> N % 1024 == 0 holds
    assert s.indexer.dense._snap.docs.shape[0] % 1024 == 0
    full = s.search_batch(queries, top_k=5, log=False)

    monkeypatch.setattr(searcher_mod, "SPARSE_HYBRID_MIN_DOCS", 100)
    monkeypatch.setenv("HST_TILE_HYBRID", "0")
    monkeypatch.setenv("HST_SUPER_INTERPRET", "1")
    monkeypatch.setenv("HST_PLACE_FUSED", "1")
    monkeypatch.setenv("HST_SCORES_DEDUP", "1")
    sup = s.search_batch(queries, top_k=5, log=False)
    for a, b in zip(full, sup):
        assert [i for _v, _c, i in a] == [i for _v, _c, i in b]
        np.testing.assert_allclose([v for v, _c, _i in a],
                                   [v for v, _c, _i in b],
                                   rtol=1e-4, atol=1e-5)


def test_ladder_compaction_parity(monkeypatch):
    """Compacted escalation (deeper rungs re-run only the uncertified
    tail, retrieval/searcher.py _LadderState) must serve results
    identical to full-batch escalation: certified rows keep exact rung-r
    output either way, and per-query kernels are batch-independent."""
    rng = np.random.default_rng(0)  # this seed's clustering leaves a
    # <=32-query uncertified tail mid-ladder (46 -> 39 -> 28 fails on
    # the 8-device conftest mesh), so the pow2 bucket undercuts the
    # batch and a compacted rung provably runs; s_probe=8 covers all 8
    # supertiles, closing every certificate on the final rung
    from hybridsearch_tpu.config import EngineConfig
    from hybridsearch_tpu.models.encoder import HashingEncoder
    from hybridsearch_tpu.retrieval import searcher as searcher_mod
    from hybridsearch_tpu.retrieval.searcher import Searcher

    vocab = [f"w{i}" for i in range(300)]
    topics = [" ".join(f"z{z}t{j}" for j in range(6)) for z in range(12)]
    texts = [f"{topics[i % 12]} " +
             " ".join(rng.choice(vocab, size=6)) for i in range(4000)]
    cfg = EngineConfig()
    cfg.index.layout = "clustered"
    s = Searcher(encoder=HashingEncoder(dim=64), use_query_memory=False,
                 config=cfg)
    s.indexer.index_documents(texts)
    monkeypatch.setattr(searcher_mod, "SPARSE_HYBRID_MIN_DOCS", 100)
    # shrink supertiles to 512 docs (8 supertiles over 4k docs) and start
    # the ladder at a single-supertile probe: topic straddle + rare-word
    # tails leave part of the batch uncertified, exercising escalation
    bm_cls = type(s.indexer.bm25)
    orig_sp = bm_cls.super_postings
    monkeypatch.setattr(
        bm_cls, "super_postings",
        lambda self, state=None, super_tiles=128: orig_sp(
            self, state=state, super_tiles=4))
    monkeypatch.setattr(searcher_mod, "_SUPER_LADDER", (1, 2, 4, 8))
    queries = ([f"z{z}t1 z{z}t3" for z in range(12)]
               + [f"z{z}t0 z{z}t2" for z in range(12)]
               + [f"z{z}t4 z{z}t5" for z in range(12)]
               + [f"z{z}t0 z{z}t1 z{z}t3" for z in range(8)]
               + [f"{vocab[i]} {vocab[i + 50]} {vocab[i + 100]}"
                  for i in range(6)])  # 50 queries, few hard tails

    monkeypatch.setattr(searcher_mod, "_MIN_ESCALATION_BUCKET", 2)
    seen_batches = []
    import hybridsearch_tpu.ops.supertile as sup_mod
    real_rung = sup_mod.hybrid_supertile_topk_rung

    def spy(q, *a, **kw):
        seen_batches.append(q.shape[0])
        return real_rung(q, *a, **kw)

    monkeypatch.setattr(sup_mod, "hybrid_supertile_topk_rung", spy)
    compacted = s.search_batch(queries, top_k=5, log=False)
    monkeypatch.setattr(sup_mod, "hybrid_supertile_topk_rung", real_rung)
    assert seen_batches and seen_batches[0] == len(queries)
    assert any(b < len(queries) for b in seen_batches[1:]), (
        f"no compacted rung ran: {seen_batches}")
    # disable compaction: buckets can never undercut the batch size
    monkeypatch.setattr(searcher_mod, "_MIN_ESCALATION_BUCKET", 1 << 30)
    full = s.search_batch(queries, top_k=5, log=False)

    for a, b in zip(compacted, full):
        assert [i for _v, _c, i in a] == [i for _v, _c, i in b]
        np.testing.assert_allclose([v for v, _c, _i in a],
                                   [v for v, _c, _i in b],
                                   rtol=1e-5, atol=1e-6)


def test_subset_batch_rows_and_ladder_state(monkeypatch):
    """_subset_batch_rows gathers per-query fields only; _LadderState
    merges compacted rung results into full-batch coordinates."""
    from hybridsearch_tpu.ops.supertile import SuperQueryEnc
    from hybridsearch_tpu.retrieval import searcher as searcher_mod
    from hybridsearch_tpu.retrieval.searcher import (
        _LadderState,
        _pow2_bucket,
        _subset_batch_rows,
    )

    assert _pow2_bucket(1) == 32 and _pow2_bucket(33) == 64
    monkeypatch.setattr(searcher_mod, "_MIN_ESCALATION_BUCKET", 2)
    B, T = 6, 3
    enc = SuperQueryEnc(
        term_ids=jnp.arange(B * T, dtype=jnp.int32).reshape(B, T),
        starts=jnp.zeros((B, T), jnp.int32),
        lens=jnp.ones((B, T), jnp.int32),
        complete=np.array([True] * B),
        full_touched=np.arange(B, dtype=np.int64),
        wcaps=(8, 8, 8),
        t_pad=T,
    )
    fp = np.array([4, 1, 1, 1])  # row 4 + row-1 padding
    sub = _subset_batch_rows(enc, fp, B)
    assert sub.term_ids.shape == (4, T)
    assert int(sub.term_ids[0, 0]) == 4 * T
    assert sub.full_touched.tolist() == [4, 1, 1, 1]
    assert sub.wcaps == (8, 8, 8) and sub.t_pad == T

    st = _LadderState(4)
    st.merge(np.eye(4, 2), np.ones((4, 2), np.int32),
             np.array([True, False, True, False]))
    fi = st.next_rows()
    assert fi.tolist() == [1, 3]
    pad = st.padded(fi)
    assert len(pad) == 2 and pad.tolist() == [1, 3]
    st.merge(np.full((2, 2), 9.0), np.full((2, 2), 7, np.int32),
             np.ones(2, bool))
    assert st.exact.all()
    assert st.values[1, 0] == 9.0 and st.values[0, 0] == 1.0
    assert st.indices[3, 1] == 7 and st.indices[2, 1] == 1


def test_prefix_rung_matches_direct(rng):
    """super_prefix + hybrid_supertile_topk_rung must equal
    hybrid_supertile_topk at every probe depth: rung r's probe set is
    the first r columns of the prefix's bound-ordered candidates."""
    from hybridsearch_tpu.ops.supertile import (
        encode_super_queries,
        hybrid_supertile_topk,
        hybrid_supertile_topk_rung,
        super_prefix,
    )

    vocab, bm25, docs = _mk_corpus(rng, 900, 60)
    queries = [" ".join(rng.choice(vocab, size=3)) for _ in range(6)]
    q = l2_normalize(jnp.asarray(
        rng.standard_normal((6, 32)).astype(np.float32)))
    sp = _sp_from_bm25(bm25, super_tiles=2)  # 256-doc supertiles
    enc = encode_super_queries(sp, [bm25.vocab.encode(qq.split())
                                    for qq in queries])
    pfx = super_prefix(q, docs, sp, enc, s_max=4)
    for s_probe in (1, 2, 4):
        direct = hybrid_supertile_topk(q, docs, sp, enc, 5, 0.7, 0.3,
                                       s_probe=s_probe)
        rung = hybrid_supertile_topk_rung(q, docs, sp, enc, pfx, 5,
                                          0.7, 0.3, s_probe=s_probe)
        np.testing.assert_array_equal(np.asarray(rung.indices),
                                      np.asarray(direct.indices))
        np.testing.assert_allclose(np.asarray(rung.values),
                                   np.asarray(direct.values),
                                   rtol=1e-6, atol=1e-7)
        np.testing.assert_array_equal(np.asarray(rung.exact),
                                      np.asarray(direct.exact))
