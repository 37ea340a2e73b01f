"""Sharded supertile hybrid (parallel/collectives.py
sharded_supertile_topk) — oracle parity where certified, soundness, and
tombstone handling on the 8-device virtual CPU mesh.

Reference semantics being matched: reference core.py:199-271 (min-max
normalize both arms over alive docs globally, weighted fusion, top-k)
with docs + postings doc-partitioned over the data axis."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from hybridsearch_tpu.ops.dense import l2_normalize
from hybridsearch_tpu.ops.supertile import (
    build_super_postings_sharded,
    encode_super_queries_sharded,
)
from hybridsearch_tpu.parallel.collectives import sharded_supertile_topk
from hybridsearch_tpu.parallel.mesh import build_mesh


@pytest.fixture(scope="module")
def mesh():
    return build_mesh()


def _mk(rng, n, V, D=32):
    tl, dl, wl = [], [], []
    for t in range(V):
        df = int(rng.integers(1, 120))
        ds = np.sort(rng.choice(n, size=df, replace=False))
        tl.append(np.full(df, t))
        dl.append(ds)
        wl.append(rng.exponential(1.0, df).astype(np.float32))
    order = None
    t_ids = np.concatenate(tl)
    d_ids = np.concatenate(dl)
    w = np.concatenate(wl)
    del order
    docs = l2_normalize(jnp.asarray(
        rng.standard_normal((n, D)).astype(np.float32)))
    return t_ids, d_ids, w, docs


def _oracle(t_ids, d_ids, w, docs, term_lists, q, w_s, w_l, k, V,
            bias=None):
    n = docs.shape[0]
    sem = np.asarray(jnp.dot(q, docs.T,
                             preferred_element_type=jnp.float32))
    df = np.bincount(t_ids, minlength=V)
    starts = np.concatenate([[0], np.cumsum(df)])
    lex = np.zeros((len(term_lists), n), np.float32)
    for b, terms in enumerate(term_lists):
        for t in terms:
            s0, l0 = starts[t], df[t]
            np.add.at(lex[b], d_ids[s0:s0 + l0], w[s0:s0 + l0])
    alive = np.ones(n, bool) if bias is None else np.asarray(bias) >= 0

    def mmn(x):
        mn = np.min(np.where(alive[None, :], x, np.inf), 1, keepdims=True)
        mx = np.max(np.where(alive[None, :], x, -np.inf), 1, keepdims=True)
        r = mx - mn
        return np.where(r > 1e-12, (x - mn) / np.maximum(r, 1e-12), 1.0)

    fused = w_s * mmn(sem) + w_l * mmn(lex)
    fused = np.where(alive[None, :], fused, -np.inf)
    oidx = np.argsort(-fused, axis=1)[:, :k]
    return np.take_along_axis(fused, oidx, axis=1), oidx


def _setup(mesh, rng, n=4096, V=80, st=2, bias_np=None):
    n_shards = mesh.shape["data"]
    per = -(-n // n_shards)
    per = -(-per // 128) * 128
    n_pad = per * n_shards
    t_ids, d_ids, w, docs = _mk(rng, n, V)
    ssp = build_super_postings_sharded(t_ids, d_ids, w, n, V,
                                       docs_per_shard=per,
                                       n_shards=n_shards, super_tiles=st)
    docs_pad = jnp.pad(docs, ((0, n_pad - n), (0, 0)))
    docs_dev = jax.device_put(docs_pad, NamedSharding(mesh, P("data",
                                                              None)))
    bias = None
    if bias_np is not None:
        bias_pad = np.full(n_pad, -np.inf, np.float32)
        bias_pad[:n] = bias_np
        bias = jax.device_put(jnp.asarray(bias_pad),
                              NamedSharding(mesh, P("data")))
    term_lists = [list(rng.choice(V, size=3, replace=False))
                  for _ in range(4)]
    enc = encode_super_queries_sharded(ssp, term_lists)
    q = l2_normalize(jnp.asarray(
        rng.standard_normal((4, 32)).astype(np.float32)))
    put = lambda a: jax.device_put(
        jnp.asarray(a), NamedSharding(mesh, P("data", None, None)))
    args = (q, docs_dev, put(ssp.sup_max), put(ssp.sup_pos),
            put(ssp.ids_rows), put(ssp.ws_rows), enc)
    return args, (t_ids, d_ids, w, docs, term_lists, q), n, st, bias


def test_sharded_supertile_full_probe_matches_oracle(mesh):
    rng = np.random.default_rng(7)
    args, oracle_in, n, st, _ = _setup(mesh, rng)
    ns_local = args[2].shape[-1]  # probe every local supertile
    vals, idxs, exact = sharded_supertile_topk(
        mesh, *args, k=5, semantic_weight=0.7, lexical_weight=0.3,
        s_probe=ns_local, valid_n=n, n_alive=n, super_tiles=st)
    t_ids, d_ids, w, docs, term_lists, q = oracle_in
    ovals, oidx = _oracle(t_ids, d_ids, w, docs, term_lists, q, 0.7, 0.3,
                          5, 80)
    assert bool(np.asarray(exact).all()), "full probing must certify"
    np.testing.assert_allclose(np.asarray(vals), ovals, rtol=1e-4,
                               atol=1e-5)
    rv, ov = np.asarray(vals), ovals
    ri, oi = np.asarray(idxs), oidx
    for b in range(rv.shape[0]):
        mism = ri[b] != oi[b]
        if mism.any():
            np.testing.assert_allclose(rv[b][mism], ov[b][mism],
                                       rtol=1e-5, atol=1e-6)


def test_sharded_supertile_partial_probe_soundness(mesh):
    """exact=True rows must equal full fusion even at s_probe=1."""
    rng = np.random.default_rng(21)
    args, oracle_in, n, st, _ = _setup(mesh, rng)
    vals, idxs, exact = sharded_supertile_topk(
        mesh, *args, k=5, semantic_weight=0.6, lexical_weight=0.4,
        s_probe=1, valid_n=n, n_alive=n, super_tiles=st)
    t_ids, d_ids, w, docs, term_lists, q = oracle_in
    ovals, _ = _oracle(t_ids, d_ids, w, docs, term_lists, q, 0.6, 0.4,
                       5, 80)
    ex = np.asarray(exact)
    for b in range(len(ex)):
        if ex[b]:
            np.testing.assert_allclose(np.asarray(vals)[b], ovals[b],
                                       rtol=1e-4, atol=1e-4)


def test_searcher_mesh_supertile_parity(mesh, monkeypatch):
    """search_batch through the mesh supertile route must return what
    the exact collective program returns (same corpus, queries)."""
    from hybridsearch_tpu.config import EngineConfig
    from hybridsearch_tpu.models.encoder import HashingEncoder
    from hybridsearch_tpu.retrieval import searcher as searcher_mod
    from hybridsearch_tpu.retrieval.searcher import Searcher

    rng = np.random.default_rng(5)
    vocab = [f"w{i}" for i in range(120)]
    topics = [" ".join(f"z{z}t{j}" for j in range(6)) for z in range(4)]
    texts = [f"{topics[i % 4]} " +
             " ".join(rng.choice(vocab, size=6)) for i in range(800)]
    queries = ["z2t1 z2t3 w7", "z0t0 z0t5", "w3 w11 w42"]
    cfg = EngineConfig()
    cfg.index.layout = "clustered"
    enc = HashingEncoder(dim=64)
    s = Searcher(encoder=enc, mesh=mesh, use_query_memory=False,
                 config=cfg)
    s.indexer.index_documents(texts)
    exact_path = s.search_batch(queries, top_k=5, log=False)
    monkeypatch.setattr(searcher_mod, "SPARSE_HYBRID_MIN_DOCS", 100)
    sup_path = s.search_batch(queries, top_k=5, log=False)
    for a, b in zip(exact_path, sup_path):
        assert [i for _v, _c, i in a] == [i for _v, _c, i in b]
        np.testing.assert_allclose([v for v, _c, _i in a],
                                   [v for v, _c, _i in b],
                                   rtol=1e-4, atol=1e-5)


def test_sharded_supertile_tombstones(mesh):
    rng = np.random.default_rng(3)
    n = 4096
    bias_np = np.zeros(n, np.float32)
    dead = rng.choice(n, size=400, replace=False)
    bias_np[dead] = -np.inf
    args, oracle_in, n, st, bias = _setup(mesh, rng, bias_np=bias_np)
    ns_local = args[2].shape[-1]
    vals, idxs, exact = sharded_supertile_topk(
        mesh, *args, k=8, semantic_weight=0.7, lexical_weight=0.3,
        s_probe=ns_local, valid_n=n, n_alive=n - len(dead),
        bias_sharded=bias, super_tiles=st)
    idx = np.asarray(idxs)
    assert not np.isin(idx[idx >= 0], dead).any()
    t_ids, d_ids, w, docs, term_lists, q = oracle_in
    ovals, _ = _oracle(t_ids, d_ids, w, docs, term_lists, q, 0.7, 0.3,
                       8, 80, bias=bias_np)
    assert bool(np.asarray(exact).all())
    np.testing.assert_allclose(np.asarray(vals), ovals, rtol=1e-4,
                               atol=1e-5)
