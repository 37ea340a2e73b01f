"""Mesh sharding + collective top-k merge on the virtual 8-device CPU mesh
(SURVEY §4d)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hybridsearch_tpu.evaluation import oracle
from hybridsearch_tpu.index.dense_index import DenseIndex
from hybridsearch_tpu.models.encoder import HashingEncoder
from hybridsearch_tpu.parallel.collectives import sharded_dense_topk
from hybridsearch_tpu.parallel.mesh import (
    build_mesh,
    doc_sharding,
    pad_to_shards,
    shard_count,
)
from hybridsearch_tpu.retrieval.searcher import Searcher


@pytest.fixture(scope="module")
def mesh():
    return build_mesh()


def test_mesh_shape(mesh):
    assert shard_count(mesh) == 8


def test_sharded_topk_matches_oracle(mesh, rng):
    N, D, B, k = 1000, 64, 3, 7
    docs = oracle.l2_normalize(rng.standard_normal((N, D))).astype(np.float32)
    qs = oracle.l2_normalize(rng.standard_normal((B, D))).astype(np.float32)
    Np = pad_to_shards(N, shard_count(mesh))
    docs_pad = np.zeros((Np, D), np.float32)
    docs_pad[:N] = docs
    docs_dev = jax.device_put(docs_pad, doc_sharding(mesh))
    v, i = sharded_dense_topk(mesh, jnp.asarray(qs), docs_dev, k, block_n=128,
                              valid_n=N)
    ov, oi = oracle.dense_topk(qs, docs, k, normalized=True)
    np.testing.assert_allclose(np.asarray(v), ov, rtol=1e-4, atol=1e-4)
    for b in range(B):
        assert set(np.asarray(i)[b].tolist()) == set(oi[b].tolist())


def test_sharded_topk_with_bias_mask(mesh, rng):
    """0/-inf bias (tombstone / metadata pre-filter) excludes docs inside the
    sharded kernel."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    N, D, k = 256, 32, 5
    docs = oracle.l2_normalize(rng.standard_normal((N, D))).astype(np.float32)
    q = docs[10:11]
    Np = pad_to_shards(N, 8)
    docs_pad = np.zeros((Np, D), np.float32)
    docs_pad[:N] = docs
    bias = np.zeros(Np, np.float32)
    bias[10] = -np.inf  # mask the exact-match doc
    docs_dev = jax.device_put(docs_pad, doc_sharding(mesh))
    bias_dev = jax.device_put(bias, NamedSharding(mesh, P("data")))
    _, i = sharded_dense_topk(mesh, jnp.asarray(q), docs_dev, k, block_n=64,
                              valid_n=N, bias_sharded=bias_dev)
    assert 10 not in np.asarray(i)[0].tolist()


def test_dense_index_on_mesh(mesh, rng):
    vecs = rng.standard_normal((300, 64)).astype(np.float32)
    idx = DenseIndex(dim=64, mesh=mesh, block_n=64, capacity_round=8).build(vecs)
    q = vecs[123:124]
    vals, ids = idx.search(q, 3)
    assert ids[0, 0] == 123
    # incremental add on the sharded index
    new = rng.standard_normal((5, 64)).astype(np.float32)
    new_ids = idx.add(new)
    _, ids2 = idx.search(new[2:3], 1)
    assert ids2[0, 0] == new_ids[2]


def test_searcher_on_mesh(mesh, demo_docs):
    enc = HashingEncoder(dim=128)
    s = Searcher(encoder=enc, mesh=mesh)
    s.indexer.index_documents(demo_docs)
    results = s.search("machine learning artificial intelligence", top_k=4)
    assert len(results) == 4
    assert {r[2] for r in results} & {1, 3, 6, 8, 10}


def test_sharded_bm25_matches_single(mesh, demo_docs):
    """Doc-partitioned BM25 over the mesh == unsharded scoring."""
    from hybridsearch_tpu.index.sparse_index import BM25

    single = BM25().fit(demo_docs)
    sharded = BM25(mesh=mesh).fit(demo_docs)
    assert sharded.sharded is not None and sharded.postings is None
    for q in ("machine learning data", "cooking pasta", "zzz nothing"):
        want = single.score_all(q)
        got = sharded.score_all(q)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5,
                                   err_msg=q)
        assert sharded.search(q, top_k=3) == single.search(q, top_k=3)


def test_sharded_hybrid_searcher_end_to_end(mesh, demo_docs):
    """Full hybrid search with BOTH indexes doc-sharded over the mesh."""
    from hybridsearch_tpu.models.encoder import HashingEncoder
    from hybridsearch_tpu.retrieval.searcher import Searcher

    enc = HashingEncoder(dim=128)
    plain = Searcher(encoder=enc)
    plain.indexer.index_documents(demo_docs)
    meshy = Searcher(encoder=enc, mesh=mesh)
    meshy.indexer.index_documents(demo_docs)
    q = "machine learning artificial intelligence"
    ids_mesh = [r[2] for r in meshy.search(q, top_k=4, log=False)]
    assert set(ids_mesh) & {1, 3, 6, 8, 10}
    # lexical arm parity between sharded and unsharded
    lex_plain = plain.indexer.bm25.score_all(q)
    lex_mesh = meshy.indexer.bm25.score_all(q)
    np.testing.assert_allclose(lex_mesh, lex_plain, rtol=1e-4, atol=1e-5)


def test_sharded_hybrid_exact_parity_with_single(mesh, demo_docs):
    """The one-program mesh hybrid (global pmin/pmax + shard-local fusion)
    must produce the same ranking and scores as the single-device fused
    path."""
    from hybridsearch_tpu.models.encoder import HashingEncoder
    from hybridsearch_tpu.retrieval.searcher import Searcher

    enc = HashingEncoder(dim=128)
    plain = Searcher(encoder=enc)
    plain.indexer.index_documents(demo_docs)
    meshy = Searcher(encoder=enc, mesh=mesh)
    meshy.indexer.index_documents(demo_docs)
    for q in ("machine learning artificial intelligence", "cooking pasta",
              "stock market quarter"):
        a = plain.search(q, top_k=6, log=False)
        b = meshy.search(q, top_k=6, log=False)
        assert [r[2] for r in a] == [r[2] for r in b], q
        np.testing.assert_allclose([r[0] for r in a], [r[0] for r in b],
                                   rtol=1e-4, atol=1e-5)


def test_sharded_hybrid_respects_tombstones(mesh, demo_docs):
    from hybridsearch_tpu.models.encoder import HashingEncoder
    from hybridsearch_tpu.retrieval.searcher import Searcher

    s = Searcher(encoder=HashingEncoder(dim=128), mesh=mesh)
    s.indexer.index_documents(demo_docs)
    q = "machine learning"
    top = s.search(q, top_k=1, log=False)[0][2]
    s.indexer.dense.delete([top])
    after = [r[2] for r in s.search(q, top_k=11, log=False)]
    assert top not in after
