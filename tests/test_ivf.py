"""IVF approximate index: recall vs the exact oracle, chunk splitting."""

import numpy as np
import pytest

from hybridsearch_tpu.evaluation import oracle
from hybridsearch_tpu.index.ivf import IVFIndex, kmeans_fit


def clustered_data(rng, n_clusters=20, per=100, d=64):
    centers = rng.standard_normal((n_clusters, d)) * 3
    docs = np.concatenate(
        [c + 0.3 * rng.standard_normal((per, d)) for c in centers]
    ).astype(np.float32)
    return docs


def test_kmeans_produces_normalized_centroids(rng):
    import jax.numpy as jnp

    docs = clustered_data(rng)
    cents = np.asarray(kmeans_fit(jnp.asarray(docs), 16, iters=5))
    np.testing.assert_allclose(np.linalg.norm(cents, axis=1), 1.0, atol=1e-3)
    assert cents.shape == (16, 64)


def test_ivf_recall_on_clustered_data(rng):
    docs = clustered_data(rng, n_clusters=20, per=100)
    idx = IVFIndex(dim=64, n_clusters=32, nprobe=8).build(docs)
    qs = docs[rng.integers(0, len(docs), 16)] + \
        0.05 * rng.standard_normal((16, 64)).astype(np.float32)
    _, got = idx.search(qs, 10)
    _, want = oracle.dense_topk(qs, docs, 10)
    recalls = [
        len(set(got[b]) & set(want[b])) / 10 for b in range(len(qs))
    ]
    assert np.mean(recalls) > 0.9, recalls


def test_ivf_full_probe_is_exact(rng):
    docs = clustered_data(rng, n_clusters=5, per=40)
    idx = IVFIndex(dim=64, n_clusters=8).build(docs)
    qs = rng.standard_normal((4, 64)).astype(np.float32)
    _, got = idx.search(qs, 5, nprobe=10**9)  # probe everything
    _, want = oracle.dense_topk(qs, docs, 5)
    for b in range(4):
        assert set(got[b].tolist()) == set(want[b].tolist())


def test_ivf_chunk_capacity_split(rng):
    # all docs in one tight cluster -> must split into capacity chunks
    docs = (np.ones((200, 32)) + 0.01 * rng.standard_normal((200, 32))).astype(
        np.float32
    )
    idx = IVFIndex(dim=32, n_clusters=4, chunk_cap=32).build(docs)
    assert idx._centroids.shape[0] >= 200 // 32
    _, got = idx.search(docs[:2], 3, nprobe=idx._centroids.shape[0])
    assert (np.asarray(got) >= 0).all()


def test_ivf_mode_through_engine(rng, demo_docs):
    """config.index.ann='ivf' builds the coarse quantizer and the scatter
    search path uses it."""
    from hybridsearch_tpu.config import EngineConfig
    from hybridsearch_tpu.models.encoder import HashingEncoder
    from hybridsearch_tpu.retrieval.searcher import Searcher

    cfg = EngineConfig()
    cfg.index.ann = "ivf"
    cfg.index.ivf_clusters = 4
    cfg.index.ivf_nprobe = 4
    s = Searcher(encoder=HashingEncoder(dim=64), config=cfg,
                 semantic_mode="scatter", use_query_memory=False)
    s.indexer.index_documents(demo_docs)
    assert s.indexer.ivf is not None
    results = s.search("machine learning artificial intelligence", top_k=4,
                       log=False)
    assert {r[2] for r in results} & {1, 3, 6, 8, 10}


def test_ivf_sharded_matches_single_device(rng):
    """Mesh IVF: the collective program's results agree with the
    single-device index (same clustering seed, full probe = exact)."""
    from hybridsearch_tpu.parallel.mesh import build_mesh

    docs = clustered_data(rng, n_clusters=12, per=64)
    mesh = build_mesh()
    single = IVFIndex(dim=64, n_clusters=16, nprobe=6).build(docs)
    sharded = IVFIndex(dim=64, n_clusters=16, nprobe=6, mesh=mesh).build(docs)
    qs = docs[rng.integers(0, len(docs), 8)] + \
        0.05 * rng.standard_normal((8, 64)).astype(np.float32)
    # full probe on both -> both exact -> identical id sets
    _, got_s = sharded.search(qs, 10, nprobe=10**9)
    _, want = oracle.dense_topk(qs, docs, 10)
    for b in range(len(qs)):
        assert set(got_s[b].tolist()) == set(want[b].tolist())
    # default probe: sharded recall close to single-device recall
    _, g1 = single.search(qs, 10)
    _, g2 = sharded.search(qs, 10)
    r1 = np.mean([len(set(g1[b]) & set(want[b])) / 10 for b in range(len(qs))])
    r2 = np.mean([len(set(g2[b]) & set(want[b])) / 10 for b in range(len(qs))])
    assert r2 >= r1 - 0.15, (r1, r2)


def test_kmeans_blocked_matches_small_block(rng):
    """Blocked Lloyd iterations are block-size invariant."""
    import jax.numpy as jnp

    docs = clustered_data(rng, n_clusters=6, per=50)
    c1 = np.asarray(kmeans_fit(jnp.asarray(docs), 8, iters=4, block=64))
    c2 = np.asarray(kmeans_fit(jnp.asarray(docs), 8, iters=4, block=4096))
    np.testing.assert_allclose(c1, c2, rtol=1e-4, atol=1e-5)


def test_ann_auto_policy(monkeypatch):
    """ann="auto" builds IVF only above the crossover (exact wins below
    it — round-2 sweep); the threshold is env-tunable for re-measurement."""
    from hybridsearch_tpu.config import EngineConfig
    from hybridsearch_tpu.index.builder import Indexer
    from hybridsearch_tpu.models.encoder import HashingEncoder

    monkeypatch.setenv("HST_IVF_AUTO_MIN_DOCS", "50")
    cfg = EngineConfig()
    cfg.index.dim = 32
    cfg.index.ann = "auto"
    ix = Indexer(encoder=HashingEncoder(dim=32), config=cfg)
    ix.index_documents([f"doc number {i} about topic {i % 5}"
                        for i in range(30)])
    assert ix.ivf is None  # below crossover: exact only
    ix.index_documents([f"doc number {i} about topic {i % 5}"
                        for i in range(80)])
    assert ix.ivf is not None  # above crossover: IVF built


def test_unified_layout_shares_dense_buffer(rng):
    """layout='clustered' + ann='ivf': ONE k-means serves both — the IVF
    index must adopt the dense snapshot's device buffer (zero extra
    corpus copies), row ids must be doc ids (identity perm), and search
    at full probe depth must equal the exact oracle."""
    from hybridsearch_tpu.config import EngineConfig
    from hybridsearch_tpu.index.builder import Indexer
    from hybridsearch_tpu.models.encoder import HashingEncoder

    vocab = [f"w{i}" for i in range(60)]
    docs = [" ".join(rng.choice(vocab, size=8)) for _ in range(400)]
    cfg = EngineConfig()
    cfg.index.dim = 64
    cfg.index.layout = "clustered"
    cfg.index.ann = "ivf"
    cfg.index.ivf_clusters = 8
    cfg.index.ivf_nprobe = 8
    idx = Indexer(encoder=HashingEncoder(dim=64), config=cfg)
    idx.index_documents(docs)
    assert idx.ivf is not None and idx.ivf._built
    # the SAME device buffer, not a copy
    assert idx.ivf._docs_perm is idx.dense._snap.docs
    assert idx.dense.capacity >= idx.ivf.n_docs + idx.ivf._cap
    # full probe depth = exact: every (query, k) hit matches brute force
    q = idx.embed([" ".join(rng.choice(vocab, size=4)) for _ in range(8)])
    n_chunks = int(idx.ivf._chunk_starts.shape[0])
    vals, ids = idx.ivf.search(q, k=5, nprobe=n_chunks)
    import jax.numpy as jnp

    from hybridsearch_tpu.ops.dense import l2_normalize

    mat = np.asarray(idx.dense._snap.docs)[: idx.ivf.n_docs]
    qn = np.asarray(l2_normalize(jnp.asarray(q)))
    exact = np.argsort(-(qn @ mat.T), axis=1)[:, :5]
    for b in range(len(q)):
        assert set(ids[b].tolist()) == set(exact[b].tolist())


def test_from_layout_rejects_clamping_buffer(rng):
    """A shared buffer without the chunk-slice overhang must be refused
    (dynamic_slice clamping silently misaligns scores with row ids)."""
    import jax.numpy as jnp

    docs = rng.standard_normal((100, 16)).astype(np.float32)
    cent = rng.standard_normal((4, 16)).astype(np.float32)
    assign = np.sort(rng.integers(0, 4, 100))
    ivf = IVFIndex(dim=16, n_clusters=4, chunk_cap=64)
    with pytest.raises(ValueError, match="shared buffer too small"):
        ivf.from_layout(jnp.asarray(docs), 100, cent, assign)
