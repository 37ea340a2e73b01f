"""End-to-end slice: Indexer -> DenseIndex/BM25 -> Searcher hybrid query.

Golden-retrieval expectations mirror the reference demo (reference
main.py:25-38 sample docs; "machine learning and AI" should surface the
ML/AI documents)."""

import os

import numpy as np
import pytest

from hybridsearch_tpu.evaluation import oracle
from hybridsearch_tpu.index.builder import Indexer
from hybridsearch_tpu.index.dense_index import DenseIndex
from hybridsearch_tpu.index.sparse_index import BM25
from hybridsearch_tpu.models.encoder import HashingEncoder
from hybridsearch_tpu.retrieval.searcher import Searcher
from hybridsearch_tpu.text.extractor import extract_tokens


@pytest.fixture(scope="module")
def encoder():
    return HashingEncoder(dim=128)


@pytest.fixture()
def searcher(demo_docs, encoder):
    s = Searcher(encoder=encoder)
    s.indexer.index_documents(demo_docs)
    return s


# -- DenseIndex -----------------------------------------------------------------


def test_dense_index_build_search(rng):
    vecs = rng.standard_normal((100, 32)).astype(np.float32)
    idx = DenseIndex(dim=32, block_n=64).build(vecs)
    q = vecs[7:8] + 0.01 * rng.standard_normal((1, 32)).astype(np.float32)
    vals, ids = idx.search(q, 5)
    assert ids[0, 0] == 7


def test_dense_index_incremental_add(rng):
    vecs = rng.standard_normal((10, 32)).astype(np.float32)
    idx = DenseIndex(dim=32, block_n=64, capacity_round=8).build(vecs)
    new = rng.standard_normal((3, 32)).astype(np.float32)
    ids = idx.add(new)
    assert ids.tolist() == [10, 11, 12]
    vals, found = idx.search(new[1:2], 1)
    assert found[0, 0] == 11


def test_dense_index_delete_and_compact(rng):
    vecs = rng.standard_normal((20, 16)).astype(np.float32)
    idx = DenseIndex(dim=16, block_n=32).build(vecs)
    q = vecs[3:4]
    _, ids = idx.search(q, 1)
    assert ids[0, 0] == 3
    idx.delete([3])
    _, ids2 = idx.search(q, 1)
    assert ids2[0, 0] != 3
    mapping = idx.compact()
    assert mapping[3] == -1
    assert idx.n_docs == 19


def test_dense_index_save_load(tmp_path, rng):
    vecs = rng.standard_normal((50, 16)).astype(np.float32)
    idx = DenseIndex(dim=16, block_n=32).build(vecs)
    idx.save(str(tmp_path / "dense"))
    idx2 = DenseIndex.load(str(tmp_path / "dense"))
    assert idx2.n_docs == 50
    q = vecs[11:12]
    _, ids = idx2.search(q, 1)
    assert ids[0, 0] == 11


# -- BM25 index -------------------------------------------------------------------


def test_bm25_class_api_matches_oracle(demo_docs):
    bm = BM25().fit(demo_docs)
    orc = oracle.BM25Oracle().fit([extract_tokens(d) for d in demo_docs])
    q = "machine learning data"
    want = orc.score_all(extract_tokens(q))
    assert bm.score(q, 1) == pytest.approx(float(want[1]), rel=1e-4)
    got_batch = bm.score_batch(q, [0, 1, 2])
    np.testing.assert_allclose(got_batch, want[:3], rtol=1e-4, atol=1e-5)
    hits = bm.search(q, top_k=3)
    want_top = [int(i) for i in np.argsort(-want, kind="stable")[:3] if want[i] > 0]
    assert [h[0] for h in hits] == want_top


# -- Indexer -----------------------------------------------------------------------


def test_indexer_full_and_incremental(demo_docs, encoder, tmp_path):
    with Indexer(db_path=str(tmp_path / "docs.db"), encoder=encoder) as ix:
        stats = ix.index_documents(demo_docs[:10])
        assert stats["indexed"] == 10
        assert ix.dense.n_docs == 10
        assert ix.bm25.n_docs == 10
        ids = ix.add_documents(demo_docs[10:])
        assert ids == [10, 11]
        # both indexes stay consistent after add (reference flaw fixed)
        assert ix.dense.n_docs == 12
        assert ix.bm25.n_docs == 12
        assert ix.store.count_documents() == 12


def test_indexer_save_load_no_reembed(demo_docs, encoder, tmp_path):
    db = str(tmp_path / "docs.db")
    with Indexer(db_path=db, encoder=encoder) as ix:
        ix.index_documents(demo_docs)
        ix.save(str(tmp_path / "engine"))

    calls = {"n": 0}

    class CountingEncoder:
        dim = encoder.dim
        name = "counting"

        def encode(self, texts, batch_size: int = 64):
            calls["n"] += 1
            return encoder.encode(texts)

    ix2 = Indexer.load(str(tmp_path / "engine"), encoder=CountingEncoder(), db_path=db)
    assert ix2.dense.n_docs == len(demo_docs)
    assert len(ix2.contents) == len(demo_docs)
    assert calls["n"] == 0  # embeddings reloaded from shards, not recomputed


def test_indexer_export_import_json(demo_docs, encoder, tmp_path):
    with Indexer(encoder=encoder) as ix:
        ix.index_documents(demo_docs[:5])
        ix.export_json(str(tmp_path / "dump.json"))
    with Indexer(encoder=encoder) as ix2:
        n = ix2.import_json(str(tmp_path / "dump.json"))
        assert n == 5
        assert ix2.dense.n_docs == 5


# -- Searcher ------------------------------------------------------------------------


def test_search_returns_result_tuples(searcher):
    results = searcher.search("machine learning and AI", top_k=5)
    assert len(results) == 5
    score, content, doc_id = results[0]
    assert isinstance(score, float) and isinstance(content, str)
    assert 0 <= doc_id < 12


def test_search_golden_ml_query(searcher, demo_docs):
    """Reference demo expectation: ML/AI docs (ids 1, 3, 6, 8, 10) surface
    for 'machine learning and AI' (reference main.py:41-68 semantics)."""
    results = searcher.search("machine learning artificial intelligence", top_k=4)
    got_ids = {r[2] for r in results}
    assert got_ids & {1, 3, 6, 8, 10}, f"expected ML docs, got {got_ids}"


def test_search_weights_validation(searcher):
    with pytest.raises(ValueError):
        searcher.search("x", semantic_weight=0.9, lexical_weight=0.9)


def test_search_pure_lexical_matches_bm25(searcher, demo_docs):
    """semantic_weight=0 reduces to BM25 ranking."""
    q = "machine learning"
    res = searcher.search(q, top_k=3, semantic_weight=0.0, lexical_weight=1.0)
    bm_hits = searcher.indexer.bm25.search(q, top_k=3)
    assert [r[2] for r in res][: len(bm_hits)] == [h[0] for h in bm_hits]


def test_search_batch_matches_single(searcher):
    queries = ["machine learning", "cooking pasta"]
    batch = searcher.search_batch(queries, top_k=3, log=False)
    singles = [searcher.search(q, top_k=3, log=False) for q in queries]
    for b, s in zip(batch, singles):
        assert [r[2] for r in b] == [r[2] for r in s]


def test_query_logging_and_learned_weights(searcher):
    searcher.search("machine learning", top_k=3)
    stats = searcher.get_stats()
    assert stats["total_queries"] >= 1
    assert stats["total_documents"] == 12
    # below MIN_SAMPLES positive feedback -> no learned weights
    assert searcher.query_memory.get_optimal_weights() is None
    for i in range(10):
        searcher.search("machine learning", top_k=1, semantic_weight=0.6,
                        lexical_weight=0.4)
        searcher.log_feedback("machine learning", 1, 1)
    learned = searcher.query_memory.get_optimal_weights()
    assert learned is not None
    sw, lw = learned
    assert 0.0 <= sw <= 1.0 and 0.0 <= lw <= 1.0


def test_fuzzy_lexical_mode(demo_docs, encoder):
    s = Searcher(encoder=encoder, lexical_mode="fuzzy")
    s.indexer.index_documents(demo_docs)
    res = s.search("machine lerning", top_k=3)  # typo still matches fuzzily
    assert any(r[2] == 1 for r in res)


def test_fuzzy_mode_refuses_large_corpus(demo_docs, encoder, monkeypatch):
    """The O(B*N) host fuzzy loop is capped: flipping lexical_mode='fuzzy'
    on a big index must raise, not take minutes per query."""
    import pytest

    s = Searcher(encoder=encoder, lexical_mode="fuzzy")
    s.indexer.index_documents(demo_docs)
    monkeypatch.setattr(Searcher, "FUZZY_MAX_DOCS", len(demo_docs) - 1)
    with pytest.raises(ValueError, match="fuzzy"):
        s.search("machine learning", top_k=3)


def test_deleted_doc_never_surfaces(searcher):
    before = searcher.search("machine learning", top_k=12, log=False)
    target = before[0][2]
    searcher.indexer.dense.delete([target])
    after = searcher.search("machine learning", top_k=11, log=False)
    assert target not in [r[2] for r in after]


def test_delete_does_not_skew_normalization(demo_docs, encoder):
    """Search over a tombstoned index == search over the compacted index
    (alive-only min/max statistics)."""
    s1 = Searcher(encoder=encoder, use_query_memory=False)
    s1.indexer.index_documents(demo_docs)
    victim = s1.search("gardening flowers", top_k=1, log=False)[0][2]
    s1.indexer.dense.delete([victim])
    got = s1.search("machine learning", top_k=5, log=False)

    kept = [d for i, d in enumerate(demo_docs) if i != victim]
    s2 = Searcher(encoder=encoder, use_query_memory=False)
    s2.indexer.index_documents(kept)
    want = s2.search("machine learning", top_k=5, log=False)
    assert [r[1] for r in got] == [r[1] for r in want]
    # score parity holds exactly for the semantic arm (BM25 idf/avg_len
    # legitimately still include the tombstoned doc until refit)
    got_sem = s1.search("machine learning", top_k=5, log=False,
                        semantic_weight=1.0, lexical_weight=0.0)
    want_sem = s2.search("machine learning", top_k=5, log=False,
                         semantic_weight=1.0, lexical_weight=0.0)
    np.testing.assert_allclose([r[0] for r in got_sem],
                               [r[0] for r in want_sem], rtol=1e-4, atol=1e-5)


def test_padding_rows_never_displace_negative_scores(rng):
    """Capacity-padding zero vectors (score 0) must not occupy top-k slots
    ahead of true docs with negative scores."""
    d = 32
    base = rng.standard_normal(d).astype(np.float32)
    # 6 docs all anti-aligned with the query -> all negative scores
    docs = np.stack([-base + 0.01 * rng.standard_normal(d) for _ in range(6)])
    idx = DenseIndex(dim=d, block_n=64, capacity_round=64).build(
        docs.astype(np.float32)
    )
    assert idx.capacity > idx.n_docs  # padding rows exist
    vals, ids = idx.search(base[None, :], 6)
    assert (np.asarray(ids)[0] >= 0).all()
    assert set(np.asarray(ids)[0].tolist()) == set(range(6))
    assert (np.asarray(vals)[0] < 0).all()  # true (negative) scores, not 0s


def test_bm25_save_load_roundtrip(demo_docs, tmp_path):
    bm = BM25().fit(demo_docs)
    path = str(tmp_path / "bm25.npz")
    bm.save(path)
    bm2 = BM25().load(path)
    for q in ("machine learning data", "cooking pasta"):
        np.testing.assert_allclose(bm2.score_all(q), bm.score_all(q),
                                   rtol=1e-5, atol=1e-6)
    assert bm2.search("machine learning", 3) == bm.search("machine learning", 3)


def test_indexer_save_load_includes_bm25(demo_docs, encoder, tmp_path):
    db = str(tmp_path / "docs.db")
    with Indexer(db_path=db, encoder=encoder) as ix:
        ix.index_documents(demo_docs)
        want = ix.bm25.score_all("machine learning")
        ix.save(str(tmp_path / "engine"))
    ix2 = Indexer.load(str(tmp_path / "engine"), encoder=encoder, db_path=db)
    np.testing.assert_allclose(ix2.bm25.score_all("machine learning"), want,
                               rtol=1e-5, atol=1e-6)


def test_export_import_preserves_vectors(demo_docs, encoder, tmp_path):
    """Import restores the exported embeddings verbatim (no re-embed)."""
    with Indexer(encoder=encoder) as ix:
        ix.index_documents(demo_docs[:4])
        want = ix.dense.get_vectors([0, 1, 2, 3])
        ix.export_json(str(tmp_path / "d.json"))

    class BoomEncoder:
        dim = encoder.dim
        name = "boom"

        def encode(self, texts, batch_size=64):
            raise AssertionError("import must not re-embed")

    with Indexer(encoder=BoomEncoder()) as ix2:
        ix2.import_json(str(tmp_path / "d.json"))
        got = ix2.dense.get_vectors([0, 1, 2, 3])
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_clustered_layout_consistent_and_local(rng):
    """layout="clustered" permutes the corpus at build; search results
    (contents) must be identical to the source layout, ids stay consistent
    across store/dense/bm25, and same-topic docs become id-adjacent."""
    from hybridsearch_tpu.config import EngineConfig
    from hybridsearch_tpu.models.encoder import HashingEncoder
    from hybridsearch_tpu.retrieval.searcher import Searcher

    topics = [f"topic{z} " + " ".join(f"t{z}w{j}" for j in range(6))
              for z in range(6)]
    docs = [f"{topics[i % 6]} doc {i}" for i in range(600)]
    cfg = EngineConfig()
    cfg.index.layout = "clustered"
    s = Searcher(encoder=HashingEncoder(dim=64), use_query_memory=False,
                 config=cfg)
    s.indexer.index_documents(docs)
    cfg2 = EngineConfig()
    s2 = Searcher(encoder=HashingEncoder(dim=64), use_query_memory=False,
                  config=cfg2)
    s2.indexer.index_documents(docs)
    for q in ("topic2 t2w1 t2w3", "topic5 t5w0"):
        a = [c for _s, c, _i in s.search(q, top_k=5, log=False)]
        b = [c for _s, c, _i in s2.search(q, top_k=5, log=False)]
        assert a == b
    # locality: same-topic docs occupy contiguous id ranges (k-means on
    # the hashing embeddings separates these disjoint-vocab topics)
    topic_of = [int(c.split(" doc ")[0][5]) for c in s.indexer.contents]
    runs = 1 + sum(1 for i in range(1, len(topic_of))
                   if topic_of[i] != topic_of[i - 1])
    assert runs <= 60, f"clustered layout too fragmented: {runs} runs"
    # store order matches in-memory order
    _ids, contents = s.indexer.store.get_contents()
    assert contents == s.indexer.contents
