"""Regression tests for the round-1 advisor findings (ADVICE.md):

1. DenseIndex.search at capacity >= 65536 used tiled_dense_topk without
   importing it (NameError on every search past ~61k docs);
2. async index jobs and watcher reindexes must invalidate the semantic
   cache (stale cached /search responses after mutation);
3. index-job retries must not re-add already-committed batches;
4. MultiStagePipeline's single-query path must not -1-index into contents;
5. DELETE /documents/{id} must stop the doc surfacing via BM25 paths too.
"""

import threading
import time

import numpy as np
import pytest

from hybridsearch_tpu.api.app import EngineState, build_router
from hybridsearch_tpu.index.builder import Indexer
from hybridsearch_tpu.index.dense_index import DenseIndex
from hybridsearch_tpu.models.encoder import HashingEncoder
from hybridsearch_tpu.pipelines import create_pipeline


def test_dense_search_large_capacity_branch(rng):
    # repro from ADVICE: capacity_round=65536 puts even a 10-doc index on the
    # tiled_dense_topk branch; this raised NameError before the import fix
    vecs = rng.standard_normal((10, 32)).astype(np.float32)
    idx = DenseIndex(dim=32, capacity_round=65536).build(vecs)
    assert idx.capacity >= 65536
    vals, ids = idx.search(vecs[:2], k=3)
    assert ids.shape == (2, 3)
    assert ids[0, 0] == 0 and ids[1, 0] == 1  # self-match first
    # padding rows (capacity >> n) must never surface
    assert (ids < 10).all()


@pytest.fixture()
def api_state(demo_docs):
    st = EngineState(encoder=HashingEncoder(dim=128))
    router = build_router(st)
    code, _, _ = router.dispatch("POST", "/index", {"documents": demo_docs})
    assert code == 200
    yield st, router
    st.close()


def _cached(router, query="machine learning"):
    code, p, _ = router.dispatch("POST", "/search",
                                 {"query": query, "top_k": 3})
    assert code == 200
    return p["cached"]


def test_async_index_job_invalidates_semantic_cache(api_state):
    st, router = api_state
    assert _cached(router) is False
    assert _cached(router) is True  # primed
    code, p, _ = router.dispatch("POST", "/jobs/index",
                                 {"documents": ["brand new entry about ml"]})
    assert code == 202
    deadline = time.time() + 30
    while time.time() < deadline:
        _c, job, _ = router.dispatch("GET", f"/jobs/{p['job_id']}")
        if job["state"] in ("completed", "failed"):
            break
        time.sleep(0.05)
    assert job["state"] == "completed"
    assert _cached(router) is False  # cache was invalidated by the job


def test_index_job_retry_resumes_not_duplicates(demo_docs):
    st = EngineState(encoder=HashingEncoder(dim=128),
                     use_semantic_cache=False)
    try:
        router = build_router(st)
        router.dispatch("POST", "/index", {"documents": demo_docs[:4]})
        n0 = len(st.indexer.contents)
        docs = [f"retry doc {i}" for i in range(70)]  # 3 batches of 32
        payload = {"documents": docs}
        calls = {"n": 0}

        def progress_cb(pct):
            calls["n"] += 1
            if calls["n"] == 2:  # fail after the 2nd committed batch
                raise RuntimeError("transient failure")

        ev = threading.Event()
        with pytest.raises(RuntimeError):
            st._index_job(payload, progress_cb, ev)
        committed = payload["_committed"]
        assert committed == 64  # two batches committed before the failure
        # the retry re-runs the handler with the SAME payload dict
        result = st._index_job(payload, lambda pct: None, ev)
        assert result["added"] == len(docs)
        assert len(st.indexer.contents) == n0 + len(docs)  # no duplicates
        assert sorted(result["doc_ids"]) == list(range(n0, n0 + len(docs)))
    finally:
        st.close()


def test_multistage_guards_padding_and_tombstones(demo_docs):
    p = create_pipeline("multi_stage", encoder=HashingEncoder(dim=128),
                        stage1_k=100, stage2_k=20, final_k=5)
    p.index(demo_docs[:5])
    # tombstone two docs: stage-1 k1=min(100,5)=5 would otherwise pull
    # -inf/-1 hits into stage 2, where Python -1 indexing fabricates the
    # LAST doc with a BM25 score of 0
    p.indexer.delete_documents([3, 4])
    res = p.search("machine learning python", top_k=5)
    got = {i for _s, _c, i in res.results}
    assert got <= {0, 1, 2}
    assert len(res.results) > 0


def test_delete_consistent_across_bm25_paths(demo_docs):
    ix = Indexer(encoder=HashingEncoder(dim=128))
    ix.index_documents(demo_docs)
    # doc 1 is the top BM25 hit for this query before deletion
    hits = ix.bm25.search("machine learning models training", top_k=3)
    assert hits and hits[0][0] == 1
    ix.delete_documents([1])
    # bm25.search masks the tombstone
    hits = ix.bm25.search("machine learning models training", top_k=3)
    assert all(i != 1 for i, _s in hits)
    # host store listings exclude it; positional contents stay aligned
    listed = {d["doc_id"] for d in ix.store.get_all_documents()}
    assert 1 not in listed and 0 in listed
    # hybrid_bm25 pipeline path applies the tombstone bias too
    p = create_pipeline("hybrid_bm25", encoder=HashingEncoder(dim=128))
    p.index(demo_docs)
    p.indexer.delete_documents([1])
    res = p.search("machine learning models training", top_k=6)
    assert all(i != 1 for _s, _c, i in res.results)


def test_delete_via_api_and_reload(tmp_path, demo_docs):
    db = str(tmp_path / "docs.db")
    st = EngineState(db_path=db, encoder=HashingEncoder(dim=128),
                     use_semantic_cache=False)
    try:
        router = build_router(st)
        router.dispatch("POST", "/index", {"documents": demo_docs})
        code, p, _ = router.dispatch("DELETE", "/documents/1")
        assert code == 200
        code, p, _ = router.dispatch("GET", "/documents")
        assert all(d["doc_id"] != 1 for d in p["documents"])
        assert p["total"] == len(demo_docs) - 1
    finally:
        st.close()
    # tombstones survive a reload from the host store
    ix = Indexer(db_path=db, encoder=HashingEncoder(dim=128))
    ix.reload()
    hits = ix.bm25.search("machine learning models training", top_k=3)
    assert all(i != 1 for i, _s in hits)
    results = Searcher_search_excludes(ix)
    assert 1 not in results


def Searcher_search_excludes(ix):
    from hybridsearch_tpu.retrieval.searcher import Searcher

    s = Searcher(indexer=ix)
    res = s.search("machine learning models training", top_k=5)
    return {i for _s, _c, i in res}


def test_watcher_reindex_invalidates_cache(tmp_path, demo_docs):
    d = tmp_path / "watched"
    d.mkdir()
    (d / "a.txt").write_text("python programming language data science")
    st = EngineState(encoder=HashingEncoder(dim=128))
    try:
        router = build_router(st)
        router.dispatch("POST", "/index", {"documents": demo_docs})
        assert _cached(router) is False
        assert _cached(router) is True
        code, _, _ = router.dispatch(
            "POST", "/watcher/start", {"directory": str(d)})
        assert code == 200
        # shrink the debounce/poll for the test
        st.watcher.poll_interval = 0.1
        st.watcher.debounce = 0.0
        time.sleep(0.3)
        (d / "b.txt").write_text("new document about machine learning")
        deadline = time.time() + 10
        while time.time() < deadline:
            if len(st.indexer.contents) == 2:  # full reindex of the dir
                break
            time.sleep(0.1)
        assert len(st.indexer.contents) == 2
        # let the reindex callback finish the invalidation step
        time.sleep(0.3)
        assert _cached(router) is False  # stale entry is gone
    finally:
        st.close()


def test_exactness_downgrade_counter(demo_docs):
    from hybridsearch_tpu.parallel.mesh import build_mesh
    from hybridsearch_tpu.retrieval.searcher import Searcher
    from hybridsearch_tpu.utils.tracing import GLOBAL_COUNTERS

    enc = HashingEncoder(dim=64)
    s = Searcher(encoder=enc, mesh=build_mesh())
    s.indexer.index_documents(demo_docs)
    before = GLOBAL_COUNTERS.get("semantic_exactness_downgrade")
    # force misalignment: refit BM25 over a different corpus length so the
    # exact mesh-hybrid precondition (n_docs match) fails
    s.indexer.bm25.fit(demo_docs[:5])
    with pytest.warns(RuntimeWarning, match="scatter-2k"):
        s.search("machine learning", top_k=2)
    assert GLOBAL_COUNTERS.get("semantic_exactness_downgrade") == before + 1
