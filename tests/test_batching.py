"""Cross-request dynamic batching (api/batching.py): coalescing,
parity with direct search, weight grouping, timeout shedding."""

import threading
import time

import pytest

from hybridsearch_tpu.api.app import EngineState, build_router
from hybridsearch_tpu.api.batching import BatchTimeout, SearchBatcher
from hybridsearch_tpu.models.encoder import HashingEncoder


@pytest.fixture(scope="module")
def state(demo_docs):
    st = EngineState(encoder=HashingEncoder(dim=128))
    router = build_router(st)
    code, _, _ = router.dispatch("POST", "/index", {"documents": demo_docs})
    assert code == 200
    yield st
    st.close()


def test_batched_results_match_direct(state):
    """A submit through the batcher returns exactly what a direct
    searcher.search returns."""
    direct = state.searcher.search("machine learning", top_k=3,
                                   semantic_weight=0.7, lexical_weight=0.3,
                                   log=False)
    via, qid = state.batcher.submit("machine learning", 3, 0.7, 0.3)
    assert [(round(s, 5), i) for s, _c, i in direct] == [
        (round(s, 5), i) for s, _c, i in via]
    assert qid is not None  # the batcher logs to query memory itself


def test_concurrent_requests_coalesce(state):
    """N concurrent submits produce fewer device dispatches than N and
    every caller gets its own query's results."""
    queries = ["machine learning", "cooking pasta", "neural networks",
               "python programming", "deep learning", "italian food",
               "data science", "web development"]
    before = state.batcher.dispatches
    results = {}
    errs = []

    def worker(q):
        try:
            rows, _ = state.batcher.submit(q, 3, 0.7, 0.3)
            results[q] = rows
        except BaseException as e:  # noqa: BLE001
            errs.append(e)

    threads = [threading.Thread(target=worker, args=(q,)) for q in queries]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=120)
    assert not errs
    assert len(results) == len(queries)
    made = state.batcher.dispatches - before
    assert made < len(queries)  # some coalescing happened
    assert state.batcher.max_seen_batch >= 2
    # per-caller correctness: each query's own results, not a neighbor's
    for q, rows in results.items():
        direct = state.searcher.search(q, top_k=3, log=False)
        assert [i for _s, _c, i in rows] == [i for _s, _c, i in direct]


def test_weight_groups_do_not_mix(state):
    """Different fusion weights in one drain produce per-group dispatches
    with each group's own scores."""
    out = {}

    def worker(tag, sw, lw):
        rows, _ = state.batcher.submit("machine learning", 3, sw, lw)
        out[tag] = rows

    t1 = threading.Thread(target=worker, args=("sem", 1.0, 0.0))
    t2 = threading.Thread(target=worker, args=("lex", 0.0, 1.0))
    t1.start(); t2.start(); t1.join(60); t2.join(60)
    d_sem = state.searcher.search("machine learning", top_k=3,
                                  semantic_weight=1.0, lexical_weight=0.0,
                                  log=False)
    d_lex = state.searcher.search("machine learning", top_k=3,
                                  semantic_weight=0.0, lexical_weight=1.0,
                                  log=False)
    assert [i for _s, _c, i in out["sem"]] == [i for _s, _c, i in d_sem]
    assert [i for _s, _c, i in out["lex"]] == [i for _s, _c, i in d_lex]


def test_top_k_trimmed_per_request(state):
    """Mixed top_k in one group: served at the max, trimmed per caller."""
    out = {}

    def worker(k):
        rows, _ = state.batcher.submit("machine learning", k, 0.7, 0.3)
        out[k] = rows

    ts = [threading.Thread(target=worker, args=(k,)) for k in (2, 5)]
    for t in ts:
        t.start()
    for t in ts:
        t.join(60)
    assert len(out[2]) <= 2 and len(out[5]) <= 5
    assert [i for _s, _c, i in out[2]] == [i for _s, _c, i in out[5]][:len(out[2])]


def test_queue_timeout_sheds(state):
    """A request older than queue_timeout_s fails with BatchTimeout
    instead of waiting forever."""
    b = SearchBatcher(state.searcher, max_batch=4, queue_timeout_s=0.0)
    # don't start the dispatcher loop: enqueue and dispatch manually so
    # the age check sees an expired entry
    from hybridsearch_tpu.api.batching import _Pending

    p = _Pending("q", 3, 0.7, 0.3)
    p.t_enq -= 10.0
    b._dispatch([p])
    assert isinstance(p.error, BatchTimeout)
    b.close()


def test_search_route_uses_batcher(state):
    """POST /search goes through the batcher and reports a query_id."""
    router = build_router(state)
    before = state.batcher.batched_requests
    code, payload, _ = router.dispatch(
        "POST", "/search", {"query": "unique batcher probe", "top_k": 2})
    assert code == 200
    assert state.batcher.batched_requests == before + 1
    assert payload["query_id"] is not None
