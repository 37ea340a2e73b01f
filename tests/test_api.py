"""REST API route-table tests over the live stdlib HTTP server, plus CLI."""

import json
import time
import urllib.request

import pytest

from hybridsearch_tpu.api.app import EngineState, build_router
from hybridsearch_tpu.api.httpd import APIServer
from hybridsearch_tpu.models.encoder import HashingEncoder


@pytest.fixture(scope="module")
def state(demo_docs):
    st = EngineState(encoder=HashingEncoder(dim=128))
    router = build_router(st)
    code, _, _ = router.dispatch("POST", "/index", {"documents": demo_docs})
    assert code == 200
    yield st
    st.close()


@pytest.fixture(scope="module")
def router(state):
    return build_router(state)


def call(router, method, path, body=None, query=None, **kw):
    return router.dispatch(method, path, body=body, query=query, **kw)


# -- core routes -------------------------------------------------------------------


def test_health(router):
    code, payload, _ = call(router, "GET", "/health")
    assert code == 200 and payload["status"] == "healthy"
    assert payload["documents"] == 12


def test_search_route_and_semantic_cache(router, state):
    code, p1, _ = call(router, "POST", "/search",
                       {"query": "machine learning", "top_k": 3})
    assert code == 200 and len(p1["results"]) == 3
    assert p1["cached"] is False
    code, p2, _ = call(router, "POST", "/search",
                       {"query": "machine learning", "top_k": 3})
    assert p2["cached"] is True  # cache actually wired into /search
    assert [r["doc_id"] for r in p2["results"]] == [
        r["doc_id"] for r in p1["results"]
    ]


def test_search_missing_query(router):
    code, payload, _ = call(router, "POST", "/search", {})
    assert code == 400


def test_search_invalid_weights(router):
    code, payload, _ = call(
        router, "POST", "/search",
        {"query": "x", "semantic_weight": 0.9, "lexical_weight": 0.9},
    )
    assert code == 400


def test_search_batch(router):
    code, payload, _ = call(router, "POST", "/search/batch",
                            {"queries": ["machine learning", "pasta"],
                             "top_k": 2})
    assert code == 200 and len(payload["results"]) == 2


def test_search_funnel_batched(router):
    """POST /search/funnel runs the batched multi-stage funnel: per-query
    result lists, funnel depths echoed, CE-ordered scores."""
    code, payload, _ = call(router, "POST", "/search/funnel",
                            {"queries": ["machine learning", "cooking pasta"],
                             "stage1_k": 8, "stage2_k": 4, "top_k": 3})
    assert code == 200
    assert payload["stage1_k"] == 8 and payload["stage2_k"] == 4
    assert len(payload["results"]) == 2
    for row in payload["results"]:
        scores = [r["score"] for r in row["results"]]
        assert scores == sorted(scores, reverse=True)
        assert len(row["results"]) <= 3


def test_search_funnel_requires_queries(router):
    code, _, _ = call(router, "POST", "/search/funnel", {})
    assert code == 400


def test_search_highlighted(router):
    code, payload, _ = call(router, "POST", "/search/highlighted",
                            {"query": "machine learning", "style": "html"})
    assert code == 200
    assert any("<mark>" in r["highlighted"] for r in payload["results"])


def test_search_filtered_prefilter(router, state):
    for i in range(12):
        state.metadata.set_metadata(i, {"topic": "tech" if i in (0, 1, 3) else "other"})
    code, payload, _ = call(router, "POST", "/search/filtered",
                            {"query": "machine learning", "filter": "topic:tech",
                             "top_k": 5})
    assert code == 200
    ids = {r["doc_id"] for r in payload["results"]}
    assert ids <= {0, 1, 3} and ids


def test_filtered_bad_filter(router):
    code, _, _ = call(router, "POST", "/search/filtered",
                      {"query": "x", "filter": "((("})
    assert code == 400


def test_index_inline_metadata_arms_prefilter():
    """Documents carrying `metadata` in POST /index (extension over the
    reference Document model api.py:26-29) must arm /search/filtered in
    one call — round-4 verify found metadata silently dropped, so every
    filter masked out the whole corpus."""
    st = EngineState(encoder=HashingEncoder(dim=128))
    try:
        router = build_router(st)
        docs = [
            {"content": "jax compiles to tpu", "metadata": {"year": 2024}},
            {"content": "bm25 lexical ranking", "metadata": {"year": 2019}},
            {"content": "hybrid dense sparse fusion",
             "metadata": {"year": 2023}},
        ]
        code, _, _ = call(router, "POST", "/index", {"documents": docs})
        assert code == 200
        code, payload, _ = call(
            router, "POST", "/search/filtered",
            {"query": "ranking fusion", "filter": "year:>2021", "top_k": 3})
        assert code == 200
        ids = {r["doc_id"] for r in payload["results"]}
        assert ids and ids <= {0, 2}
        # incremental add must also carry metadata
        code, p2, _ = call(router, "POST", "/index/add", {"documents": [
            {"content": "mosaic pallas kernels", "metadata": {"year": 2025}}
        ]})
        assert code == 200
        new_id = p2["doc_ids"][0]
        assert st.metadata.get_metadata(new_id) == {"year": 2025}
    finally:
        st.close()


def test_rerank_route(router):
    code, payload, _ = call(router, "POST", "/rerank",
                            {"query": "ml", "documents": ["a doc", "b doc"]})
    assert code == 200 and len(payload["results"]) == 2


def test_feedback_and_stats(router):
    code, _, _ = call(router, "POST", "/feedback",
                      {"query": "machine learning", "doc_id": 1, "rating": 1})
    assert code == 200
    code, payload, _ = call(router, "GET", "/stats")
    assert code == 200 and payload["total_documents"] == 12
    assert payload["total_feedback"] >= 1


def test_documents_pagination(router):
    code, payload, _ = call(router, "GET", "/documents", query={"limit": "5",
                                                                "offset": "10"})
    assert code == 200 and payload["total"] == 12
    assert len(payload["documents"]) == 2


def test_autocomplete_routes(router):
    call(router, "POST", "/search", {"query": "machine learning"})
    code, payload, _ = call(router, "GET", "/autocomplete",
                            query={"prefix": "mach"})
    assert code == 200
    assert any(s["suggestion"].startswith("machine") for s in payload["suggestions"])
    code, _, _ = call(router, "POST", "/autocomplete/record",
                      {"suggestion": "machine learning"})
    assert code == 200


def test_cache_stats_and_invalidate(router):
    code, payload, _ = call(router, "GET", "/cache/stats")
    assert code == 200 and payload["enabled"] is True
    code, payload, _ = call(router, "POST", "/cache/invalidate")
    assert code == 200


def test_duplicates_and_mark(router, state):
    code, payload, _ = call(router, "GET", "/documents/duplicates")
    assert code == 200
    code, payload, _ = call(router, "POST", "/documents/3/mark-duplicate",
                            {"duplicate_of": 1})
    assert code == 200
    assert state.indexer.store.get_document(3)["is_duplicate_of"] == 1


def test_metadata_routes(router):
    code, _, _ = call(router, "POST", "/documents/5/metadata",
                      {"metadata": {"lang": "en", "year": 2024}})
    assert code == 200
    code, payload, _ = call(router, "GET", "/documents/5/metadata")
    assert code == 200 and payload["metadata"]["year"] == 2024
    code, _, _ = call(router, "GET", "/documents/999/metadata")
    assert code == 404


def test_language_detect_route(router):
    code, payload, _ = call(router, "POST", "/language/detect",
                            {"text": "the cat sat on the mat and it was happy"})
    assert code == 200 and payload["language"] == "en"


def test_jobs_flow(router):
    code, payload, _ = call(router, "POST", "/jobs/index",
                            {"documents": ["new doc about tennis rackets"]})
    assert code == 202
    jid = payload["job_id"]
    for _ in range(150):
        code, job, _ = call(router, "GET", f"/jobs/{jid}")
        if job["state"] in ("completed", "failed"):
            break
        time.sleep(0.02)
    assert job["state"] == "completed"
    assert job["result"]["added"] == 1
    code, payload, _ = call(router, "GET", "/jobs")
    assert code == 200 and any(j["job_id"] == jid for j in payload["jobs"])
    code, _, _ = call(router, "GET", "/jobs/nonexistent")
    assert code == 404


def test_index_add_with_dedup(router, state):
    existing = state.indexer.contents[0]
    code, payload, _ = call(router, "POST", "/index/add",
                            {"documents": [existing], "dedup": "skip"})
    assert code == 200
    assert payload["added"] == 0 and len(payload["skipped"]) == 1


def test_unknown_route(router):
    code, _, _ = call(router, "GET", "/nope")
    assert code == 404


# -- auth enforcement ------------------------------------------------------------------


def test_auth_enforced_when_enabled(demo_docs):
    st = EngineState(encoder=HashingEncoder(dim=64), auth_enabled=True,
                     use_semantic_cache=False)
    r = build_router(st)
    code, _, _ = r.dispatch("GET", "/health")
    assert code == 401
    key = st.auth.keys.create_key("reader", scopes={"read"})
    code, _, _ = r.dispatch("GET", "/health", api_key=key.key)
    assert code == 200
    # write scope required for /index
    code, _, _ = r.dispatch("POST", "/index", {"documents": ["x"]},
                            api_key=key.key)
    assert code == 403
    wkey = st.auth.keys.create_key("writer", scopes={"read", "write"})
    code, _, _ = r.dispatch("POST", "/index", {"documents": ["x"]},
                            api_key=wkey.key)
    assert code == 200
    st.close()


# -- live HTTP server -----------------------------------------------------------------------


def test_httpd_end_to_end(state):
    with APIServer(state, host="127.0.0.1", port=0) as server:
        base = f"http://127.0.0.1:{server.port}"
        with urllib.request.urlopen(base + "/health", timeout=10) as resp:
            assert resp.status == 200
            assert json.loads(resp.read())["status"] == "healthy"
        req = urllib.request.Request(
            base + "/search",
            data=json.dumps({"query": "machine learning", "top_k": 2}).encode(),
            headers={"Content-Type": "application/json"},
            method="POST",
        )
        with urllib.request.urlopen(req, timeout=30) as resp:
            payload = json.loads(resp.read())
            assert len(payload["results"]) == 2


# -- CLI -----------------------------------------------------------------------------------------


def test_cli_index_search_stats(tmp_path, capsys):
    from hybridsearch_tpu.api.cli import main

    docs_dir = tmp_path / "docs"
    docs_dir.mkdir()
    (docs_dir / "ml.txt").write_text("machine learning models learn from data")
    (docs_dir / "cook.txt").write_text("boil pasta with salt and olive oil")
    db = str(tmp_path / "cli.db")

    assert main(["--db", db, "index", str(docs_dir)]) == 0
    out = capsys.readouterr().out
    assert "indexed 2 documents" in out

    assert main(["--db", db, "search", "machine learning", "--top-k", "1"]) == 0
    out = capsys.readouterr().out
    assert "machine learning" in out

    # reference cli.py:106-126: readable block by default, JSON on --json
    assert main(["--db", db, "stats"]) == 0
    out = capsys.readouterr().out
    assert "Documents indexed: 2" in out and '"total_documents"' not in out
    assert main(["--db", db, "stats", "--json"]) == 0
    out = capsys.readouterr().out
    assert '"total_documents": 2' in out

    # reference flag spellings: -k/-w/--json/--learned (cli.py:186-193)
    assert main(["--db", db, "search", "machine learning", "-k", "1",
                 "-w", "0.8", "--json", "--learned"]) == 0
    rows = json.loads(capsys.readouterr().out)
    assert rows and set(rows[0]) == {"score", "content", "doc_id"}


def test_cli_export_import(tmp_path, capsys):
    from hybridsearch_tpu.api.cli import main

    docs_dir = tmp_path / "docs"
    docs_dir.mkdir()
    (docs_dir / "a.txt").write_text("alpha document content")
    db = str(tmp_path / "cli.db")
    dump = str(tmp_path / "dump.json")
    assert main(["--db", db, "index", str(docs_dir)]) == 0
    assert main(["--db", db, "export", dump]) == 0
    db2 = str(tmp_path / "cli2.db")
    assert main(["--db", db2, "import", dump]) == 0
    out = capsys.readouterr().out
    assert "imported 1 documents" in out


def test_metrics_endpoint(router, state):
    call(router, "POST", "/search", {"query": "machine learning", "top_k": 2})
    code, payload, _ = call(router, "GET", "/metrics")
    assert code == 200
    text = payload["_text"]
    assert "hst_documents_total 1" in text  # 12 or 13 docs -> startswith 1
    assert "hst_queries_total" in text
    assert 'hst_stage_latency_ms{stage="encode"' in text
    assert "hst_cache_hits_total" in text


def test_metrics_over_http(state):
    with APIServer(state, host="127.0.0.1", port=0) as server:
        base = f"http://127.0.0.1:{server.port}"
        with urllib.request.urlopen(base + "/metrics", timeout=10) as resp:
            assert resp.status == 200
            assert resp.headers["Content-Type"].startswith("text/plain")
            body = resp.read().decode()
            assert "hst_documents_total" in body


def test_autocomplete_warm_start(tmp_path, demo_docs):
    from hybridsearch_tpu.models.encoder import HashingEncoder

    db = str(tmp_path / "warm.db")
    st = EngineState(db_path=db, encoder=HashingEncoder(dim=64),
                     use_semantic_cache=False)
    r = build_router(st)
    r.dispatch("POST", "/index", {"documents": demo_docs})
    r.dispatch("POST", "/search", {"query": "machine learning"})
    st.close()

    st2 = EngineState(db_path=db, encoder=HashingEncoder(dim=64),
                      use_semantic_cache=False)
    r2 = build_router(st2)
    code, payload, _ = r2.dispatch("GET", "/autocomplete",
                                   query={"prefix": "mach"})
    assert any(s["suggestion"] == "machine learning"
               for s in payload["suggestions"])
    st2.close()


def test_delete_document_route(demo_docs):
    st = EngineState(encoder=HashingEncoder(dim=64), use_semantic_cache=False)
    r = build_router(st)
    r.dispatch("POST", "/index", {"documents": demo_docs})
    code, before, _ = r.dispatch("POST", "/search",
                                 {"query": "machine learning", "top_k": 1})
    target = before["results"][0]["doc_id"]
    code, payload, _ = r.dispatch("DELETE", f"/documents/{target}")
    assert code == 200 and payload["doc_id"] == target
    code, after, _ = r.dispatch("POST", "/search",
                                {"query": "machine learning", "top_k": 11})
    assert target not in [x["doc_id"] for x in after["results"]]
    code, _, _ = r.dispatch("DELETE", "/documents/999")
    assert code == 404
    st.close()


def test_index_accepts_reference_document_objects():
    """The reference's IndexRequest documents are objects with `content`
    and optional `source_path` (reference api.py:26-32, 177-178); plain
    strings must keep working, and malformed entries get a 400 (not a
    TypeError 500)."""
    st = EngineState(encoder=HashingEncoder(dim=64), use_semantic_cache=False)
    r = build_router(st)
    code, payload, _ = r.dispatch("POST", "/index", {"documents": [
        {"content": "JAX compiles programs for TPU hardware",
         "source_path": "/data/a.txt"},
        {"content": "BM25 ranks documents by term frequency"},
        "plain string document about cats and dogs",
    ]})
    assert code == 200 and payload["indexed"] == 3
    code, res, _ = r.dispatch("POST", "/search",
                              {"query": "TPU hardware", "top_k": 1})
    assert code == 200 and res["results"]

    code, payload, _ = r.dispatch("POST", "/index/add", {"documents": [
        {"content": "incremental object add"}]})
    assert code == 200 and payload["added"] == 1

    code, payload, _ = r.dispatch("POST", "/index",
                                  {"documents": [{"text": "no content key"}]})
    assert code == 400
    code, payload, _ = r.dispatch("POST", "/jobs/index",
                                  {"documents": [123]})
    assert code == 400
    st.close()


def test_search_response_reference_fields_and_feedback_by_query_id(demo_docs):
    """Reference parity: every /search response carries query_id and
    weights_used (api.py:283-296); /feedback accepts the FeedbackRequest
    form {query_id, doc_id, relevance_score, clicked} (api.py:48-53);
    learned weights apply only on use_learned_weights=True
    (core.py:225-230)."""
    st = EngineState(encoder=HashingEncoder(dim=64), use_semantic_cache=False)
    r = build_router(st)
    r.dispatch("POST", "/index", {"documents": demo_docs})
    code, res, _ = r.dispatch("POST", "/search",
                              {"query": "machine learning", "top_k": 3,
                               "semantic_weight": 0.6,
                               "lexical_weight": 0.4})
    assert code == 200
    assert isinstance(res["query_id"], int)
    assert res["weights_used"] == {"semantic": 0.6, "lexical": 0.4,
                                   "learned": False}

    code, payload, _ = r.dispatch("POST", "/feedback",
                                  {"query_id": res["query_id"],
                                   "doc_id": res["results"][0]["doc_id"],
                                   "relevance_score": 4, "clicked": True})
    assert code == 200 and payload["status"] == "success"
    code, _, _ = r.dispatch("POST", "/feedback",
                            {"query_id": 10**9, "doc_id": 0,
                             "relevance_score": 1})
    assert code == 404

    # a click with no rating is a positive row for the weight learner
    for _ in range(9):
        code, res, _ = r.dispatch("POST", "/search",
                                  {"query": "machine learning", "top_k": 1,
                                   "semantic_weight": 0.6,
                                   "lexical_weight": 0.4})
        r.dispatch("POST", "/feedback",
                   {"query_id": res["query_id"],
                    "doc_id": res["results"][0]["doc_id"], "clicked": True})
    learned = st.searcher.query_memory.get_optimal_weights()
    assert learned is not None
    # defaults stay 0.7/0.3 without the opt-in; learned applies with it
    assert st.searcher.resolve_weights(None, None) == (0.7, 0.3)
    sw, lw = st.searcher.resolve_weights(None, None,
                                         use_learned_weights=True)
    assert abs(sw - 0.6) < 1e-6 and abs(lw - 0.4) < 1e-6
    code, res, _ = r.dispatch("POST", "/search",
                              {"query": "machine learning", "top_k": 1,
                               "use_learned_weights": True})
    assert res["weights_used"]["learned"] is True
    assert abs(res["weights_used"]["semantic"] - 0.6) < 1e-6
    st.close()


def test_rerank_by_doc_ids_and_autocomplete_post(demo_docs):
    """Reference parity: /rerank takes doc_ids resolved from the store
    (api.py:521-538, 404 when none match); POST /autocomplete returns a
    bare list of {text, score, source, frequency} (api.py:567-596);
    /autocomplete/record takes partial_query+selected query params
    (api.py:598-609)."""
    st = EngineState(encoder=HashingEncoder(dim=64), use_semantic_cache=False)
    r = build_router(st)
    r.dispatch("POST", "/index", {"documents": demo_docs})
    code, payload, _ = r.dispatch("POST", "/rerank",
                                  {"query": "machine learning",
                                   "doc_ids": [0, 1, 2], "top_k": 2})
    assert code == 200 and len(payload["results"]) == 2
    assert {row["doc_id"] for row in payload["results"]} <= {0, 1, 2}
    code, _, _ = r.dispatch("POST", "/rerank",
                            {"query": "x", "doc_ids": [99999]})
    assert code == 404
    # reference form: query params only (repeated doc_ids arrive as a list)
    code, payload, _ = r.dispatch("POST", "/rerank", {},
                                  query={"query": "machine learning",
                                         "doc_ids": ["0", "1"],
                                         "top_k": "1"})
    assert code == 200 and len(payload["results"]) == 1

    r.dispatch("POST", "/search", {"query": "machine learning", "top_k": 1})
    code, payload, _ = r.dispatch("POST", "/autocomplete",
                                  {"partial_query": "mach", "limit": 5})
    assert code == 200 and isinstance(payload, list) and payload
    assert set(payload[0]) == {"text", "score", "source", "frequency"}
    code, _, _ = r.dispatch("POST", "/autocomplete/record", {},
                            query={"partial_query": "mach",
                                   "selected": "machine learning"})
    assert code == 200
    st.close()
