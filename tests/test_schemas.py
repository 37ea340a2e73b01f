"""API schema registry: OpenAPI export, route coverage, Pydantic models.

Mirrors the reference's edge validation (reference api.py:26-73 Pydantic
Field constraints) without requiring fastapi in this environment; the
FastAPI adapter tests run only where fastapi is installed.
"""

from __future__ import annotations

import json
import os

import pytest

from hybridsearch_tpu.api.schemas import (
    ROUTE_SPECS,
    build_openapi,
    pydantic_request_models,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _router_routes():
    """(method, path) pairs from the live router table."""
    from hybridsearch_tpu.api.app import EngineState, build_router
    from hybridsearch_tpu.config import EngineConfig
    from hybridsearch_tpu.models.encoder import HashingEncoder

    cfg = EngineConfig()
    cfg.index.dim = 64
    state = EngineState(encoder=HashingEncoder(dim=64), config=cfg)
    try:
        router = build_router(state)
        import re

        out = []
        for method, pattern, _n, _h, _s in router._routes:
            path = re.sub(
                r"\(\?P<(\w+)>\[\^/\]\+\)", r"{\1}",
                pattern.pattern.lstrip("^").rstrip("$"),
            )
            out.append((method, path))
        return out
    finally:
        state.close()


def test_every_router_route_has_a_spec():
    """ROUTE_SPECS is the single source of truth: every live route must be
    documented, and every spec must point at a live route."""
    live = set(_router_routes())
    spec = set(ROUTE_SPECS.keys())
    assert live == spec, (
        f"undocumented: {sorted(live - spec)}; stale: {sorted(spec - live)}"
    )


def test_openapi_document_structure():
    doc = build_openapi()
    assert doc["openapi"].startswith("3.1")
    assert len(doc["paths"]) == len({p for _m, p in ROUTE_SPECS})
    search = doc["paths"]["/search"]["post"]
    body = search["requestBody"]["content"]["application/json"]["schema"]
    assert body["required"] == ["query"]
    assert body["properties"]["top_k"]["minimum"] == 1
    assert body["properties"]["top_k"]["maximum"] == 100
    assert body["properties"]["semantic_weight"]["maximum"] == 1
    # path params rendered
    assert any(
        p["in"] == "path" and p["name"] == "doc_id"
        for p in doc["paths"]["/documents/{doc_id}"]["delete"]["parameters"]
    )
    # /metrics documents text/plain
    metrics = doc["paths"]["/metrics"]["get"]["responses"]["200"]
    assert "text/plain" in metrics["content"]


def test_static_openapi_export_is_current():
    """docs/openapi.json must match the generated spec (regenerate with
    schemas.export_openapi when routes change)."""
    path = os.path.join(REPO, "docs", "openapi.json")
    assert os.path.exists(path), "docs/openapi.json missing"
    with open(path, encoding="utf-8") as fh:
        on_disk = json.load(fh)
    assert on_disk == json.loads(json.dumps(build_openapi(), sort_keys=True))


def test_pydantic_models_enforce_reference_constraints():
    pytest.importorskip("pydantic")
    from pydantic import ValidationError

    models = pydantic_request_models()
    search = models[("POST", "/search")]
    ok = search(query="hello", top_k=10)
    assert ok.query == "hello" and ok.top_k == 10
    with pytest.raises(ValidationError):
        search(top_k=10)  # query required (reference api.py:41)
    with pytest.raises(ValidationError):
        search(query="x", top_k=500)  # le=100 (reference api.py:42)
    with pytest.raises(ValidationError):
        search(query="x", semantic_weight=1.5)  # le=1 (reference api.py:43)
    feedback = models[("POST", "/feedback")]
    with pytest.raises(ValidationError):
        feedback(query="x", doc_id=1, rating=99)
    ask = models[("POST", "/ask")]
    with pytest.raises(ValidationError):
        ask(question="q", top_k=50)  # le=10 (reference api.py:415)


def test_fastapi_adapter_end_to_end():
    """Real per-route registration + 422s + OpenAPI, when fastapi exists."""
    pytest.importorskip("fastapi")
    from fastapi.testclient import TestClient

    from hybridsearch_tpu.api.fastapi_app import create_app
    from hybridsearch_tpu.config import EngineConfig
    from hybridsearch_tpu.models.encoder import HashingEncoder

    cfg = EngineConfig()
    cfg.index.dim = 64
    app = create_app(encoder=HashingEncoder(dim=64), config=cfg)
    client = TestClient(app)
    assert client.get("/health").status_code == 200
    r = client.post("/index", json={"documents": ["alpha beta", "gamma"]})
    assert r.status_code == 200 and r.json()["indexed"] == 2
    r = client.post("/search", json={"query": "alpha", "top_k": 1})
    assert r.status_code == 200 and r.json()["results"]
    # Pydantic constraint -> automatic 422 (catch-all adapters returned 400s)
    assert client.post("/search", json={"top_k": 5}).status_code == 422
    assert client.post("/search", json={"query": "x", "top_k": 500}).status_code == 422
    # generated OpenAPI covers the table
    spec = client.get("/openapi.json").json()
    assert "/search/filtered" in spec["paths"]
    # /metrics is text/plain
    m = client.get("/metrics")
    assert m.headers["content-type"].startswith("text/plain")
