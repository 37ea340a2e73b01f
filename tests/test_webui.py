"""Web UI surfaces, actually driven.

The zero-dep HTML UI is checked structurally against the live router
(every endpoint its JS calls must exist and answer), and streamlit_app —
the reference's daily-driver surface (reference ui.py:94-258) — is
EXECUTED against a live API server through a stub `streamlit` module that
presses the Search button, so the HTTP calls, result rendering, and
feedback wiring all run for real (no streamlit in this image)."""

import re
import sys
import types

import pytest

from hybridsearch_tpu.api.app import EngineState, build_router
from hybridsearch_tpu.api.httpd import APIServer
from hybridsearch_tpu.api.webui import HTML_PAGE
from hybridsearch_tpu.models.encoder import HashingEncoder


@pytest.fixture(scope="module")
def live(demo_docs):
    state = EngineState(encoder=HashingEncoder(dim=128))
    router = build_router(state)
    code, _, _ = router.dispatch("POST", "/index", {"documents": demo_docs})
    assert code == 200
    with APIServer(state, host="127.0.0.1", port=0) as server:
        yield state, router, f"http://127.0.0.1:{server.port}"
    state.close()


def test_html_ui_served_and_endpoints_exist(live):
    state, router, base = live
    import urllib.request

    with urllib.request.urlopen(base + "/", timeout=10) as resp:
        page = resp.read().decode()
    assert "hybridsearch_tpu" in page and "doSearch" in page
    # every endpoint the page's JS calls must exist in the route table
    called = set(re.findall(r"post\('(/[\w/]+)'", HTML_PAGE))
    called |= set(re.findall(r"fetch\(api\+'(/[\w/]+)'", HTML_PAGE))
    assert called  # the regexes must keep matching the page source
    routes = " ".join(router.routes())
    for path in called:
        assert path in routes, f"UI calls {path} but no route exists"


class _Ctx:
    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False


class _Col(_Ctx):
    def __init__(self, st):
        self.st = st

    def write(self, text):
        self.st.written.append(str(text))

    def button(self, label, key=None):
        return False

    def json(self, obj):
        self.st.jsons.append(obj)


class _StubStreamlit(types.ModuleType):
    """Records rendering calls; presses exactly the Search button."""

    def __init__(self):
        super().__init__("streamlit")
        self.written = []
        self.jsons = []

    def set_page_config(self, **kw):
        pass

    def title(self, t):
        pass

    def tabs(self, names):
        return [_Ctx() for _ in names]

    def text_input(self, label, *a, **kw):
        return "machine learning" if label == "Query" else ""

    def text_area(self, label, *a, **kw):
        return ""

    def slider(self, label, lo, hi, default, step):
        return default

    def button(self, label, key=None):
        return label == "Search"

    def columns(self, spec):
        n = spec if isinstance(spec, int) else len(spec)
        return [_Col(self) for _ in range(n)]

    def json(self, obj):
        self.jsons.append(obj)


def test_streamlit_app_drives_live_api(live, monkeypatch):
    pytest.importorskip("requests")
    state, router, base = live
    stub = _StubStreamlit()
    monkeypatch.setitem(sys.modules, "streamlit", stub)
    monkeypatch.setenv("API_URL", base)
    from hybridsearch_tpu.api.webui import streamlit_app

    streamlit_app()
    # the search tab rendered real results from the live engine
    assert any("—" in w or "-" in w for w in stub.written)
    assert len(stub.written) >= 1
    # the stats tab rendered /stats and /cache/stats payloads
    keys = set()
    for payload in stub.jsons:
        keys |= set(payload)
    assert "total_documents" in keys  # /stats
    assert {"hits", "misses"} & keys or "hit_rate" in keys  # /cache/stats
