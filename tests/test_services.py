"""Service subsystem tests: caches, autocomplete, dedup, language, metadata
filter, jobs, watcher, auth."""

import os
import time

import numpy as np
import pytest

from hybridsearch_tpu.services.auth import AuthContext
from hybridsearch_tpu.services.autocomplete import AutocompleteEngine, PrefixTrie
from hybridsearch_tpu.services.cache import (
    InMemoryCache,
    LinearScanSemanticCache,
    cached_search,
    make_key,
)
from hybridsearch_tpu.services.dedup import DedupeAction, DeduplicationEngine, MinHasher
from hybridsearch_tpu.services.jobs import JobQueue, JobState
from hybridsearch_tpu.services.language import LanguageDetector, detect_script
from hybridsearch_tpu.services.metadata_filter import (
    FieldSpec,
    FilterParseError,
    FilterParser,
    MetadataFilterEngine,
    MetadataSchema,
    evaluate,
    to_bias,
    to_sql,
)
from hybridsearch_tpu.services.semantic_cache import InMemoryBackend, SemanticCache
from hybridsearch_tpu.services.watcher import FileWatcher


# -- semantic cache ---------------------------------------------------------------


def test_semantic_cache_hit_and_miss(rng):
    c = SemanticCache(similarity_threshold=0.95, dim=64)
    v = rng.standard_normal(64).astype(np.float32)
    c.set(v, {"results": [1, 2, 3]})
    near = v + 0.001 * rng.standard_normal(64).astype(np.float32)
    assert c.get(near) == {"results": [1, 2, 3]}
    far = rng.standard_normal(64).astype(np.float32)
    assert c.get(far) is None
    stats = c.stats()
    assert stats["hits"] == 1 and stats["misses"] == 1
    assert c.invalidate() == 1
    assert c.get(near) is None


def test_semantic_cache_ttl_expiry(rng):
    c = SemanticCache(dim=16, ttl_seconds=0.05)
    v = rng.standard_normal(16).astype(np.float32)
    c.set(v, "x")
    time.sleep(0.1)
    assert c.get(v) is None


def test_inmemory_backend_lru():
    b = InMemoryBackend(max_entries=2)
    b.set("a", 1)
    b.set("b", 2)
    b.get("a")  # refresh a
    b.set("c", 3)  # evicts b
    assert b.get("a") == 1 and b.get("b") is None and b.get("c") == 3


# -- exact caches ----------------------------------------------------------------------


def test_make_key_param_sensitivity():
    assert make_key("q", k=5) != make_key("q", k=6)
    assert make_key("q", k=5) == make_key("q", k=5)


def test_inmemory_cache_ttl_and_stats():
    c = InMemoryCache(max_entries=10, ttl_seconds=0.05)
    c.set("k", "v")
    assert c.get("k") == "v"
    time.sleep(0.1)
    assert c.get("k") is None
    assert c.stats()["hits"] == 1 and c.stats()["misses"] == 1


def test_cached_search_decorator():
    calls = {"n": 0}

    @cached_search()
    def search(query, top_k=5):
        calls["n"] += 1
        return [query, top_k]

    assert search("a") == ["a", 5]
    assert search("a") == ["a", 5]
    assert calls["n"] == 1
    search("a", top_k=7)
    assert calls["n"] == 2


def test_linear_scan_semantic_cache(rng):
    c = LinearScanSemanticCache(similarity_threshold=0.9)
    v = rng.standard_normal(32).astype(np.float32)
    c.set(v, "hit")
    assert c.get(v + 0.001) == "hit"
    assert c.get(rng.standard_normal(32).astype(np.float32)) is None


# -- autocomplete --------------------------------------------------------------------------


def test_trie_prefix_and_frequency():
    t = PrefixTrie()
    t.insert("machine learning")
    t.insert("machine learning")
    t.insert("machine vision")
    out = t.search_prefix("machine")
    assert out[0] == ("machine learning", 2)
    assert ("machine vision", 1) in out


def test_trie_fuzzy():
    t = PrefixTrie()
    t.insert("python")
    hits = t.fuzzy_search("pythn", max_distance=2)
    assert hits and hits[0][0] == "python"


def test_autocomplete_three_sources_and_learning(demo_docs):
    e = AutocompleteEngine()
    e.record_query("machine learning")
    e.index_content(demo_docs)
    out = e.suggest("mach")
    sources = {s["source"] for s in out}
    assert "history" in sources
    assert out[0]["suggestion"] == "machine learning"  # history ranks first
    # selection learning boosts
    base = out[0]["score"]
    e.record_selection("machine learning")
    out2 = e.suggest("mach")
    assert out2[0]["score"] > base
    # fuzzy source for typos
    fz = e.suggest("machne learning")
    assert any(s["source"] == "fuzzy" for s in fz)


# -- dedup ------------------------------------------------------------------------------------


def test_minhash_similarity_tracks_jaccard():
    h = MinHasher()
    a = h.signature("the quick brown fox jumps over the lazy dog")
    b = h.signature("the quick brown fox jumps over the lazy cat")
    c = h.signature("completely unrelated text about quantum physics")
    assert h.similarity(a, b) > 0.6
    assert h.similarity(a, c) < 0.3
    assert h.similarity(a, a) == 1.0


def test_dedup_exact_and_near(demo_docs):
    e = DeduplicationEngine(threshold=0.8)
    e.add_document("d0", demo_docs[0])
    dups = e.find_duplicates(demo_docs[0])
    assert dups and dups[0] == ("d0", 1.0)
    near = demo_docs[0].replace("data science", "data sciences")
    near_dups = e.find_duplicates(near)
    assert near_dups and near_dups[0][0] == "d0"
    assert e.find_duplicates("entirely different content here") == []


def test_dedup_check_and_handle_actions(demo_docs):
    e = DeduplicationEngine(threshold=0.8, action=DedupeAction.SKIP)
    r1 = e.check_and_handle("a", demo_docs[0])
    assert r1["is_duplicate"] is False
    r2 = e.check_and_handle("b", demo_docs[0])
    assert r2["is_duplicate"] is True and r2["action"] == "skip"


def test_find_all_duplicates(demo_docs):
    e = DeduplicationEngine(threshold=0.8)
    docs = {"a": demo_docs[0], "b": demo_docs[0], "c": demo_docs[5]}
    groups = e.find_all_duplicates(docs)
    assert len(groups) == 1 and groups[0]["key"] == "b"


# -- language ------------------------------------------------------------------------------------


def test_detect_script_ranges():
    assert detect_script("это русский текст") == "cyrillic"
    assert detect_script("これは日本語") in ("hiragana", "cjk", "katakana")
    assert detect_script("plain english") is None


def test_language_detector_major_languages():
    d = LanguageDetector()
    assert d.detect_simple("the cat sat on the mat and it was happy") == "en"
    assert d.detect_simple("el gato se sentó en la alfombra y la casa es grande") == "es"
    assert d.detect_simple("le chat est dans la maison et il est content") == "fr"
    assert d.detect("это русский текст").language == "ru"
    assert d.detect("").language == "unknown"


def test_language_detect_batch():
    d = LanguageDetector()
    out = d.detect_batch(["the cat is here and the dog is there", "das ist ein haus und der hund"])
    assert [r.language for r in out] == ["en", "de"]


# -- metadata filter --------------------------------------------------------------------------------


def test_filter_parser_and_eval():
    p = FilterParser()
    node = p.parse("category:science AND year:>2020")
    assert evaluate(node, {"category": "science", "year": 2021})
    assert not evaluate(node, {"category": "science", "year": 2019})
    assert not evaluate(node, {"category": "art", "year": 2021})


def test_filter_or_not_parens():
    p = FilterParser()
    node = p.parse("(category:a OR category:b) AND NOT flag:true")
    assert evaluate(node, {"category": "a", "flag": False})
    assert not evaluate(node, {"category": "a", "flag": True})
    assert not evaluate(node, {"category": "c", "flag": False})


def test_filter_ops():
    p = FilterParser()
    assert evaluate(p.parse("title:~learn"), {"title": "Machine Learning"})
    assert evaluate(p.parse("tag:in(a,b)"), {"tag": "b"})
    assert not evaluate(p.parse("tag:in(a,b)"), {"tag": "c"})
    assert evaluate(p.parse("score:>=0.5"), {"score": 0.5})
    assert evaluate(p.parse("nested.key:v"), {"nested": {"key": "v"}})


def test_filter_parse_errors():
    p = FilterParser()
    with pytest.raises(FilterParseError):
        p.parse("AND AND")
    with pytest.raises(FilterParseError):
        p.parse("(a:1")


def test_filter_to_sql_roundtrip(tmp_path):
    from hybridsearch_tpu.store.docstore import DocStore

    store = DocStore(str(tmp_path / "m.db"))
    store.add_documents(["d0", "d1", "d2"])
    store.set_metadata(0, {"category": "science", "year": 2021})
    store.set_metadata(1, {"category": "art", "year": 2019})
    store.set_metadata(2, {"category": "science", "year": 2018})
    node = FilterParser().parse("category:science AND year:>2019")
    sql, params = to_sql(node)
    rows = store._conn.execute(
        f"SELECT doc_id FROM doc_metadata WHERE {sql}", params
    ).fetchall()
    assert [r["doc_id"] for r in rows] == [0]


def test_filter_to_bias_prefilter():
    node = FilterParser().parse("keep:true")
    meta = {0: {"keep": True}, 1: {"keep": False}, 2: {"keep": True}}
    bias = to_bias(node, meta, 4)
    assert bias[0] == 0.0 and bias[2] == 0.0
    assert bias[1] == -np.inf and bias[3] == -np.inf  # missing meta excluded


def test_metadata_schema_validation():
    schema = MetadataSchema([FieldSpec("year", "int", required=True),
                             FieldSpec("tags", "list")])
    assert schema.validate({"year": 2020, "tags": []}) == []
    assert schema.validate({"tags": "no"}) != []
    eng = MetadataFilterEngine(schema=schema)
    with pytest.raises(ValueError):
        eng.set_metadata(0, {"tags": []})


def test_metadata_engine_post_filter():
    eng = MetadataFilterEngine()
    results = [(0.9, "a", 0), (0.8, "b", 1)]
    meta = {0: {"lang": "en"}, 1: {"lang": "de"}}
    out = eng.filter_results("lang:en", results, metadata=meta)
    assert out == [(0.9, "a", 0)]


# -- jobs ------------------------------------------------------------------------------------------------


def test_job_lifecycle_success():
    q = JobQueue(n_workers=1)
    progress_seen = []

    def handler(payload, progress_cb, cancel):
        progress_cb(50)
        progress_seen.append(True)
        return {"done": payload["x"] * 2}

    q.register_handler("double", handler)
    jid = q.enqueue("double", {"x": 21})
    for _ in range(100):
        if q.get(jid).state == JobState.COMPLETED:
            break
        time.sleep(0.02)
    job = q.get(jid)
    assert job.state == JobState.COMPLETED
    assert job.result == {"done": 42}
    assert job.progress == 100.0
    q.shutdown()


def test_job_retries_with_backoff():
    q = JobQueue(n_workers=1, retry_base_delay=0.01)
    attempts = {"n": 0}

    def flaky(payload, progress_cb, cancel):
        attempts["n"] += 1
        if attempts["n"] < 3:
            raise RuntimeError("boom")
        return "ok"

    q.register_handler("flaky", flaky)
    jid = q.enqueue("flaky", max_retries=3)
    for _ in range(200):
        if q.get(jid).state == JobState.COMPLETED:
            break
        time.sleep(0.02)
    job = q.get(jid)
    assert job.state == JobState.COMPLETED and attempts["n"] == 3
    assert job.retries == 2
    q.shutdown()


def test_job_failure_after_max_retries():
    q = JobQueue(n_workers=1, retry_base_delay=0.01)

    def always_fails(payload, progress_cb, cancel):
        raise ValueError("nope")

    q.register_handler("bad", always_fails)
    jid = q.enqueue("bad", max_retries=1)
    for _ in range(200):
        if q.get(jid).state == JobState.FAILED:
            break
        time.sleep(0.02)
    job = q.get(jid)
    assert job.state == JobState.FAILED and "nope" in job.error
    q.shutdown()


def test_job_cancellation():
    q = JobQueue(n_workers=1)
    started = []

    def slow(payload, progress_cb, cancel):
        started.append(True)
        for _ in range(100):
            if cancel.is_set():
                raise RuntimeError("cancelled mid-flight")
            time.sleep(0.01)
        return "done"

    q.register_handler("slow", slow)
    jid = q.enqueue("slow")
    for _ in range(100):
        if started:
            break
        time.sleep(0.01)
    assert q.cancel(jid)
    for _ in range(200):
        if q.get(jid).state == JobState.CANCELLED:
            break
        time.sleep(0.02)
    assert q.get(jid).state == JobState.CANCELLED
    q.shutdown()


def test_unknown_job_type():
    q = JobQueue(n_workers=1)
    with pytest.raises(ValueError):
        q.enqueue("nope")
    q.shutdown()


# -- watcher -----------------------------------------------------------------------------------------------


def test_polling_watcher_detects_changes(tmp_path):
    events = []
    w = FileWatcher(str(tmp_path), lambda ev, p: events.append((ev, os.path.basename(p))),
                    poll_interval=0.05, debounce=0.0)
    w.start()
    try:
        time.sleep(0.15)
        f = tmp_path / "doc.txt"
        f.write_text("hello")
        time.sleep(0.25)
        f.write_text("hello world")
        time.sleep(0.25)
        f.unlink()
        time.sleep(0.25)
    finally:
        w.stop()
    kinds = [e for e, _ in events]
    assert "created" in kinds and "deleted" in kinds


def test_watcher_trailing_edge_debounce(tmp_path):
    """An event suppressed inside the debounce window must re-fire once
    the window expires: create (empty file) followed immediately by the
    content write must eventually deliver a second callback — otherwise
    the indexed state is the EMPTY file forever (the bug the /verify
    drive caught: echo > new.txt indexed nothing)."""
    events = []
    w = FileWatcher(str(tmp_path),
                    lambda ev, p: events.append((ev, time.time())),
                    poll_interval=0.05, debounce=0.3)
    w.start()
    try:
        time.sleep(0.15)
        f = tmp_path / "doc.txt"
        f.touch()  # create event fires immediately (leading edge)
        deadline = time.time() + 2.0
        while not events and time.time() < deadline:
            time.sleep(0.02)
        assert events, "leading-edge create never fired"
        f.write_text("real content")  # inside the window -> suppressed
        deadline = time.time() + 3.0
        while len(events) < 2 and time.time() < deadline:
            time.sleep(0.05)
    finally:
        w.stop()
    assert len(events) >= 2, "suppressed modify was never re-fired"
    assert events[1][1] - events[0][1] >= 0.29  # after the window


def test_watcher_extension_filter(tmp_path):
    events = []
    w = FileWatcher(str(tmp_path), lambda ev, p: events.append(p),
                    poll_interval=0.05, debounce=0.0)
    w.start()
    try:
        time.sleep(0.1)
        (tmp_path / "ignore.bin").write_bytes(b"x")
        time.sleep(0.25)
    finally:
        w.stop()
    assert events == []


# -- auth ------------------------------------------------------------------------------------------------------


def test_auth_disabled_allows_all():
    ctx = AuthContext(enabled=False)
    ok, status, _ = ctx.authorize(None, "1.2.3.4")
    assert ok and status == 200


def test_auth_key_validation_and_scopes():
    ctx = AuthContext(enabled=True)
    key = ctx.keys.create_key("test", scopes={"read"})
    assert ctx.authorize(key.key, "ip", scope="read")[0]
    ok, status, _ = ctx.authorize(key.key, "ip", scope="write")
    assert not ok and status == 403
    ok, status, _ = ctx.authorize("bogus", "ip")
    assert not ok and status == 401
    ctx.keys.revoke(key.key)
    assert not ctx.authorize(key.key, "ip")[0]


def test_auth_rate_limits():
    ctx = AuthContext(enabled=True, key_limit=2, ip_limit=100)
    key = ctx.keys.create_key("rl")
    assert ctx.authorize(key.key, "ip")[0]
    assert ctx.authorize(key.key, "ip")[0]
    ok, status, headers = ctx.authorize(key.key, "ip")
    assert not ok and status == 429 and "Retry-After" in headers


def test_ip_rate_limit_when_enabled():
    ctx = AuthContext(enabled=True, ip_limit=2)
    key = ctx.keys.create_key("k")
    assert ctx.authorize(key.key, "9.9.9.9")[0]
    assert ctx.authorize(key.key, "9.9.9.9")[0]
    ok, status, _ = ctx.authorize(key.key, "9.9.9.9")
    assert not ok and status == 429


def test_key_expiry():
    ctx = AuthContext(enabled=True)
    key = ctx.keys.create_key("short", ttl_seconds=0.01)
    time.sleep(0.05)
    assert not ctx.authorize(key.key, "ip")[0]


def test_multilingual_embedder_fallback(demo_docs):
    """Without multilingual weights on disk the hook serves the hashing
    encoder (language-agnostic), same output contract."""
    from hybridsearch_tpu.services.language import MultilingualEmbedder

    emb = MultilingualEmbedder(dim=64)
    out = emb.encode(["hola mundo", "hello world"])
    assert out.shape == (2, 64)
    out2 = emb.encode(["hola mundo", "hello world"])
    np.testing.assert_allclose(out, out2)


def test_auto_indexer_reindexes_on_change(tmp_path):
    """create_auto_indexer wires watcher events to a full reindex
    (reference watcher.py:157-186)."""
    import time as _t

    from hybridsearch_tpu.index.builder import Indexer
    from hybridsearch_tpu.models.encoder import HashingEncoder
    from hybridsearch_tpu.services.watcher import create_auto_indexer

    ix = Indexer(encoder=HashingEncoder(dim=64))
    w = create_auto_indexer(ix, str(tmp_path), poll_interval=0.05, debounce=0.0)
    w.start()
    try:
        _t.sleep(0.15)
        (tmp_path / "a.txt").write_text("machine learning content here")
        for _ in range(80):
            if ix.dense.n_docs == 1:
                break
            _t.sleep(0.05)
    finally:
        w.stop()
    assert ix.dense.n_docs == 1
    assert "machine learning" in ix.contents[0]


def test_language_breadth_scripts():
    """Every non-Latin script in the 50-language support list detects
    first-party (reference language.py:34-40 coverage via langdetect)."""
    d = LanguageDetector()
    cases = {
        "นี่คือข้อความภาษาไทย": "th",
        "이것은 한국어 텍스트입니다": "ko",
        "これは日本語のテキストです": "ja",
        "漢字だけでなくひらがなもある": "ja",  # kana disambiguates from zh
        "这是中文文本没有假名": "zh",
        "זהו טקסט בעברית": "he",
        "هذا نص باللغة العربية": "ar",
        "این متن فارسی است و دارای گچپژ": "fa",  # Persian-only letters
        "یہ اردو میں ہے ڈاک ٹھیک": "ur",  # Urdu-only letters
        "यह हिंदी में पाठ है": "hi",
        "এটি বাংলা পাঠ্য": "bn",
        "இது தமிழ் உரை": "ta",
        "ఇది తెలుగు వచనం": "te",
        "ಇದು ಕನ್ನಡ ಪಠ್ಯ": "kn",
        "ഇത് മലയാളം വാചകം": "ml",
        "આ ગુજરાતી લખાણ છે": "gu",
        "ਇਹ ਪੰਜਾਬੀ ਪਾਠ ਹੈ": "pa",
        "αυτό είναι ελληνικό κείμενο": "el",
        "це український текст із літерою ї": "uk",
    }
    for text, want in cases.items():
        got = d.detect(text).language
        assert got == want, (text, got, want)


def test_language_breadth_latin_profiles():
    d = LanguageDetector()
    cases = {
        "acesta este un text în limba română și are diacritice": "ro",
        "ez egy magyar szöveg és nagyon hosszú hogy biztos legyen": "hu",
        "tämä on suomenkielinen teksti ja se on pitkä että varma": "fi",
        "toto je český text a je to dlouhé že se pozná": "cs",
        "đây là văn bản tiếng việt của chúng tôi": "vi",
        "to jest polski tekst i jest długi że się pozna": "pl",
        "dit is een nederlandse tekst en het is lang": "nl",
        "detta är en svensk text och den är som lång": "sv",
        "bu bir türkçe metin ve çok uzun gibi ama en iyi": "tr",
        "ini adalah teks bahasa indonesia yang panjang untuk itu": "id",
    }
    for text, want in cases.items():
        got = d.detect(text).language
        assert got == want, (text, got, want)


def test_inotify_backend_detects_changes(tmp_path):
    """First-party ctypes inotify backend: created/modified/deleted fire
    with kernel-event latency (no polling interval), new subdirectories
    are picked up, and unwanted extensions are filtered."""
    import sys
    import time as _time

    from hybridsearch_tpu.services import watcher as watcher_mod

    if not sys.platform.startswith("linux"):
        pytest.skip("inotify is Linux-only")
    assert watcher_mod.INOTIFY_AVAILABLE
    events = []
    w = FileWatcher(str(tmp_path),
                    lambda ev, p: events.append((ev, os.path.basename(p))),
                    poll_interval=99.0, debounce=0.0)  # poll would be too slow
    w.start()
    try:
        assert not watcher_mod.WATCHDOG_AVAILABLE  # env has no watchdog
        _time.sleep(0.3)
        (tmp_path / "a.txt").write_text("hello")
        (tmp_path / "skip.bin").write_text("binary")
        sub = tmp_path / "sub"
        sub.mkdir()
        _time.sleep(0.6)  # let the new-subtree watch register
        (sub / "b.md").write_text("nested")
        _time.sleep(0.6)
        (tmp_path / "a.txt").unlink()
        deadline = _time.time() + 5
        while _time.time() < deadline:
            names = {n for _e, n in events}
            if {"a.txt", "b.md"} <= names and any(
                    e == "deleted" and n == "a.txt" for e, n in events):
                break
            _time.sleep(0.1)
    finally:
        w.stop()
    names = {n for _e, n in events}
    assert "a.txt" in names and "b.md" in names
    assert "skip.bin" not in names
    assert any(e == "deleted" and n == "a.txt" for e, n in events)
