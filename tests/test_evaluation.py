"""Evaluation harness + recall-parity + tracing tests."""

import numpy as np
import pytest

from hybridsearch_tpu.evaluation.harness import SearchEvaluator, recall_parity
from hybridsearch_tpu.models.encoder import HashingEncoder
from hybridsearch_tpu.retrieval.searcher import Searcher
from hybridsearch_tpu.utils.tracing import StageTimer, trace_span


@pytest.fixture()
def searcher(demo_docs):
    s = Searcher(encoder=HashingEncoder(dim=128))
    s.indexer.index_documents(demo_docs)
    return s


TEST_SET = [
    {"query": "machine learning data", "relevant_doc_ids": [1, 3]},
    {"query": "cooking pasta salt", "relevant_doc_ids": [5]},
    {"query": "neural networks brains", "relevant_doc_ids": [8, 3]},
]


def test_evaluate_query_fields(searcher):
    ev = SearchEvaluator(searcher, k=5)
    row = ev.evaluate_query("machine learning data", [1, 3])
    assert 0.0 <= row["precision"] <= 1.0
    assert row["recall"] > 0.0  # the relevant docs do surface
    assert row["mrr"] > 0.0
    assert row["latency_s"] > 0.0


def test_evaluate_aggregates(searcher):
    ev = SearchEvaluator(searcher, k=5)
    agg = ev.evaluate(TEST_SET)
    assert agg["queries"] == 3
    assert agg["recall"] > 0.5
    assert "p95_ms" in agg and agg["p50_ms"] > 0
    assert len(agg["per_query"]) == 3


def test_compare_configs(searcher):
    ev = SearchEvaluator(searcher, k=5)
    out = ev.compare_configs(TEST_SET, {
        "semantic": {"semantic_weight": 1.0, "lexical_weight": 0.0},
        "hybrid": {"semantic_weight": 0.7, "lexical_weight": 0.3},
    })
    assert set(out) == {"semantic", "hybrid"}
    assert all("recall" in v for v in out.values())


def test_test_set_from_feedback(searcher):
    searcher.search("machine learning", top_k=2)
    searcher.log_feedback("machine learning", 1, 1)
    searcher.log_feedback("machine learning", 3, 1)
    ev = SearchEvaluator(searcher)
    ts = ev.create_test_set_from_feedback()
    assert ts == [{"query": "machine learning", "relevant_doc_ids": [1, 3]}]


def test_recall_parity_vs_oracle(searcher, demo_docs):
    """The BASELINE.json metric: engine top-k vs NumPy oracle hybrid,
    Jaccard >= 0.99 (exact search should be ~1.0 at this scale)."""
    queries = ["machine learning", "cooking pasta", "neural networks",
               "stock market", "web browsers javascript"]
    out = recall_parity(searcher, queries, k=5)
    assert out["mean_jaccard"] >= 0.99, out
    assert out["min_jaccard"] >= 0.9, out


def test_stage_timer_and_spans(searcher):
    searcher.search("machine learning", top_k=3)
    stats = searcher.get_stats()["stages"]
    assert "encode" in stats
    # default path runs the whole hybrid in one program; the staged path
    # (fuzzy/scatter modes) logs semantic/lexical/fuse_topk separately
    assert "hybrid_fused" in stats or {"semantic", "lexical",
                                       "fuse_topk"} <= set(stats)
    for s in stats.values():
        assert s["count"] >= 1 and s["p50_ms"] >= 0.0


def test_stage_timer_rolling_window():
    t = StageTimer(window=4)
    for i in range(10):
        t.record("x", 0.001 * (i + 1))
    s = t.stats()["x"]
    assert s["count"] == 10
    # window keeps only the last 4 samples (7..10 ms)
    assert s["p50_ms"] >= 7.0


def test_chunked_pipeline_persistence(tmp_path):
    """Chunk registry survives a restart (new in this framework)."""
    from hybridsearch_tpu.pipelines import ChunkedPipeline

    docs = ["First doc. It has sentences. Several of them actually.",
            "Second doc about entirely different gardens and flowers."]
    db = str(tmp_path / "chunks.db")
    enc = HashingEncoder(dim=64)
    p = ChunkedPipeline(encoder=enc, db_path=db,
                        chunker_kwargs={"max_chars": 30})
    p.index(docs)
    before = p.search("gardens flowers", top_k=1).results

    p2 = ChunkedPipeline(encoder=enc, db_path=db,
                         chunker_kwargs={"max_chars": 30})
    n = p2.reload()
    assert n > 2  # chunk rows restored
    assert p2.parents == docs
    after = p2.search("gardens flowers", top_k=1).results
    assert after[0][2] == before[0][2] == 1


def test_train_checkpoint_roundtrip(tmp_path):
    """orbax save/restore of the contrastive train state + encoder export."""
    import numpy as np

    from hybridsearch_tpu.models.bert import BertConfig
    from hybridsearch_tpu.training.checkpoint import (
        load_encoder,
        restore_train_state,
        save_encoder_params,
        save_train_state,
    )
    from hybridsearch_tpu.training.contrastive import ContrastiveTrainer

    cfg = BertConfig(vocab_size=256, hidden_dim=32, num_layers=1, num_heads=2,
                     mlp_dim=64, max_position=32)
    tr = ContrastiveTrainer(cfg=cfg)
    rng = np.random.default_rng(0)
    batch = (rng.integers(0, 256, (8, 8)).astype(np.int32),
             np.ones((8, 8), np.int32),
             rng.integers(0, 256, (8, 8)).astype(np.int32),
             np.ones((8, 8), np.int32))
    tr.train_step(batch)
    save_train_state(str(tmp_path / "ck"), tr.params, tr.opt_state, step=1)
    params, opt_state, step = restore_train_state(str(tmp_path / "ck"))
    assert step == 1
    import jax
    from flax.core import meta

    jax.tree.map(lambda a, b: np.testing.assert_allclose(a, b, atol=1e-6),
                 jax.device_get(meta.unbox(tr.params)), params)

    save_encoder_params(str(tmp_path / "ck"), tr.params)
    enc = load_encoder(str(tmp_path / "ck"), cfg=cfg)
    emb = enc.encode(["hello world"])
    assert emb.shape == (1, 32)


def test_beir_loader_and_evaluate(tmp_path):
    """BEIR-format layout loads and evaluates end-to-end (tiny synthetic
    dataset; real SciFact/MS MARCO plug in the same way when on disk)."""
    import json
    import os

    from hybridsearch_tpu.evaluation.beir import evaluate_beir, load_beir

    root = tmp_path / "beir"
    os.makedirs(root / "qrels")
    corpus = [
        {"_id": "d1", "title": "ML", "text": "machine learning models learn"},
        {"_id": "d2", "title": "", "text": "pasta needs boiling water"},
        {"_id": "d3", "title": "NN", "text": "neural networks have layers"},
    ]
    with open(root / "corpus.jsonl", "w") as f:
        for r in corpus:
            f.write(json.dumps(r) + "\n")
    with open(root / "queries.jsonl", "w") as f:
        f.write(json.dumps({"_id": "q1", "text": "machine learning"}) + "\n")
        f.write(json.dumps({"_id": "q2", "text": "cooking pasta"}) + "\n")
    with open(root / "qrels" / "test.tsv", "w") as f:
        f.write("query-id\tcorpus-id\tscore\n")
        f.write("q1\td1\t1\nq2\td2\t1\nq1\td3\t0\n")

    docs, keys, test_set = load_beir(str(root))
    assert len(docs) == 3 and keys["d2"] == 1
    assert {t["query"]: t["relevant_doc_ids"] for t in test_set} == {
        "machine learning": [0], "cooking pasta": [1],
    }

    s = Searcher(encoder=HashingEncoder(dim=64), use_query_memory=False)
    agg = evaluate_beir(s, str(root), k=2)
    assert agg["docs"] == 3 and agg["queries"] == 2
    assert agg["recall"] == 1.0  # tiny corpus: both relevants retrieved


def test_synth_beir_chain_matches_pinned_metrics(tmp_path):
    """The full quality path — synthetic-BEIR generator -> disk -> BEIR
    loader -> Indexer -> hybrid Searcher -> SearchEvaluator — must
    reproduce the pinned metrics (benchmarks/expected_synth_beir.json).
    This is the tested stand-in for BASELINE configs 2-4 until real
    SciFact/NFCorpus/MS MARCO corpora are on disk (zero egress); real
    datasets run through the identical chain via evaluate_beir(root)."""
    import json as _json
    import os

    from hybridsearch_tpu.evaluation.beir import evaluate_beir
    from hybridsearch_tpu.evaluation.synth_beir import generate_synth_beir

    pins = _json.load(open(
        os.path.join(os.path.dirname(__file__), "..", "benchmarks",
                     "expected_synth_beir.json")))
    root = generate_synth_beir(str(tmp_path / "beir"))
    # generator determinism: same seed -> byte-identical corpus file
    import hashlib

    h1 = hashlib.sha256(
        open(os.path.join(root, "corpus.jsonl"), "rb").read()).hexdigest()
    root2 = generate_synth_beir(str(tmp_path / "beir2"))
    h2 = hashlib.sha256(
        open(os.path.join(root2, "corpus.jsonl"), "rb").read()).hexdigest()
    assert h1 == h2

    s = Searcher(encoder=HashingEncoder(dim=128), use_query_memory=False)
    agg = evaluate_beir(s, root, k=pins["config"]["k"])
    for name, want in pins["metrics"].items():
        got = float(agg[name])
        assert abs(got - want) <= pins["tol"], (
            f"{name}: got {got:.4f}, pinned {want} +/- {pins['tol']}")
