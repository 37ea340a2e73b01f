"""Concurrency (atomic snapshot swap) and training-convergence tests."""

import threading
import time

import numpy as np
import pytest

from hybridsearch_tpu.models.encoder import HashingEncoder
from hybridsearch_tpu.retrieval.searcher import Searcher


def test_search_during_concurrent_adds(demo_docs):
    """Readers never see a torn index while a writer appends (the reference
    mutates globals without a lock, SURVEY §5.2; here mutations are atomic
    snapshot swaps)."""
    s = Searcher(encoder=HashingEncoder(dim=64), use_query_memory=False)
    s.indexer.index_documents(demo_docs)
    errors = []
    stop = threading.Event()

    def reader():
        import traceback

        while not stop.is_set():
            try:
                results = s.search("machine learning", top_k=3, log=False)
                assert len(results) >= 1
                for _score, content, doc_id in results:
                    # content must always correspond to a live doc id
                    assert s.indexer.contents[doc_id] == content
            except Exception:  # pragma: no cover
                errors.append(traceback.format_exc())
                return

    threads = [threading.Thread(target=reader) for _ in range(3)]
    for t in threads:
        t.start()
    try:
        for i in range(8):
            s.indexer.add_documents([f"new document number {i} about topics"])
            time.sleep(0.02)
    finally:
        stop.set()
        for t in threads:
            t.join(timeout=10)
    assert not errors, errors
    assert s.indexer.dense.n_docs == len(demo_docs) + 8


def test_contrastive_training_converges():
    """Loss decreases over a few steps on a tiny fixed batch."""
    from hybridsearch_tpu.models.bert import BertConfig
    from hybridsearch_tpu.training.contrastive import ContrastiveTrainer

    cfg = BertConfig(vocab_size=128, hidden_dim=32, num_layers=1, num_heads=2,
                     mlp_dim=64, max_position=32)
    tr = ContrastiveTrainer(cfg=cfg, learning_rate=1e-3)
    rng = np.random.default_rng(0)
    batch = (rng.integers(0, 128, (8, 8)).astype(np.int32),
             np.ones((8, 8), np.int32),
             rng.integers(0, 128, (8, 8)).astype(np.int32),
             np.ones((8, 8), np.int32))
    losses = [tr.train_step(batch) for _ in range(8)]
    assert losses[-1] < losses[0]
    assert all(np.isfinite(l) for l in losses)


def test_benchmark_configs_run():
    """The five BASELINE configs execute and report sane numbers (tiny)."""
    from benchmarks.run_configs import CONFIGS

    r1 = CONFIGS[1](200)
    assert r1["ml_docs_surfaced"] is True
    r2 = CONFIGS[2](200)
    assert r2["topic_precision@10"] > 0.8
    r3 = CONFIGS[3](200)
    assert r3["jaccard_vs_oracle"] >= 0.99
    # funnel smoke (tiny deterministic CE under HST_CKPT_DISCOVERY=0):
    # shape preserved end-to-end and the row carries CE provenance
    r4 = CONFIGS[4](200)
    assert r4["funnel"] == [100, 20, 5]
    assert r4["ce_weights_origin"] == "random"
    assert 0.0 <= r4["topic_precision@5"] <= 1.0


def test_cross_encoder_training_learns_separation():
    """Pointwise BCE training (training/cross.py — the ms-marco
    cross-encoder recipe, reference reranker.py:19) must drive relevant
    pairs' logits above irrelevant pairs' on a tiny separable task."""
    from hybridsearch_tpu.models.bert import BertConfig
    from hybridsearch_tpu.training.cross import CrossEncoderTrainer

    cfg = BertConfig(vocab_size=64, hidden_dim=32, num_layers=1,
                     num_heads=2, mlp_dim=64, max_position=16)
    tr = CrossEncoderTrainer(cfg=cfg, learning_rate=3e-3)
    rng = np.random.default_rng(1)
    # relevant = query token repeated in the doc half; irrelevant = no
    # overlap. token_type marks the halves.
    B, L = 16, 8
    types = np.concatenate([np.zeros((B, L // 2), np.int32),
                            np.ones((B, L // 2), np.int32)], axis=1)
    mask = np.ones((B, L), np.int32)

    def batch():
        qtok = rng.integers(5, 32, (B, 1)).astype(np.int32)
        labels = (np.arange(B) % 2).astype(np.float32)
        dtok = np.where(labels[:, None] > 0.5, qtok,
                        rng.integers(33, 60, (B, 1))).astype(np.int32)
        ids = np.concatenate([np.repeat(qtok, L // 2, 1),
                              np.repeat(dtok, L // 2, 1)], axis=1)
        return (ids, mask, types, labels)

    losses = [tr.train_step(batch()) for _ in range(30)]
    assert losses[-1] < losses[0]
    ids, m, t, labels = batch()
    import jax.numpy as jnp

    logits = np.asarray(tr.model.apply(
        tr.params, jnp.asarray(ids), jnp.asarray(m), jnp.asarray(t)))
    assert logits[labels > 0.5].mean() > logits[labels < 0.5].mean()


def test_cross_encoder_native_checkpoint_roundtrip(tmp_path):
    """Trained CE params persist and resolve through MiniLMCrossEncoder
    exactly like the bi-encoder's native checkpoints
    (scripts/train_cross_encoder.py -> CrossEncoderReranker)."""
    from hybridsearch_tpu.models.bert import BertConfig
    from hybridsearch_tpu.models.minilm import (
        MiniLMCrossEncoder,
        save_trained_checkpoint,
    )
    from hybridsearch_tpu.training.cross import CrossEncoderTrainer

    cfg = BertConfig(vocab_size=64, hidden_dim=32, num_layers=1,
                     num_heads=2, mlp_dim=64, max_position=32)
    tr = CrossEncoderTrainer(cfg=cfg)
    ckpt = str(tmp_path / "hst-ce-tiny")
    save_trained_checkpoint(tr.params, cfg, ckpt, note="test")
    ce = MiniLMCrossEncoder(checkpoint=ckpt)
    assert ce.pretrained and ce.weights_origin == "in-repo-trained"
    scores = ce.predict([("a query", "a doc"), ("a query", "other")])
    assert scores.shape == (2,) and np.isfinite(scores).all()
