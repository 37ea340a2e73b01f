"""Flax MiniLM trunk, tokenizer, and wrapper tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hybridsearch_tpu.models.minilm import MiniLMCrossEncoder, MiniLMEncoder
from hybridsearch_tpu.models.tokenizer import BertTokenizer, basic_tokenize


def test_basic_tokenize():
    assert basic_tokenize("Hello, World!") == ["hello", ",", "world", "!"]
    assert basic_tokenize("café") == ["cafe"]  # accent stripped


def test_tokenizer_hashed_vocab_roundtrip():
    tok = BertTokenizer()
    ids = tok.encode("machine learning")
    assert ids[0] == tok.vocab.cls_id and ids[-1] == tok.vocab.sep_id
    assert len(ids) == 4
    # determinism
    assert tok.encode("machine learning") == ids


def test_tokenizer_batch_padding():
    tok = BertTokenizer()
    ids, mask = tok.batch_encode(["a b c", "a"], max_len=64)
    assert ids.shape == mask.shape
    assert ids.shape[1] % 8 == 0
    assert mask[0].sum() > mask[1].sum()


def test_tokenizer_pair_type_ids():
    tok = BertTokenizer()
    ids, types, mask = tok.batch_encode_pairs([("what is ml", "ml is learning")])
    assert set(np.unique(types[mask.astype(bool)])) <= {0, 1}
    assert types[0, 0] == 0 and types[0][mask[0].astype(bool)][-1] == 1


@pytest.fixture(scope="module")
def bi():
    from hybridsearch_tpu.models.bert import BertConfig

    cfg = BertConfig(vocab_size=1000, hidden_dim=64, num_layers=2, num_heads=4,
                     mlp_dim=128)
    return MiniLMEncoder(dim=64, cfg=cfg, max_seq_len=64)


def test_biencoder_shapes_and_norm(bi):
    emb = bi.encode(["machine learning", "a longer sentence about cooking pasta"])
    assert emb.shape == (2, 64)
    np.testing.assert_allclose(np.linalg.norm(emb, axis=1), [1.0, 1.0], atol=1e-3)


def test_biencoder_deterministic(bi):
    e1 = bi.encode(["hello world"])
    e2 = bi.encode(["hello world"])
    np.testing.assert_allclose(e1, e2, atol=1e-6)


def test_biencoder_padding_invariance(bi):
    """Embeddings must not depend on batch-mates (mask correctness)."""
    alone = bi.encode(["machine learning"])[0]
    together = bi.encode(["machine learning", "totally different text here " * 5])[0]
    np.testing.assert_allclose(alone, together, atol=1e-3)


def test_cross_encoder_scores(bi):
    from hybridsearch_tpu.models.bert import BertConfig

    cfg = BertConfig(vocab_size=1000, hidden_dim=64, num_layers=2, num_heads=4,
                     mlp_dim=128)
    ce = MiniLMCrossEncoder(cfg=cfg, dim=64, max_seq_len=64)
    scores = ce.predict([("query", "doc one"), ("query", "doc two")])
    assert scores.shape == (2,)
    s2 = ce.predict([("query", "doc one"), ("query", "doc two")])
    np.testing.assert_allclose(scores, s2, atol=1e-5)


def test_cross_encoder_length_sorted_order_preserved(bi):
    """predict() length-sorts pairs into chunks internally; scores must
    come back in the CALLER's order, identical to scoring each pair in a
    same-length batch by itself."""
    from hybridsearch_tpu.models.bert import BertConfig

    cfg = BertConfig(vocab_size=1000, hidden_dim=64, num_layers=2,
                     num_heads=4, mlp_dim=128)
    ce = MiniLMCrossEncoder(cfg=cfg, dim=64, max_seq_len=64)
    pairs = [
        ("q", "short doc"),
        ("q", "a considerably longer document " * 6),
        ("q", "mid length document text here"),
        ("q", "x"),
    ]
    mixed = ce.predict(pairs, batch_size=2)  # forces multiple chunks
    singles = np.array([ce.predict([p])[0] for p in pairs])
    np.testing.assert_allclose(mixed, singles, atol=1e-3)


def test_hf_conversion_shapes():
    """torch->flax mapping produces params accepted by the flax module."""
    import jax
    import jax.numpy as jnp

    from hybridsearch_tpu.models.bert import BertConfig, BiEncoder
    from hybridsearch_tpu.models.minilm import convert_hf_bert

    cfg = BertConfig(vocab_size=100, hidden_dim=32, num_layers=1, num_heads=2,
                     mlp_dim=64, max_position=64)
    rng = np.random.default_rng(0)

    def t(*shape):
        return rng.standard_normal(shape).astype(np.float32)

    sd = {
        "embeddings.word_embeddings.weight": t(100, 32),
        "embeddings.position_embeddings.weight": t(64, 32),
        "embeddings.token_type_embeddings.weight": t(2, 32),
        "embeddings.LayerNorm.weight": t(32),
        "embeddings.LayerNorm.bias": t(32),
    }
    b = "encoder.layer.0."
    for lin in ("attention.self.query", "attention.self.key",
                "attention.self.value", "attention.output.dense"):
        sd[b + lin + ".weight"] = t(32, 32)
        sd[b + lin + ".bias"] = t(32)
    sd[b + "intermediate.dense.weight"] = t(64, 32)
    sd[b + "intermediate.dense.bias"] = t(64)
    sd[b + "output.dense.weight"] = t(32, 64)
    sd[b + "output.dense.bias"] = t(32)
    for ln in ("attention.output.LayerNorm", "output.LayerNorm"):
        sd[b + ln + ".weight"] = t(32)
        sd[b + ln + ".bias"] = t(32)

    params = {"params": {"bert": convert_hf_bert(sd, cfg)}}
    model = BiEncoder(cfg)
    ids = jnp.asarray([[2, 5, 3]], dtype=jnp.int32)
    mask = jnp.ones((1, 3), jnp.int32)
    out = model.apply(params, ids, mask)
    assert out.shape == (1, 32)
    assert np.isfinite(np.asarray(out)).all()


# -- native (in-repo trained) checkpoints ---------------------------------------


def test_native_checkpoint_roundtrip(tmp_path):
    """save_trained_checkpoint -> find_checkpoint -> MiniLMEncoder must
    serve the exact trained params (the real-weights path when no HF
    checkpoint can be downloaded; scripts/train_encoder.py)."""
    from hybridsearch_tpu.models.bert import BertConfig, BiEncoder
    from hybridsearch_tpu.models.minilm import (
        MiniLMEncoder,
        find_checkpoint,
        save_trained_checkpoint,
    )

    cfg = BertConfig(vocab_size=512, hidden_dim=64, num_layers=1,
                     num_heads=2, mlp_dim=128, max_position=64)
    model = BiEncoder(cfg)
    params = model.init(jax.random.PRNGKey(3),
                        jnp.zeros((1, 4), jnp.int32),
                        jnp.ones((1, 4), jnp.int32))
    ckpt = str(tmp_path / "hst-MiniLM-tiny")
    save_trained_checkpoint(params, cfg, ckpt, note="test")

    import os

    os.environ["HST_MODEL_DIR"] = str(tmp_path)
    os.environ["HST_CKPT_DISCOVERY"] = "1"
    try:
        assert find_checkpoint("MiniLM-tiny") == ckpt
        enc = MiniLMEncoder(name="MiniLM-tiny", checkpoint=ckpt)
        assert enc.pretrained and enc.weights_origin == "in-repo-trained"
        assert enc.dim == 64  # weights define the width
        emb = enc.encode(["hello there", "general kenobi"])
        assert emb.shape == (2, 64)
        # same params -> same outputs as a direct apply through the
        # loaded tree
        leaves_a = jax.tree_util.tree_leaves(params)
        leaves_b = jax.tree_util.tree_leaves(enc.params)
        assert all(np.allclose(np.asarray(a), np.asarray(b))
                   for a, b in zip(leaves_a, leaves_b))
    finally:
        os.environ.pop("HST_MODEL_DIR", None)
        os.environ["HST_CKPT_DISCOVERY"] = "0"


def test_default_encoder_resolution_gates(tmp_path, monkeypatch):
    """default_encoder: HST_ENCODER pins the kind; auto only serves a
    discovered checkpoint whose width matches the requested dim."""
    from hybridsearch_tpu.models.bert import BertConfig, BiEncoder
    from hybridsearch_tpu.models.encoder import HashingEncoder, default_encoder
    from hybridsearch_tpu.models.minilm import (
        MiniLMEncoder,
        save_trained_checkpoint,
    )

    cfg = BertConfig(vocab_size=512, hidden_dim=64, num_layers=1,
                     num_heads=2, mlp_dim=128, max_position=64)
    model = BiEncoder(cfg)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 4), jnp.int32),
                        jnp.ones((1, 4), jnp.int32))
    save_trained_checkpoint(params, cfg, str(tmp_path / "hst-MiniLM-g"))

    monkeypatch.setenv("HST_MODEL_DIR", str(tmp_path))
    monkeypatch.setenv("HST_CKPT_DISCOVERY", "1")
    # auto + matching dim -> serves the checkpoint
    monkeypatch.setenv("HST_ENCODER", "auto")
    enc = default_encoder(dim=64)
    assert isinstance(enc, MiniLMEncoder) and enc.pretrained
    # auto + mismatched dim -> the requested space wins (hashing)
    assert isinstance(default_encoder(dim=384), HashingEncoder)
    # explicit hashing pin beats an available checkpoint
    monkeypatch.setenv("HST_ENCODER", "hashing")
    assert isinstance(default_encoder(dim=64), HashingEncoder)


def test_explicit_cfg_pins_architecture(tmp_path):
    """An explicit cfg must NEVER be overridden by a discovered
    checkpoint: the caller asked for THAT architecture (the repo ships a
    trained 384-dim checkpoint under ./models, and tests/benches that
    build tiny deterministic models must stay tiny)."""
    from hybridsearch_tpu.models.bert import BertConfig
    from hybridsearch_tpu.models.minilm import MiniLMEncoder

    cfg = BertConfig(vocab_size=500, hidden_dim=32, num_layers=1,
                     num_heads=2, mlp_dim=64)
    enc = MiniLMEncoder(dim=32, cfg=cfg, max_seq_len=32)
    assert not enc.pretrained
    assert enc.encode(["x"]).shape == (1, 32)
