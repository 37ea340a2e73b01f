"""Numerical validation of the HF torch -> Flax weight conversion.

The reference runs sentence-transformers all-MiniLM-L6-v2 end-to-end
(reference core.py:118,238; indexer.py:229-243) and the ms-marco cross-
encoder (reference reranker.py:19,74). This environment has no real
checkpoints and no egress, so these tests construct a *tiny* random BERT
checkpoint in sentence-transformers on-disk layout (pytorch_model.bin +
vocab.txt) with `transformers`' own torch BertModel, load it through the
production path (find_checkpoint -> load_checkpoint_params ->
MiniLMEncoder.encode / MiniLMCrossEncoder.predict), and compare against the
torch forward pass bit-for-bit semantics (embeddings + N layers + masked
mean pooling + L2 norm / CLS pooler + regression head).

A transposed kernel, wrong LayerNorm epsilon, tanh-vs-erf GELU mismatch, or
broken mean-pool masking all fail these at the 1e-4 tolerance.
"""

from __future__ import annotations

import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp  # noqa: E402

from hybridsearch_tpu.models.bert import BertConfig  # noqa: E402
from hybridsearch_tpu.models.minilm import (  # noqa: E402
    MiniLMCrossEncoder,
    MiniLMEncoder,
    find_checkpoint,
)

# Tiny-but-real geometry: 2 layers, 32 hidden, 4 heads, 64 MLP.
VOCAB = (
    ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"]
    + ["the", "quick", "brown", "fox", "jump", "over", "lazy", "dog"]
    + ["search", "engine", "hybrid", "dense", "sparse", "query", "doc"]
    + ["##s", "##ing", "##er", "##es", "##ed", ".", ",", "!", "?"]
)

TEXTS = [
    "the quick brown fox jumps over the lazy dog.",
    "hybrid search engines fuse dense and sparse queries",
    "dog!",
    "the the the",
]


def _tiny_torch_config():
    return transformers.BertConfig(
        vocab_size=len(VOCAB),
        hidden_size=32,
        num_hidden_layers=2,
        num_attention_heads=4,
        intermediate_size=64,
        max_position_embeddings=64,
        type_vocab_size=2,
        hidden_act="gelu",
        layer_norm_eps=1e-12,
        hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
    )


def _flax_config(dtype) -> BertConfig:
    return BertConfig(
        vocab_size=len(VOCAB),
        hidden_dim=32,
        num_layers=2,
        num_heads=4,
        mlp_dim=64,
        max_position=64,
        dtype=dtype,
    )


def _write_checkpoint(tmp_path, model, subdir: str) -> str:
    ckpt = tmp_path / subdir
    ckpt.mkdir(parents=True)
    torch.save(model.state_dict(), ckpt / "pytorch_model.bin")
    (ckpt / "vocab.txt").write_text("\n".join(VOCAB) + "\n", encoding="utf-8")
    return str(ckpt)


@pytest.fixture()
def bi_checkpoint(tmp_path):
    torch.manual_seed(0)
    model = transformers.BertModel(_tiny_torch_config())
    model.eval()
    return _write_checkpoint(tmp_path, model, "all-MiniLM-L6-v2"), model


@pytest.fixture()
def cross_checkpoint(tmp_path):
    torch.manual_seed(1)
    cfg = _tiny_torch_config()
    cfg.num_labels = 1
    model = transformers.BertForSequenceClassification(cfg)
    model.eval()
    return _write_checkpoint(tmp_path, model, "ms-marco-MiniLM-L-6-v2"), model


def _torch_bi_oracle(model, ids: np.ndarray, mask: np.ndarray) -> np.ndarray:
    """sentence-transformers recipe: trunk -> masked mean pool -> L2 norm."""
    with torch.no_grad():
        out = model(
            input_ids=torch.from_numpy(ids).long(),
            attention_mask=torch.from_numpy(mask).long(),
        ).last_hidden_state
        m = torch.from_numpy(mask).float().unsqueeze(-1)
        pooled = (out * m).sum(1) / m.sum(1).clamp(min=1e-9)
        pooled = pooled / pooled.norm(dim=-1, keepdim=True).clamp(min=1e-12)
    return pooled.numpy()


def test_biencoder_matches_torch_fp32(bi_checkpoint):
    ckpt, torch_model = bi_checkpoint
    enc = MiniLMEncoder(
        dim=32, cfg=_flax_config(jnp.float32), max_seq_len=32, checkpoint=ckpt
    )
    assert enc.pretrained
    ours = enc.encode(TEXTS, batch_size=8)
    ids, mask = enc.tokenizer.batch_encode(TEXTS, 32)
    ref = _torch_bi_oracle(torch_model, ids, mask)
    np.testing.assert_allclose(ours, ref, atol=1e-4, rtol=1e-4)


def test_biencoder_bf16_close_to_torch(bi_checkpoint):
    """The production activation dtype (bf16) stays directionally faithful:
    per-row cosine vs the fp32 torch oracle >= 0.995."""
    ckpt, torch_model = bi_checkpoint
    enc = MiniLMEncoder(
        dim=32, cfg=_flax_config(jnp.bfloat16), max_seq_len=32, checkpoint=ckpt
    )
    ours = enc.encode(TEXTS, batch_size=8)
    ids, mask = enc.tokenizer.batch_encode(TEXTS, 32)
    ref = _torch_bi_oracle(torch_model, ids, mask)
    cos = np.sum(ours * ref, axis=-1) / (
        np.linalg.norm(ours, axis=-1) * np.linalg.norm(ref, axis=-1)
    )
    assert cos.min() >= 0.995, cos


def test_crossencoder_matches_torch_fp32(cross_checkpoint):
    ckpt, torch_model = cross_checkpoint
    ce = MiniLMCrossEncoder(
        dim=32, cfg=_flax_config(jnp.float32), max_seq_len=32, checkpoint=ckpt
    )
    assert ce.pretrained
    pairs = [
        ("quick fox query", "the quick brown fox jumps over the lazy dog."),
        ("dense search", "hybrid search engines fuse dense and sparse queries"),
        ("lazy dog", "dog!"),
    ]
    ours = ce.predict(pairs, batch_size=8)
    ids, types, mask = ce.tokenizer.batch_encode_pairs(pairs, 32)
    with torch.no_grad():
        logits = torch_model(
            input_ids=torch.from_numpy(ids).long(),
            attention_mask=torch.from_numpy(mask).long(),
            token_type_ids=torch.from_numpy(types).long(),
        ).logits[:, 0]
    np.testing.assert_allclose(ours, logits.numpy(), atol=1e-4, rtol=1e-4)


def test_mean_pool_masking_respected(bi_checkpoint):
    """Padding tokens must not leak into the pooled embedding: the same text
    encoded alone and inside a batch with a much longer neighbor (=> heavy
    padding) must produce the same vector."""
    ckpt, _ = bi_checkpoint
    enc = MiniLMEncoder(
        dim=32, cfg=_flax_config(jnp.float32), max_seq_len=32, checkpoint=ckpt
    )
    alone = enc.encode(["dog!"])[0]
    padded = enc.encode(["dog!", "the quick brown fox jumps over the lazy dog."])[0]
    np.testing.assert_allclose(alone, padded, atol=1e-5)


def test_find_checkpoint_discovers_model_dir(bi_checkpoint, monkeypatch, tmp_path):
    ckpt, _ = bi_checkpoint
    monkeypatch.setenv("HST_MODEL_DIR", str(tmp_path))
    monkeypatch.setenv("HST_CKPT_DISCOVERY", "1")
    assert find_checkpoint("all-MiniLM-L6-v2") == ckpt
    assert find_checkpoint("no-such-model") is None


def test_tokenizer_parity_with_hf_wordpiece(tmp_path):
    """First-party WordPiece must produce the same ids as transformers'
    BertTokenizer over the same vocab file (reference gets this for free
    from sentence-transformers)."""
    vocab_path = tmp_path / "vocab.txt"
    vocab_path.write_text("\n".join(VOCAB) + "\n", encoding="utf-8")
    from hybridsearch_tpu.models.tokenizer import BertTokenizer

    ours = BertTokenizer(vocab_path=str(vocab_path))
    theirs = transformers.BertTokenizer(str(vocab_path), do_lower_case=True)
    for text in TEXTS + ["Jumping foxes... QUERIES!", "unknownword dog"]:
        got = ours.encode(text, max_len=64)
        want = theirs.encode(text, truncation=True, max_length=64)
        assert got == want, (text, got, want)
