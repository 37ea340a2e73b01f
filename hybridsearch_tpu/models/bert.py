"""Flax MiniLM-class transformer encoder (BERT architecture).

The TPU-native replacement for the reference's torch sentence-transformers
models (bi-encoder all-MiniLM-L6-v2, reference core.py:118 /
indexer.py:229-243; cross-encoder ms-marco-MiniLM-L-6-v2, reference
reranker.py:19-89). Written in flax.linen with bfloat16 activations for the
MXU, static shapes, and mean-pooling/CLS heads. Weights load from a real HF
checkpoint directory when one exists (models/minilm.py) or initialize
deterministically for from-scratch training (training/contrastive.py).

Sharding: parameters carry logical axis annotations via
nn.with_partitioning on the FFN and attention projections so the model axis
("model") can shard the intermediate dims under a mesh (used by the bulk
encode path and the training step).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from hybridsearch_tpu.parallel.mesh import MODEL_AXIS


@dataclasses.dataclass(frozen=True)
class BertConfig:
    vocab_size: int = 30522
    hidden_dim: int = 384
    num_layers: int = 6
    num_heads: int = 12
    mlp_dim: int = 1536
    max_position: int = 512
    type_vocab_size: int = 2
    layer_norm_eps: float = 1e-12
    dtype: jnp.dtype = jnp.bfloat16  # activation dtype (params stay fp32)

    @property
    def head_dim(self) -> int:
        return self.hidden_dim // self.num_heads


def _dense(features: int, dtype, name: str, shard_out: bool = False,
           shard_in: bool = False):
    """Dense layer with optional model-axis partitioning annotation."""
    kernel_init = nn.initializers.normal(stddev=0.02)
    if shard_out:
        kernel_init = nn.with_partitioning(kernel_init, (None, MODEL_AXIS))
    elif shard_in:
        kernel_init = nn.with_partitioning(kernel_init, (MODEL_AXIS, None))
    return nn.Dense(features, dtype=dtype, kernel_init=kernel_init, name=name)


class SelfAttention(nn.Module):
    cfg: BertConfig

    @nn.compact
    def __call__(self, x: jax.Array, mask: jax.Array) -> jax.Array:
        cfg = self.cfg
        B, L, H = x.shape
        q = _dense(H, cfg.dtype, "query", shard_out=True)(x)
        k = _dense(H, cfg.dtype, "key", shard_out=True)(x)
        v = _dense(H, cfg.dtype, "value", shard_out=True)(x)

        def split(t):
            return t.reshape(B, L, cfg.num_heads, cfg.head_dim).transpose(0, 2, 1, 3)

        q, k, v = split(q), split(k), split(v)
        scores = jnp.einsum(
            "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
        ) / jnp.sqrt(jnp.float32(cfg.head_dim))
        neg = jnp.finfo(jnp.float32).min
        scores = jnp.where(mask[:, None, None, :] > 0, scores, neg)
        probs = jax.nn.softmax(scores, axis=-1).astype(cfg.dtype)
        ctx = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
        ctx = ctx.transpose(0, 2, 1, 3).reshape(B, L, H)
        out = _dense(H, cfg.dtype, "out", shard_in=True)(ctx)
        return out


class TransformerLayer(nn.Module):
    cfg: BertConfig

    @nn.compact
    def __call__(self, x: jax.Array, mask: jax.Array) -> jax.Array:
        cfg = self.cfg
        attn = SelfAttention(cfg, name="attention")(x, mask)
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=jnp.float32,
                         name="attn_ln")(x + attn)
        h = _dense(cfg.mlp_dim, cfg.dtype, "mlp_in", shard_out=True)(x)
        h = nn.gelu(h, approximate=False)
        h = _dense(cfg.hidden_dim, cfg.dtype, "mlp_out", shard_in=True)(h)
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=jnp.float32,
                         name="mlp_ln")(x + h)
        return x


class BertEncoder(nn.Module):
    """Trunk: embeddings + N transformer layers -> [B, L, H] states."""

    cfg: BertConfig

    @nn.compact
    def __call__(
        self,
        input_ids: jax.Array,
        attention_mask: jax.Array,
        token_type_ids: Optional[jax.Array] = None,
    ) -> jax.Array:
        cfg = self.cfg
        B, L = input_ids.shape
        word = nn.Embed(cfg.vocab_size, cfg.hidden_dim, dtype=cfg.dtype,
                        name="word_embeddings")(input_ids)
        pos_ids = jnp.arange(L)[None, :]
        pos = nn.Embed(cfg.max_position, cfg.hidden_dim, dtype=cfg.dtype,
                       name="position_embeddings")(pos_ids)
        if token_type_ids is None:
            token_type_ids = jnp.zeros_like(input_ids)
        typ = nn.Embed(cfg.type_vocab_size, cfg.hidden_dim, dtype=cfg.dtype,
                       name="token_type_embeddings")(token_type_ids)
        x = word + pos + typ
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=jnp.float32,
                         name="embed_ln")(x)
        x = x.astype(cfg.dtype)
        for i in range(cfg.num_layers):
            x = TransformerLayer(cfg, name=f"layer_{i}")(x, attention_mask)
        return x


class BiEncoder(nn.Module):
    """Sentence embedding model: trunk + masked mean pooling + L2 norm
    (the sentence-transformers MiniLM recipe)."""

    cfg: BertConfig

    @nn.compact
    def __call__(self, input_ids: jax.Array, attention_mask: jax.Array) -> jax.Array:
        states = BertEncoder(self.cfg, name="bert")(input_ids, attention_mask)
        m = attention_mask[..., None].astype(jnp.float32)
        pooled = jnp.sum(states.astype(jnp.float32) * m, axis=1) / jnp.maximum(
            jnp.sum(m, axis=1), 1e-9
        )
        norm = jnp.sqrt(jnp.sum(pooled * pooled, axis=-1, keepdims=True))
        return pooled / jnp.maximum(norm, 1e-12)


class CrossEncoder(nn.Module):
    """(query, doc) relevance scorer: trunk + CLS pooler + regression head
    (the ms-marco MiniLM cross-encoder recipe, reference reranker.py:50-89)."""

    cfg: BertConfig

    @nn.compact
    def __call__(
        self,
        input_ids: jax.Array,
        attention_mask: jax.Array,
        token_type_ids: jax.Array,
    ) -> jax.Array:
        states = BertEncoder(self.cfg, name="bert")(
            input_ids, attention_mask, token_type_ids
        )
        cls = states[:, 0, :].astype(jnp.float32)
        pooled = jnp.tanh(
            nn.Dense(self.cfg.hidden_dim, dtype=jnp.float32, name="pooler")(cls)
        )
        logit = nn.Dense(1, dtype=jnp.float32, name="classifier")(pooled)
        return logit[:, 0]
