"""Score normalization and hybrid fusion ops.

Parity targets:
  - min-max normalize with the reference's constant-score edge case: when
    max == min the reference returns all-ones (reference utils.py:57-71).
  - weighted fusion hybrid = sem*w_s + lex*w_l (reference core.py:264-271).
  - HybridBM25Pipeline's max-normalization (not min-max)
    (reference pipelines.py:315-343).
  - Reciprocal-rank fusion as an extra (mentioned in the reference README's
    fusion discussion; standard RRF with c=60).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def minmax_normalize(scores: jax.Array, axis: int = -1, eps: float = 1e-12) -> jax.Array:
    """Min-max normalize to [0, 1]; constant input maps to all-ones
    (reference utils.py:57-71)."""
    s = scores.astype(jnp.float32)
    mn = jnp.min(s, axis=axis, keepdims=True)
    mx = jnp.max(s, axis=axis, keepdims=True)
    rng = mx - mn
    return jnp.where(rng > eps, (s - mn) / jnp.maximum(rng, eps), jnp.ones_like(s))


def max_normalize(scores: jax.Array, axis: int = -1, eps: float = 1e-12) -> jax.Array:
    """Divide by max (reference pipelines.py:334-343 normalizes by max only)."""
    s = scores.astype(jnp.float32)
    mx = jnp.max(s, axis=axis, keepdims=True)
    return jnp.where(mx > eps, s / jnp.maximum(mx, eps), s)


def weighted_fusion(
    semantic: jax.Array,
    lexical: jax.Array,
    semantic_weight: float | jax.Array = 0.7,
    lexical_weight: float | jax.Array = 0.3,
    normalize: str = "minmax",
) -> jax.Array:
    """hybrid = norm(sem)*w_s + norm(lex)*w_l (reference core.py:264-268).

    normalize: "minmax" (Searcher semantics), "max" (HybridBM25Pipeline
    semantics), or "none".
    """
    if normalize == "minmax":
        semantic, lexical = minmax_normalize(semantic), minmax_normalize(lexical)
    elif normalize == "max":
        semantic, lexical = max_normalize(semantic), max_normalize(lexical)
    return semantic * semantic_weight + lexical * lexical_weight


def rrf_fusion(scores_a: jax.Array, scores_b: jax.Array, c: float = 60.0) -> jax.Array:
    """Reciprocal-rank fusion over two score arrays (row-wise ranks)."""

    def ranks(s):
        # rank[i] = position of element i in the descending sort order
        order = jnp.argsort(-s, axis=-1)
        return jnp.argsort(order, axis=-1)

    ra, rb = ranks(scores_a.astype(jnp.float32)), ranks(scores_b.astype(jnp.float32))
    return 1.0 / (c + ra.astype(jnp.float32) + 1.0) + 1.0 / (c + rb.astype(jnp.float32) + 1.0)


def validate_weights(semantic_weight: float, lexical_weight: float) -> None:
    """Weights must sum to 1.0 or ValueError (reference core.py:232-233)."""
    if abs(semantic_weight + lexical_weight - 1.0) > 1e-6:
        raise ValueError(
            f"semantic_weight + lexical_weight must equal 1.0, got "
            f"{semantic_weight} + {lexical_weight}"
        )
