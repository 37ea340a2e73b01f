"""Random-hyperplane LSH as device ops.

Replaces the reference's per-table Python hashing (reference
semantic_cache.py:42-154): the projection H @ q over all tables at once is a
single [tables*bits, D] matmul (reference semantic_cache.py:77 is literally
an 80x384 matvec done row-by-row), followed by sign-bit packing into one
integer signature per table.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def lsh_planes(key: jax.Array, n_tables: int, n_bits: int, dim: int) -> jax.Array:
    """Sample the [n_tables * n_bits, dim] hyperplane matrix once."""
    return jax.random.normal(key, (n_tables * n_bits, dim), dtype=jnp.float32)


@functools.partial(jax.jit, static_argnames=("n_tables", "n_bits"))
def lsh_signatures(
    planes: jax.Array, vectors: jax.Array, n_tables: int, n_bits: int
) -> jax.Array:
    """Hash [B, D] vectors -> [B, n_tables] int32 signatures.

    bit j of table t = sign(planes[t*n_bits + j] . v) (reference
    semantic_cache.py:75-79).
    """
    proj = jnp.dot(
        vectors.astype(jnp.float32), planes.T, preferred_element_type=jnp.float32
    )  # [B, T*K]
    bits = (proj >= 0).astype(jnp.int32)
    B = vectors.shape[0]
    bits = bits.reshape(B, n_tables, n_bits)
    weights = (2 ** jnp.arange(n_bits, dtype=jnp.int32))[None, None, :]
    return jnp.sum(bits * weights, axis=-1)
