"""Dense retrieval kernels: cosine scoring and fused streaming top-k.

TPU-native replacement for the reference's two dense paths:
  - numba brute-force cosine loops (reference utils.py:5-54)
  - FAISS IndexFlatIP exact inner-product search (reference indexer.py:20-67)

A FAISS *flat* index is exactly a matmul: with L2-normalized embeddings,
inner product == cosine. The design here streams the document matrix
through the MXU in blocks and keeps a running top-k on chip, so the
full [B, N] score matrix is never materialized in HBM — the kernel is
HBM-bandwidth-bound on reading the doc matrix once, which is the
speed-of-light for exact search.

Two implementations:
  - `scan_dense_topk`: lax.scan over doc blocks (pure XLA; fuses
    matmul + per-block top-k merge; runs on CPU for tests).
  - `pallas_dense_topk` (ops/pallas_topk.py): hand-written Pallas kernel
    with an in-VMEM running top-k (TPU only).
`dense_topk` dispatches between them.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

NEG_INF = jnp.float32(-jnp.inf)


def l2_normalize(x: jax.Array, axis: int = -1, eps: float = 1e-12) -> jax.Array:
    """L2-normalize along `axis` (reference indexer.py:43 faiss.normalize_L2)."""
    norm = jnp.sqrt(jnp.sum(jnp.square(x.astype(jnp.float32)), axis=axis, keepdims=True))
    return (x / jnp.maximum(norm, eps)).astype(x.dtype)


def cosine_scores(queries: jax.Array, docs: jax.Array) -> jax.Array:
    """Full [B, N] cosine score matrix (small-N path).

    Equivalent to the reference's batch_cosine_sim (utils.py:28) over raw
    (not pre-normalized) vectors.
    """
    q = l2_normalize(queries.astype(jnp.float32))
    d = l2_normalize(docs.astype(jnp.float32))
    return jnp.dot(q, d.T, preferred_element_type=jnp.float32)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@functools.partial(jax.jit, static_argnames=("k", "block_n", "normalized"))
def scan_dense_topk(
    queries: jax.Array,
    docs: jax.Array,
    k: int,
    block_n: int = 4096,
    normalized: bool = True,
    bias: jax.Array | None = None,
) -> Tuple[jax.Array, jax.Array]:
    """Streaming exact top-k inner-product search.

    Args:
      queries: [B, D] query embeddings.
      docs: [N, D] document embeddings (pre-L2-normalized if normalized=True).
      k: number of neighbors.
      block_n: document block size per scan step (MXU-friendly multiple of 128).
      bias: optional [N] additive per-doc score bias. 0/-inf masks implement
        tombstoned deletes and metadata pre-filtering inside the kernel —
        filtering happens *before* top-k, unlike the reference's post-filter
        (reference api.py:759-791).
    Returns:
      (values [B, k] float32, indices [B, k] int32), sorted descending.
      Slots beyond N (when k > N) hold -inf / -1.
    """
    q = queries.astype(jnp.float32)
    d = docs
    if not normalized:
        q = l2_normalize(q)
        d = l2_normalize(d.astype(jnp.float32))

    B, D = q.shape
    N = d.shape[0]
    nb = max(1, -(-N // block_n))
    Np = nb * block_n
    if Np != N:
        d = jnp.pad(d, ((0, Np - N), (0, 0)))
    d_blocks = d.reshape(nb, block_n, D)
    if bias is not None:
        b_pad = jnp.pad(bias.astype(jnp.float32), (0, Np - N))
        b_blocks = b_pad.reshape(nb, block_n)
    else:
        b_blocks = jnp.zeros((nb, block_n), dtype=jnp.float32)

    init_vals = jnp.full((B, k), NEG_INF, dtype=jnp.float32)
    init_idxs = jnp.full((B, k), -1, dtype=jnp.int32)

    col = jax.lax.broadcasted_iota(jnp.int32, (1, block_n), 1)

    def body(carry, inp):
        vals, idxs = carry
        blk_i, e_blk, b_blk = inp
        # [B, block_n] block scores on the MXU.
        s = jnp.dot(q, e_blk.astype(jnp.float32).T, preferred_element_type=jnp.float32)
        s = s + b_blk[None, :]
        gidx = blk_i * block_n + col  # [1, block_n]
        valid = gidx < N
        s = jnp.where(valid, s, NEG_INF)
        cat_v = jnp.concatenate([vals, s], axis=1)
        cat_i = jnp.concatenate([idxs, jnp.broadcast_to(gidx, (B, block_n))], axis=1)
        new_v, sel = jax.lax.top_k(cat_v, k)
        new_i = jnp.take_along_axis(cat_i, sel, axis=1)
        return (new_v, new_i), None

    (vals, idxs), _ = jax.lax.scan(
        body,
        (init_vals, init_idxs),
        (jnp.arange(nb, dtype=jnp.int32), d_blocks, b_blocks),
    )
    return vals, idxs


def dense_topk(
    queries: jax.Array,
    docs: jax.Array,
    k: int,
    block_n: int = 4096,
    normalized: bool = True,
    use_pallas: bool | None = None,
) -> Tuple[jax.Array, jax.Array]:
    """Exact top-k dense search. Dispatches to the Pallas fused kernel on TPU
    when profitable, else the XLA scan path."""
    N = docs.shape[0]
    k_eff = min(k, N)
    if use_pallas is None:
        use_pallas = (
            jax.default_backend() == "tpu"
            and N >= 2 * block_n
            and queries.shape[1] % 128 == 0
        )
    if use_pallas:
        try:
            from hybridsearch_tpu.ops.pallas_topk import pallas_dense_topk

            return pallas_dense_topk(queries, docs, k_eff, block_n=block_n,
                                     normalized=normalized)
        except Exception:  # pragma: no cover - fall back if Mosaic rejects
            pass
    return scan_dense_topk(queries, docs, k_eff, block_n=min(block_n, _round_up(N, 128)),
                           normalized=normalized)


@functools.partial(jax.jit, static_argnames=("n",))
def scatter_topk_to_dense(values: jax.Array, indices: jax.Array, n: int) -> jax.Array:
    """Scatter top-k (values, indices) rows into dense [B, n] score arrays
    with zeros elsewhere — parity with the reference's FAISS branch, which
    retrieves min(top_k*2, N) hits and scatters them into a dense zeros
    array before fusion (reference core.py:244-250)."""
    B, k = values.shape
    out = jnp.zeros((B, n), dtype=jnp.float32)
    idx = jnp.clip(indices, 0, n - 1)
    vals = jnp.where(indices >= 0, values, 0.0)
    return out.at[jnp.arange(B)[:, None], idx].add(vals)


def pairwise_cosine(x: jax.Array) -> jax.Array:
    """All-pairs cosine similarity [n, n] (reference utils.py:90-106, which
    is an O(n^2) Python loop — here a single matmul)."""
    xn = l2_normalize(x.astype(jnp.float32))
    return jnp.dot(xn, xn.T, preferred_element_type=jnp.float32)
