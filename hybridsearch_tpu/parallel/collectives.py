"""Collective retrieval primitives over the device mesh.

The TPU-native equivalent of "distributed FAISS with replicas"
(reference README.md:396 roadmap): each shard runs the streaming dense
top-k over its local document rows, then only k candidates per shard are
all-gathered over ICI and merged with one final top_k — the collective
moves O(shards * k) floats, never O(N) (SURVEY §2-P, §5.8).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from hybridsearch_tpu.ops.dense import scan_dense_topk
from hybridsearch_tpu.parallel.mesh import DATA_AXIS


def sharded_dense_topk(
    mesh: Mesh,
    queries: jax.Array,
    docs_sharded: jax.Array,
    k: int,
    block_n: int = 4096,
    valid_n: int | None = None,
    bias_sharded: jax.Array | None = None,
) -> Tuple[jax.Array, jax.Array]:
    """Exact top-k over a doc-sharded [N_pad, D] matrix.

    Args:
      mesh: mesh with the DATA_AXIS over which docs are sharded.
      queries: [B, D] (replicated).
      docs_sharded: [N_pad, D] placed with NamedSharding(P("data", None));
        rows beyond valid_n are padding (must be zero vectors).
      k: neighbors to return (global).
      valid_n: true document count (defaults to N_pad).
    Returns:
      (values [B, k], global indices [B, k]) sorted descending.
    """
    n_pad = docs_sharded.shape[0]
    n_shards = mesh.shape[DATA_AXIS]
    per_shard = n_pad // n_shards
    valid = n_pad if valid_n is None else valid_n
    k_local = min(k, per_shard)

    def local_search(q, docs_local, bias_local):
        # docs_local: [per_shard, D] block of this shard.
        shard_id = jax.lax.axis_index(DATA_AXIS)
        offset = shard_id * per_shard
        vals, idxs = scan_dense_topk(
            q, docs_local, k_local, block_n=min(block_n, per_shard),
            bias=bias_local,
        )
        gidx = jnp.where(idxs >= 0, idxs + offset, -1)
        # Mask padding rows (global index >= valid).
        vals = jnp.where((gidx >= 0) & (gidx < valid), vals, -jnp.inf)
        gidx = jnp.where((gidx >= 0) & (gidx < valid), gidx, -1)
        # Gather candidates from every shard: [n_shards * k_local] per query.
        all_vals = jax.lax.all_gather(vals, DATA_AXIS, axis=1, tiled=True)
        all_idxs = jax.lax.all_gather(gidx, DATA_AXIS, axis=1, tiled=True)
        mv, sel = jax.lax.top_k(all_vals, k)
        mi = jnp.take_along_axis(all_idxs, sel, axis=1)
        return mv, mi

    if bias_sharded is None:
        bias_sharded = jax.device_put(
            jnp.zeros((n_pad,), dtype=jnp.float32), NamedSharding(mesh, P(DATA_AXIS))
        )
    fn = shard_map(
        local_search,
        mesh=mesh,
        in_specs=(P(), P(DATA_AXIS, None), P(DATA_AXIS)),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return fn(queries, docs_sharded, bias_sharded)


@functools.partial(jax.jit, static_argnames=("k",))
def merge_shard_topk(
    vals: jax.Array, idxs: jax.Array, k: int
) -> Tuple[jax.Array, jax.Array]:
    """Merge per-shard candidate lists [S, B, k_l] -> global [B, k]."""
    S, B, kl = vals.shape
    flat_v = jnp.transpose(vals, (1, 0, 2)).reshape(B, S * kl)
    flat_i = jnp.transpose(idxs, (1, 0, 2)).reshape(B, S * kl)
    mv, sel = jax.lax.top_k(flat_v, k)
    return mv, jnp.take_along_axis(flat_i, sel, axis=1)
