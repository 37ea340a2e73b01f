"""Collective retrieval primitives over the device mesh.

The TPU-native equivalent of "distributed FAISS with replicas"
(reference README.md:396 roadmap): each shard runs the streaming dense
top-k over its local document rows, then only k candidates per shard are
all-gathered over ICI and merged with one final top_k — the collective
moves O(shards * k) floats, never O(N) (SURVEY §2-P, §5.8).
"""

from __future__ import annotations

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


def sharded_hybrid_topk(
    mesh: Mesh,
    queries: jax.Array,
    docs_sharded: jax.Array,
    bm25_doc_ids: jax.Array,
    bm25_weights: jax.Array,
    qt_by_width,
    k: int,
    semantic_weight,
    lexical_weight,
    valid_n: int,
    block_n: int = 4096,
    bias_sharded: jax.Array | None = None,
) -> Tuple[jax.Array, jax.Array]:
    """EXACT hybrid search over the mesh in one collective program.

    The reference's hybrid semantics (min-max normalize both arms over ALL
    docs, weighted sum, top-k; core.py:264-271) needs global score
    statistics — at 10M docs the [B, N] arrays can't be materialized, and
    the reference has no distributed path at all. Here each shard:

      1. computes its local dense scores (matmul) and local BM25 scores
         (scatter-add over doc-partitioned postings) for its doc slice;
      2. contributes local min/max of both arms to a global pmin/pmax over
         the data axis (two tiny collectives);
      3. normalizes + fuses locally and takes a local top-k;
      4. all_gathers k candidates per shard for the final merge.

    Only 4 scalars per query + k candidates per shard cross the ICI.
    BM25 query terms arrive pre-bucketed by posting-run length
    (ops/bm25.py LENGTH_BUCKETS) so one hot term can't widen every slice.
    """
    from hybridsearch_tpu.ops.bm25 import _local_bucketed_scores

    n_pad = docs_sharded.shape[0]
    n_shards = mesh.shape[DATA_AXIS]
    per = n_pad // n_shards
    k_local = min(k, per)
    B = queries.shape[0]
    w_s = jnp.float32(semantic_weight)
    w_l = jnp.float32(lexical_weight)

    if bias_sharded is None:
        bias_sharded = jax.device_put(
            jnp.zeros((n_pad,), dtype=jnp.float32),
            NamedSharding(mesh, P(DATA_AXIS)),
        )
    widths = tuple(w for w, _s, _l in qt_by_width)
    run_arrays = tuple(a for _w, st, ln in qt_by_width for a in (st, ln))

    def local(q, docs_local, ids, ws, bias_local, *runs):
        shard_id = jax.lax.axis_index(DATA_AXIS)
        offset = shard_id * per
        col = jax.lax.broadcasted_iota(jnp.int32, (1, per), 1)
        gidx = offset + col  # [1, per]
        valid = gidx < valid_n

        q32 = q.astype(jnp.float32)
        q_mm = q32.astype(docs_local.dtype) if docs_local.dtype == jnp.bfloat16 else q32
        sem = jax.lax.dot_general(
            q_mm, docs_local, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [B, per]
        if runs:
            local_runs = tuple(r[0] for r in runs)
            lex = _local_bucketed_scores(ids[0], ws[0], local_runs, widths,
                                         per)
        else:
            lex = jnp.zeros_like(sem)

        big = jnp.float32(3.4e38)
        # statistics over valid AND alive (non-tombstoned) docs only, like
        # the single-device fused path
        stat_ok = valid & (bias_local >= 0.0)[None, :]
        sem_m = jnp.where(stat_ok, sem, big)
        sem_M = jnp.where(stat_ok, sem, -big)
        lex_m = jnp.where(stat_ok, lex, big)
        lex_M = jnp.where(stat_ok, lex, -big)
        # global per-query min/max over the data axis (reference normalizes
        # over all docs)
        sem_min = jax.lax.pmin(jnp.min(sem_m, axis=1), DATA_AXIS)
        sem_max = jax.lax.pmax(jnp.max(sem_M, axis=1), DATA_AXIS)
        lex_min = jax.lax.pmin(jnp.min(lex_m, axis=1), DATA_AXIS)
        lex_max = jax.lax.pmax(jnp.max(lex_M, axis=1), DATA_AXIS)

        def norm(x, mn, mx):
            rng = mx - mn
            return jnp.where(
                (rng > 1e-12)[:, None],
                (x - mn[:, None]) / jnp.maximum(rng, 1e-12)[:, None],
                jnp.ones_like(x),
            )

        hybrid = norm(sem, sem_min, sem_max) * w_s + norm(lex, lex_min,
                                                          lex_max) * w_l
        hybrid = hybrid + bias_local[None, :]
        hybrid = jnp.where(valid, hybrid, -jnp.inf)
        if per > 65536:  # avoid a per*B-wide sort program
            from hybridsearch_tpu.ops.dense import tiled_matrix_topk

            vals, idxs = tiled_matrix_topk(hybrid, k_local)
            idxs = jnp.maximum(idxs, 0)
        else:
            vals, idxs = jax.lax.top_k(hybrid, k_local)
        g = jnp.take_along_axis(jnp.broadcast_to(gidx, (B, per)), idxs, axis=1)
        g = jnp.where(jnp.isfinite(vals), g, -1)
        all_vals = jax.lax.all_gather(vals, DATA_AXIS, axis=1, tiled=True)
        all_idxs = jax.lax.all_gather(g, DATA_AXIS, axis=1, tiled=True)
        mv, sel = jax.lax.top_k(all_vals, k)
        return mv, jnp.take_along_axis(all_idxs, sel, axis=1)

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P(DATA_AXIS, None), P(DATA_AXIS, None),
                  P(DATA_AXIS, None), P(DATA_AXIS))
        + (P(DATA_AXIS, None, None),) * len(run_arrays),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return fn(queries, docs_sharded, bm25_doc_ids, bm25_weights,
              bias_sharded, *run_arrays)
