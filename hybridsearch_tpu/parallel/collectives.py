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


def sharded_supertile_topk(
    mesh: Mesh,
    queries: jax.Array,  # [B, D] L2-normalized f32 (replicated)
    docs_sharded: jax.Array,  # [n_pad, D] P(DATA_AXIS, None)
    sup_max_s: jax.Array,  # [S_sh, V+1, ns_l] P(DATA_AXIS, None, None)
    sup_pos_s: jax.Array,  # [S_sh, V+1, ns_l+1]
    ids_rows_s: jax.Array,  # [S_sh, M_l, 128]
    ws_rows_s: jax.Array,  # [S_sh, M_l, 128]
    enc,  # SuperQueryEnc (encode_super_queries_sharded)
    k: int,
    semantic_weight,
    lexical_weight,
    s_probe: int = 2,
    valid_n: int | None = None,
    n_alive: int | None = None,
    bias_sharded: jax.Array | None = None,
    super_tiles: int = 128,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Supertile exact-resident hybrid over the mesh — the at-scale
    collective serving path (the exact sharded_hybrid_topk materializes
    [B, per] score arrays per shard; this probes s_probe supertiles PER
    SHARD and scores only their residents, exactly).

    Per shard: local dense tile stats (global min/max via pmin/pmax),
    local supertile bounds from the shard's tables, local probes, exact
    local residents (ops/supertile.py helpers over LOCAL doc ids), a
    local top-k, then an all_gather of k candidates per shard. The
    certificate is global: the merged k-th fused score must dominate
    every shard's unprobed-supertile bound (one pmax), the resident
    lexical max must be the true global max (one pmax), and the usual
    completeness/lex-min-zero/overflow flags apply. Only 4 scalars per
    query + k candidates per shard cross the ICI.

    Returns (values, global indices, exact) — same contract/semantics as
    hybrid_supertile_topk (reference core.py:199-271 fusion)."""
    from hybridsearch_tpu.ops.dense import dense_tile_stats, gather_tile_scores
    from hybridsearch_tpu.ops.hybrid import NEG_INF
    from hybridsearch_tpu.ops.supertile import (
        TILE,
        _place_windows,
        _resident_windows,
    )

    n_pad = docs_sharded.shape[0]
    n_shards = mesh.shape[DATA_AXIS]
    per = n_pad // n_shards
    valid_n = n_pad if valid_n is None else valid_n
    n_alive = valid_n if n_alive is None else n_alive
    sd = super_tiles * TILE
    B = queries.shape[0]
    w_s = jnp.float32(semantic_weight)
    w_l = jnp.float32(lexical_weight)
    eps = jnp.float32(1e-12)
    wcaps = tuple(min(w, sd) for w in enc.wcaps)
    lmz = jnp.asarray(enc.full_touched < n_alive)
    complete = jnp.asarray(enc.complete)
    if bias_sharded is None:
        bias_sharded = jax.device_put(
            jnp.zeros((n_pad,), dtype=jnp.float32),
            NamedSharding(mesh, P(DATA_AXIS)),
        )

    def local(q, docs_l, bias_l, smax_t, spos_t, idr, wsr, tids, comp,
              lm):
        shard = jax.lax.axis_index(DATA_AXIS)
        offset = shard * per
        sup_max = smax_t[0]
        sup_pos = spos_t[0]
        ids_rows = idr[0]
        ws_rows = wsr[0]
        n_tiles = -(-per // TILE)
        ns = sup_max.shape[1]
        S = min(s_probe, ns)

        # 1. local dense stats; GLOBAL alive min/max over the data axis
        tile_sem, smin_l, smax_l = dense_tile_stats(q, docs_l, bias_l)
        smin = jax.lax.pmin(smin_l, DATA_AXIS)
        smax = jax.lax.pmax(smax_l, DATA_AXIS)
        pad_t = ns * super_tiles - n_tiles
        ts_full = jnp.pad(tile_sem, ((0, 0), (0, pad_t)),
                          constant_values=NEG_INF) if pad_t else tile_sem
        ssem = jnp.max(ts_full.reshape(B, ns, super_tiles), axis=2)

        # 2. lexical supertile bounds + GLOBAL bound normalizer
        slex = jnp.sum(jnp.take(sup_max, tids, axis=0), axis=1)
        L0 = jax.lax.pmax(jnp.max(slex, axis=1), DATA_AXIS)

        rng_s = smax - smin

        def nsem(x):
            return jnp.where(
                rng_s[:, None] > eps,
                (x - smin[:, None]) / jnp.maximum(rng_s[:, None], eps),
                jnp.ones_like(x),
            )

        def nlex(x, L):
            return jnp.where(L[:, None] > eps,
                             x / jnp.maximum(L[:, None], eps),
                             jnp.ones_like(x))

        # 3. per-shard probe selection
        bound0 = w_s * nsem(ssem) + w_l * nlex(slex, L0)
        _, top_sup = jax.lax.top_k(bound0, S)
        sup_s = jnp.sort(top_sup, axis=1)

        # 4. exact residents (LOCAL ids), sem + lex
        tiles_sel = (sup_s[:, :, None] * super_tiles
                     + jax.lax.broadcasted_iota(
                         jnp.int32, (1, 1, super_tiles), 2)
                     ).reshape(B, S * super_tiles)
        s_res, gidx_l = gather_tile_scores(q, docs_l, tiles_sel, bias_l)
        R = S * sd
        gidx = gidx_l + offset
        in_range = (gidx_l < per) & (gidx < valid_n)
        s_res = jnp.where(in_range, s_res, NEG_INF)
        alive = jnp.isfinite(s_res)
        l_cat, w_cat, ovf_l = _resident_windows(
            sup_pos, ids_rows, ws_rows, tids, sup_s, sd, wcaps)
        lex_res = _place_windows(l_cat, w_cat, super_tiles,
                                 use_pallas=False).reshape(B, R)
        lex_res = jnp.where(alive, lex_res, 0.0)

        # 5. GLOBAL lexical normalizer + fusion + local top-k
        L_res = jax.lax.pmax(jnp.max(lex_res, axis=1), DATA_AXIS)
        fused = w_s * nsem(s_res) + w_l * nlex(lex_res, L_res)
        fused = jnp.where(alive, fused, NEG_INF)
        k_local = min(k, R)
        vals, pos = jax.lax.top_k(fused, k_local)
        g = jnp.take_along_axis(gidx, pos, axis=1)
        g = jnp.where(jnp.isfinite(vals) & (vals > NEG_INF / 2), g, -1)

        # 6. certificate pieces (global reductions)
        probed = jnp.any(
            jax.lax.broadcasted_iota(jnp.int32, (1, ns), 1)[:, :, None]
            == sup_s[:, None, :], axis=2)
        slex_un = jnp.where(probed, 0.0, slex)
        cert_norm = L_res >= jax.lax.pmax(jnp.max(slex_un, axis=1),
                                          DATA_AXIS)
        bound_f = (w_s * nsem(ssem)
                   + w_l * nlex(slex, jnp.maximum(L_res, eps)))
        tau_l = jnp.max(jnp.where(probed, NEG_INF, bound_f), axis=1)
        tau = jax.lax.pmax(tau_l, DATA_AXIS)
        ovf = jax.lax.pmax(ovf_l.astype(jnp.int32), DATA_AXIS) > 0

        # 7. candidate merge (replicated compute, O(shards*k) over ICI)
        all_vals = jax.lax.all_gather(vals, DATA_AXIS, axis=1, tiled=True)
        all_ids = jax.lax.all_gather(g, DATA_AXIS, axis=1, tiled=True)
        mv, sel = jax.lax.top_k(all_vals, k)
        mi = jnp.take_along_axis(all_ids, sel, axis=1)
        kth = mv[:, -1]
        exact = (comp & lm & cert_norm & ~ovf
                 & ((kth >= tau) | ~jnp.isfinite(tau)))
        return mv, mi, exact

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P(DATA_AXIS, None), P(DATA_AXIS),
                  P(DATA_AXIS, None, None), P(DATA_AXIS, None, None),
                  P(DATA_AXIS, None, None), P(DATA_AXIS, None, None),
                  P(), P(), P()),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )
    return fn(queries, docs_sharded, bias_sharded, sup_max_s, sup_pos_s,
              ids_rows_s, ws_rows_s, enc.term_ids, complete, lmz)
