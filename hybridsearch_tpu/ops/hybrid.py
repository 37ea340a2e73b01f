"""Sparse-correction exact hybrid retrieval at corpus scale.

The reference's hybrid semantics (reference core.py:199-271 and
pipelines.py:315-343) normalize BOTH full score arrays and fuse them:

    hybrid(d) = w_s * norm(sem(d)) + w_l * norm(lex(d))

The round-1 fused path materializes the full [B, N] lexical array, which is
20 GB at 10M docs x 512 queries — a non-starter. This module computes the
same top-k WITHOUT any [B, N] array, using a threshold-algorithm (Fagin TA)
candidate union plus TPU-shaped block-max bounds:

  dense arm   one streaming sweep of the doc matrix (tiled_dense_topk
              with_stats=True): exact top-K' semantic candidates plus the
              exact global min/max of semantic scores over alive docs —
              the min-max normalization statistics.
  lexical arm posting entries are scatter-added at 128-doc TILE granularity
              into [B, n_tiles] *bounds* (all BM25 weights are >= 0, so a
              tile's weight-sum upper-bounds every doc score inside it —
              block-max WAND, TPU style). The top-M tiles by bound are
              rescored exactly (binary-search candidate scoring over the
              CSR runs), giving the top lexical candidates and the exact
              lexical max; all other docs are certified <= the M-th bound.
  fusion      each arm's candidates get their OTHER arm's exact score
              (lexical: CSR binary search; semantic: gather k rows of the
              doc matrix and dot), both arms normalize with the exact
              global statistics, and the fused top-k is taken over the
              candidate union (deduplicated).
  certificate every doc outside the union has sem <= the K'-th dense value
              and lex <= max(M-th tile bound, C'-th lexical candidate), so
                tau = w_s * nsem(semK') + w_l * nlex(lex_bound)
              upper-bounds every unseen doc. If the k-th fused candidate
              >= tau, the result is EXACT; the per-query flag reports it,
              and callers escalate (K', M) or fall back when it is False.

Lexical min is 0 whenever at least one alive doc contains no query term;
the caller certifies this from posting lengths (total postings touched <
alive docs). BM25 min-max therefore normalizes by the exact max alone.

bias must be a 0/-inf alive mask (tombstones + metadata pre-filter), the
only form the framework produces.
"""

from __future__ import annotations

import functools
from typing import List, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from hybridsearch_tpu.ops.bm25 import (
    BM25Postings,
    _bm25_scores_runs,
    _cand_scores_runs,
    cand_scores_bisect,
)
from hybridsearch_tpu.ops.dense import (
    NEG_INF,
    tiled_dense_topk,
    tiled_matrix_topk,
)

TILE = 128


@functools.partial(jax.jit, static_argnames=("n_tiles", "width"))
def _bm25_tile_bounds(
    doc_ids: jax.Array,
    weights: jax.Array,
    starts: jax.Array,  # [B, T]
    lengths: jax.Array,  # [B, T]
    n_tiles: int,
    width: int,
) -> jax.Array:
    """[B, n_tiles] per-tile SUMS of posting weights (upper bound on any
    single doc's score within the tile, since weights >= 0).

    Same carry-free gather + one-scatter structure as _bm25_scores_runs,
    but the scatter target is 128x smaller (doc_id // TILE)."""
    iota = jax.lax.broadcasted_iota(jnp.int32, (1, width), 1)[0]
    drop = jnp.int32(n_tiles * TILE)  # // TILE == n_tiles -> mode="drop"

    def gather_one(s_row, l_row):
        def body(_, sl):
            st, ln = sl
            ids = jax.lax.dynamic_slice(doc_ids, (st,), (width,))
            ws = jax.lax.dynamic_slice(weights, (st,), (width,))
            valid = iota < ln
            return None, (jnp.where(valid, ids, drop),
                          jnp.where(valid, ws, 0.0))

        _, (ids, ws) = jax.lax.scan(body, None, (s_row, l_row))
        return ids.reshape(-1), ws.reshape(-1)

    ids_flat, ws_flat = jax.vmap(gather_one)(starts, lengths)
    tids = ids_flat // TILE

    def scatter_one(tids_row, ws_row):
        return jnp.zeros((n_tiles,), jnp.float32).at[tids_row].add(
            ws_row, mode="drop"
        )

    return jax.vmap(scatter_one)(tids, ws_flat)


class HybridTopK(NamedTuple):
    values: jax.Array  # [B, k] fused scores (desc)
    indices: jax.Array  # [B, k] doc ids, -1 for empty slots
    exact: jax.Array  # [B] bool — True when the TA certificate holds


@functools.partial(
    jax.jit,
    static_argnames=(
        "k", "k_dense", "m_tiles", "c_lex", "widths", "norm", "block_n",
    ),
)
def _hybrid_sparse_impl(
    q: jax.Array,  # [B, D] L2-normalized fp32 queries
    docs: jax.Array,  # [N, D] L2-normalized (bf16/fp32), N % 128 == 0
    po_doc_ids: jax.Array,
    po_weights: jax.Array,
    run_arrays: tuple,  # interleaved (starts, lengths) per width
    hot_rows: Optional[jax.Array],  # [B, Hm] rows into hot_bounds (pad = H)
    hot_starts: Optional[jax.Array],  # [B, Hm] hot-term run starts
    hot_lens: Optional[jax.Array],  # [B, Hm] hot-term run lengths (0 = pad)
    hot_bounds: Optional[jax.Array],  # [H+1, >=n_tiles] per-tile sums
    w_s: jax.Array,
    w_l: jax.Array,
    bias: Optional[jax.Array],  # [N] 0/-inf alive mask or None
    lex_min_zero: jax.Array,  # [B] bool host certificate (see module doc)
    k: int,
    k_dense: int,
    m_tiles: int,
    c_lex: int,
    widths: tuple,
    norm: str,
    block_n: int,
) -> HybridTopK:
    B, D = q.shape
    N = docs.shape[0]
    n_tiles = N // TILE
    eps = jnp.float32(1e-12)

    # -- dense arm: exact top-K' + exact alive min/max in ONE sweep --------
    kd = min(k_dense, N)
    vals_d, idxs_d, smin, smax = tiled_dense_topk(
        q, docs, kd, block_n=block_n, bias=bias, with_stats=True
    )
    # raw semantic values of alive candidates equal the selection values
    # (mask bias adds 0); dead/padded slots are -inf/-1.

    # -- lexical arm: tile bounds -> top-M tiles -> exact rescore ----------
    m_eff = min(m_tiles, n_tiles)
    bounds = jnp.zeros((B, n_tiles), jnp.float32)
    for i, width in enumerate(widths):
        starts, lengths = run_arrays[2 * i], run_arrays[2 * i + 1]
        bounds = bounds + _bm25_tile_bounds(
            po_doc_ids, po_weights, starts, lengths, n_tiles, width
        )
    if hot_rows is not None:
        # hot terms: one precomputed tile-bound row gather per term (never
        # touches their multi-million-entry posting runs)
        hb = hot_bounds[:, :n_tiles]
        for j in range(hot_rows.shape[1]):
            bounds = bounds + hb[hot_rows[:, j]]
    if n_tiles > 65536:
        bvals, btiles = tiled_matrix_topk(bounds, m_eff)
        btiles = jnp.maximum(btiles, 0)
    else:
        bvals, btiles = jax.lax.top_k(bounds, m_eff)
    # unseen-TILE score bound (weights >= 0). When every tile is a
    # candidate there are no unseen tiles: the floor 0 (lex scores are
    # non-negative, so no doc scores below it) replaces the loose tile-sum.
    tau_b = (bvals[:, -1] if m_eff < n_tiles
             else jnp.zeros((B,), jnp.float32))

    cand = (btiles[:, :, None] * TILE
            + jax.lax.broadcasted_iota(jnp.int32, (1, 1, TILE), 2)
            ).reshape(B, m_eff * TILE)
    safe_c = jnp.where(cand < N, cand, N + 2)
    lex_c = jnp.zeros((B, m_eff * TILE), jnp.float32)
    for i, width in enumerate(widths):
        starts, lengths = run_arrays[2 * i], run_arrays[2 * i + 1]
        lex_c = lex_c + _cand_scores_runs(
            po_doc_ids, po_weights, starts, lengths, safe_c, N, width
        )
    if hot_rows is not None:
        lex_c = lex_c + cand_scores_bisect(
            po_doc_ids, po_weights, hot_starts, hot_lens, safe_c
        )
    if bias is not None:
        alive_c = (cand < N) & (jnp.take(bias, jnp.minimum(cand, N - 1)) >= 0)
    else:
        alive_c = cand < N
    lex_c_m = jnp.where(alive_c, lex_c, NEG_INF)
    lex_max = jnp.max(lex_c_m, axis=1)  # [B]
    # certificate: the global alive lexical max is inside the candidate
    # tiles (every other tile's bound <= tau_b <= lex_max)
    cert_lexmax = lex_max >= tau_b

    ce = min(c_lex, m_eff * TILE)
    lex_sel_vals, sel_pos = jax.lax.top_k(lex_c_m, ce)  # [B, C']
    ids_lex = jnp.take_along_axis(cand, sel_pos, axis=1)
    alive_lex = jnp.isfinite(lex_sel_vals)
    # semantic scores of the lexical candidates: gather k rows + dot
    d_sel = jnp.take(docs, jnp.clip(ids_lex, 0, N - 1).reshape(-1), axis=0)
    d_sel = d_sel.reshape(B, ce, D)
    # operands stay in the docs' dtype (bf16 gather = half the HBM
    # traffic; f32 accumulate) — identical to the dense arm's products
    q_g = q.astype(d_sel.dtype) if d_sel.dtype == jnp.bfloat16 else q
    sem_lex = jnp.einsum("bcd,bd->bc", d_sel, q_g,
                         preferred_element_type=jnp.float32)

    # lexical scores of the dense candidates (exact CSR binary search)
    safe_d = jnp.where(idxs_d >= 0, idxs_d, N + 2)
    lex_d = jnp.zeros((B, kd), jnp.float32)
    for i, width in enumerate(widths):
        starts, lengths = run_arrays[2 * i], run_arrays[2 * i + 1]
        lex_d = lex_d + _cand_scores_runs(
            po_doc_ids, po_weights, starts, lengths, safe_d, N, width
        )
    if hot_rows is not None:
        lex_d = lex_d + cand_scores_bisect(
            po_doc_ids, po_weights, hot_starts, hot_lens, safe_d
        )

    # -- normalization with exact global statistics ------------------------
    if norm == "minmax":
        rng_s = smax - smin

        def nsem(x):
            return jnp.where(
                rng_s[:, None] > eps,
                (x - smin[:, None]) / jnp.maximum(rng_s[:, None], eps),
                jnp.ones_like(x),
            )

        def nlex(x):  # lexical min certified 0 by the caller
            return jnp.where(
                lex_max[:, None] > eps,
                x / jnp.maximum(lex_max[:, None], eps),
                jnp.ones_like(x),
            )
    else:  # "max" (HybridBM25Pipeline quirk: divide by max only)
        def nsem(x):
            return jnp.where(smax[:, None] > eps,
                             x / jnp.maximum(smax[:, None], eps), x)

        def nlex(x):
            return jnp.where(lex_max[:, None] > eps,
                             x / jnp.maximum(lex_max[:, None], eps), x)

    # -- fuse the candidate union ------------------------------------------
    ids_all = jnp.concatenate([idxs_d, ids_lex], axis=1)  # [B, K'+C']
    sem_all = jnp.concatenate([vals_d, sem_lex], axis=1)
    lex_all = jnp.concatenate([lex_d, lex_sel_vals], axis=1)
    alive_all = jnp.concatenate([jnp.isfinite(vals_d), alive_lex], axis=1)
    fused = w_s * nsem(sem_all) + w_l * nlex(jnp.where(alive_all, lex_all, 0.0))
    fused = jnp.where(alive_all, fused, NEG_INF)

    # dedup docs appearing in both arms: sort by id, kill repeats
    order = jnp.argsort(ids_all, axis=1)
    ids_sorted = jnp.take_along_axis(ids_all, order, axis=1)
    fused_sorted = jnp.take_along_axis(fused, order, axis=1)
    dup = jnp.concatenate(
        [jnp.zeros((B, 1), bool), ids_sorted[:, 1:] == ids_sorted[:, :-1]],
        axis=1,
    )
    fused_sorted = jnp.where(dup, NEG_INF, fused_sorted)
    k_eff = min(k, ids_all.shape[1])
    vals_f, pos = jax.lax.top_k(fused_sorted, k_eff)
    idxs_f = jnp.take_along_axis(ids_sorted, pos, axis=1)
    idxs_f = jnp.where(jnp.isfinite(vals_f), idxs_f, -1)

    # -- TA certificate ------------------------------------------------------
    # unseen docs: sem <= K'-th dense value, lex <= max(tau_b, C'-th cand)
    sem_kth = vals_d[:, -1]
    lex_bound = jnp.maximum(tau_b, lex_sel_vals[:, -1])
    tau = (w_s * nsem(sem_kth[:, None])[:, 0]
           + w_l * nlex(jnp.maximum(lex_bound, 0.0)[:, None])[:, 0])
    kth = vals_f[:, k_eff - 1]
    cert = cert_lexmax
    if norm == "minmax":
        # min-max needs the lexical min too; it is 0 only when certified
        cert = cert & lex_min_zero
    # a -inf kth value means fewer than k alive docs exist -> all retrieved
    exact = ((kth >= tau) | ~jnp.isfinite(kth)) & cert
    return HybridTopK(values=vals_f, indices=idxs_f, exact=exact)


@functools.partial(
    jax.jit,
    static_argnames=("k", "k_dense", "c_per_term", "p_depth", "norm",
                     "block_n", "bq", "margin", "imp_align", "kd_tiles"),
)
def _hybrid_impact_impl(
    q: jax.Array,  # [B, D] L2-normalized fp32 queries
    docs: jax.Array,  # [N, D] L2-normalized (bf16/fp32), N % 128 == 0
    imp_doc_ids: jax.Array,
    imp_weights: jax.Array,
    starts: jax.Array,  # [B, T]
    lengths: jax.Array,  # [B, T]
    slack: jax.Array,  # [B, T] tail bound at p_depth
    complete: jax.Array,  # [B] bool — all query terms fully covered
    w_s: jax.Array,
    w_l: jax.Array,
    bias: Optional[jax.Array],  # [N] 0/-inf alive mask or None
    n_alive: jax.Array,  # scalar int32
    hot_starts: Optional[jax.Array],  # [B, Hm] full-CSR starts (or None)
    hot_lens: Optional[jax.Array],  # [B, Hm]
    hot_cols: Optional[jax.Array],  # [B, T] bool truncated columns
    full_doc_ids: Optional[jax.Array],  # full doc-sorted CSR arrays
    full_weights: Optional[jax.Array],
    corrected_complete: Optional[jax.Array],  # [B] bool (margin cert gate)
    full_touched: Optional[jax.Array],  # [B] int64 sum of FULL dfs
    k: int,
    k_dense: int,
    c_per_term: int,
    p_depth: int,
    norm: str,
    block_n: int,
    bq: int,
    margin: int,
    imp_align: int = 1,
    kd_tiles: Optional[int] = None,
) -> HybridTopK:
    from hybridsearch_tpu.ops.impact import onehot_rescore, slice_impact_runs

    B, D = q.shape
    N = docs.shape[0]
    eps = jnp.float32(1e-12)
    T = starts.shape[1]
    cp = min(c_per_term, p_depth)

    # -- dense arm: exact top-K' + exact alive min/max in ONE sweep.
    # kd_tiles bounds pass 3's tile gather (the dominant dense cost at
    # deep k); the per-query coverage flag then gates BOTH certificates —
    # an uncovered probe may under-estimate the K'-th semantic bound.
    kd = min(k_dense, N)
    if kd_tiles is not None:
        vals_d, idxs_d, smin, smax, dense_covered = tiled_dense_topk(
            q, docs, kd, block_n=block_n, bias=bias, with_stats=True,
            probe_tiles=kd_tiles,
        )
    else:
        vals_d, idxs_d, smin, smax = tiled_dense_topk(
            q, docs, kd, block_n=block_n, bias=bias, with_stats=True
        )
        dense_covered = None

    # -- lexical arm: impact-run prefixes --------------------------------
    ids_r, ws_r = slice_impact_runs(
        imp_doc_ids, imp_weights, starts, lengths, p_depth=p_depth,
        n_docs=N, align=imp_align,
    )  # [B, T, p]
    ids_flat = ids_r.reshape(B, T * p_depth)
    ws_flat = ws_r.reshape(B, T * p_depth)
    # lexical candidates: the top-cp prefix of every term (impact order
    # makes the prefix the per-term argmax set — no selection op needed)
    cand_l = ids_r[:, :, :cp].reshape(B, T * cp)
    # unseen-doc bound: a doc outside term t's top-cp has w_t <= the cp-th
    # kept weight (or the tail slack when the term was truncated shallower)
    wcp = jnp.where(lengths > cp, ws_r[:, :, cp - 1], 0.0)
    tau_lex = jnp.sum(jnp.maximum(wcp, slack), axis=1)  # [B]

    # -- rescore the full candidate union ---------------------------------
    from hybridsearch_tpu.ops.impact import (
        _rescore_backend,
        sortmerge_rescore_multi,
    )

    safe_d = jnp.where(idxs_d >= 0, idxs_d, N + 2)
    cand_all = jnp.concatenate([safe_d, cand_l], axis=1)  # [B, kd + T*cp]
    hot_all = None
    if hot_starts is not None and _rescore_backend() == "sortmerge":
        # share ONE sort between the full rescore and the margin
        # correction's marked-column prefix (extra weight payloads cost
        # only a segmented scan each)
        ws_hot_flat = (ws_r * hot_cols[:, :, None]).reshape(B, T * p_depth)
        lex_all, hot_all = sortmerge_rescore_multi(
            cand_all, ids_flat, (ws_flat, ws_hot_flat))
    else:
        lex_all = onehot_rescore(cand_all, ids_flat, ws_flat, bq=bq)
    alive_all = cand_all < N
    if bias is not None:
        alive_all = alive_all & (
            jnp.take(bias, jnp.minimum(cand_all, N - 1)) >= 0.0
        )
    lex_alive = jnp.where(alive_all, lex_all, NEG_INF)
    lex_max = jnp.maximum(jnp.max(lex_alive, axis=1), 0.0)  # [B]
    cert_lexmax = lex_max >= tau_lex

    # semantic scores of the lexical candidates: gather rows + dot (the
    # dense arm's candidates already carry exact semantic values)
    d_sel = jnp.take(docs, jnp.clip(cand_l, 0, N - 1).reshape(-1), axis=0)
    d_sel = d_sel.reshape(B, T * cp, D)
    # operands stay in the docs' dtype (bf16 gather = half the HBM
    # traffic; f32 accumulate) — identical to the dense arm's products
    q_g = q.astype(d_sel.dtype) if d_sel.dtype == jnp.bfloat16 else q
    sem_l = jnp.einsum("bcd,bd->bc", d_sel, q_g,
                       preferred_element_type=jnp.float32)
    sem_all = jnp.concatenate([vals_d, sem_l], axis=1)

    # -- normalization with exact semantic stats + pruned lexical max ------
    touched = jnp.sum(lengths, axis=1)  # [B] pruned postings touched
    lex_min_zero = touched < n_alive
    if norm == "minmax":
        rng_s = smax - smin

        def nsem(x):
            return jnp.where(
                rng_s[:, None] > eps,
                (x - smin[:, None]) / jnp.maximum(rng_s[:, None], eps),
                jnp.ones_like(x),
            )

        def nlex(x):
            return jnp.where(
                lex_max[:, None] > eps,
                x / jnp.maximum(lex_max[:, None], eps),
                jnp.ones_like(x),
            )
    else:  # "max" (HybridBM25Pipeline quirk: divide by max only)
        def nsem(x):
            return jnp.where(smax[:, None] > eps,
                             x / jnp.maximum(smax[:, None], eps), x)

        def nlex(x):
            return jnp.where(lex_max[:, None] > eps,
                             x / jnp.maximum(lex_max[:, None], eps), x)

    fused = w_s * nsem(sem_all) + w_l * nlex(
        jnp.where(alive_all, lex_all, 0.0)
    )
    fused = jnp.where(alive_all, fused, NEG_INF)

    # dedup docs appearing in both arms: sort by id, kill repeats
    order = jnp.argsort(cand_all, axis=1)
    ids_sorted = jnp.take_along_axis(cand_all, order, axis=1)
    fused_sorted = jnp.take_along_axis(fused, order, axis=1)
    dup = jnp.concatenate(
        [jnp.zeros((B, 1), bool), ids_sorted[:, 1:] == ids_sorted[:, :-1]],
        axis=1,
    )
    fused_sorted = jnp.where(dup, NEG_INF, fused_sorted)
    k_eff = min(k, cand_all.shape[1])

    margin_exact = None
    if hot_starts is not None:
        # margin correction: pruning drops the tails of stopword-grade
        # runs, perturbing candidate scores by at most
        # w_l * sum(slack) / lex_max (small: eager weights carry IDF).
        # Take a top-`margin` cushion by pruned fused score, make those
        # candidates' lexical scores EXACT (bisect the full doc-sorted
        # runs, minus the pruned prefix already counted), and re-fuse.
        # The cushion is never narrower than the requested k: a caller
        # asking for k > margin must still get k result columns.
        c2 = min(max(margin, k_eff), ids_sorted.shape[1])
        sem_sorted = jnp.take_along_axis(sem_all, order, axis=1)
        lex_sorted = jnp.take_along_axis(
            jnp.where(alive_all, lex_all, 0.0), order, axis=1)
        mvals, mpos = jax.lax.top_k(fused_sorted, c2)
        mids = jnp.take_along_axis(ids_sorted, mpos, axis=1)
        msem = jnp.take_along_axis(sem_sorted, mpos, axis=1)
        mlex = jnp.take_along_axis(lex_sorted, mpos, axis=1)
        malive = jnp.isfinite(mvals)
        safe_m = jnp.where(malive, mids, N + 2)
        full_hot = cand_scores_bisect(full_doc_ids, full_weights,
                                      hot_starts, hot_lens, safe_m)
        if hot_all is not None:  # shared-sort payload, gathered into M
            hot_sorted = jnp.take_along_axis(hot_all, order, axis=1)
            prefix_hot = jnp.take_along_axis(hot_sorted, mpos, axis=1)
        else:
            ws_hot = (ws_r * hot_cols[:, :, None]).reshape(B, T * p_depth)
            prefix_hot = onehot_rescore(safe_m, ids_flat, ws_hot, bq=bq)
        mlex_corr = jnp.maximum(mlex - prefix_hot + full_hot, 0.0)
        lex_max2 = jnp.maximum(
            lex_max, jnp.max(jnp.where(malive, mlex_corr, 0.0), axis=1))
        if norm == "minmax":
            nsem_m = jnp.where(
                (smax - smin)[:, None] > eps,
                (msem - smin[:, None]) / jnp.maximum(
                    (smax - smin)[:, None], eps),
                jnp.ones_like(msem),
            )
        else:
            nsem_m = jnp.where(smax[:, None] > eps,
                               msem / jnp.maximum(smax[:, None], eps), msem)
        nlex_m = jnp.where(lex_max2[:, None] > eps,
                           mlex_corr / jnp.maximum(lex_max2[:, None], eps),
                           jnp.ones_like(mlex_corr))
        fused_corr = jnp.where(malive, w_s * nsem_m + w_l * nlex_m, NEG_INF)
        vals_f, pos2 = jax.lax.top_k(fused_corr, min(k_eff, c2))
        idxs_f = jnp.take_along_axis(mids, pos2, axis=1)
        idxs_f = jnp.where(jnp.isfinite(vals_f), idxs_f, -1)

        # -- margin-path certificate (sound WITHOUT `complete`) -----------
        # When every truncated term was bisected (corrected_complete), the
        # cushion's lexical scores are exact, so lex_max2 is certified as
        # the TRUE global lexical max if no doc outside the cushion can
        # exceed it:
        #   outside the union:        true lex <= tau_lex
        #   in the union, not in M:   true lex <= pruned + S
        # (S = total tail slack; a doc misses at most slack_t mass per
        # truncated term t). With the normalizer exact and M's scores
        # exact, the global top-k is inside M when both outside bounds
        # fall below the k-th corrected fused value:
        #   outside union:  f <= w_s*nsem(sem_kd) + w_l*tau_lex/lex_max2
        #   union \ M:      f <= f~_c2 + w_l*S/lex_max2   (f~ = pruned
        #                   fused; pruned lex under-estimates shrink
        #                   further under the larger normalizer lex_max2)
        if corrected_complete is not None:
            S = jnp.sum(slack, axis=1)  # [B]
            sel_mask = jnp.zeros(fused_sorted.shape, bool).at[
                jnp.arange(B)[:, None], mpos].set(True)
            pruned_out_max = jnp.max(
                jnp.where(sel_mask, 0.0, jnp.maximum(lex_sorted, 0.0)),
                axis=1)
            cert_norm = ((lex_max2 >= tau_lex)
                         & (lex_max2 >= pruned_out_max + S))
            l2s = jnp.maximum(lex_max2, eps)
            sem_kth_m = vals_d[:, -1]
            if norm == "minmax":
                nsem_kth = jnp.where(
                    (smax - smin) > eps,
                    (sem_kth_m - smin) / jnp.maximum(smax - smin, eps),
                    jnp.ones_like(sem_kth_m))
            else:
                nsem_kth = jnp.where(
                    smax > eps, sem_kth_m / jnp.maximum(smax, eps),
                    sem_kth_m)
            tau_out = w_s * nsem_kth + w_l * tau_lex / l2s
            c2_vals = mvals[:, -1]
            tau_mid = jnp.where(jnp.isfinite(c2_vals),
                                c2_vals + w_l * S / l2s, NEG_INF)
            kth_m = vals_f[:, -1]
            margin_exact = (corrected_complete & cert_norm
                            & (kth_m >= tau_out) & (kth_m >= tau_mid))
            if norm == "minmax":
                # true-lexical-min-is-zero needs FULL dfs (the pruned
                # touched count under-counts docs holding query terms)
                if full_touched is not None:
                    margin_exact = margin_exact & (full_touched < n_alive)
                else:
                    margin_exact = None
    else:
        vals_f, pos = jax.lax.top_k(fused_sorted, k_eff)
        idxs_f = jnp.take_along_axis(ids_sorted, pos, axis=1)
        idxs_f = jnp.where(jnp.isfinite(vals_f), idxs_f, -1)

    # -- exactness certificate --------------------------------------------
    # Sound only when every query term's FULL posting run is covered
    # (`complete`): candidate scores are then true scores, tau_lex bounds
    # every non-candidate doc, and sem <= the K'-th dense value outside the
    # dense candidates.
    sem_kth = vals_d[:, -1]
    tau = (w_s * nsem(sem_kth[:, None])[:, 0]
           + w_l * nlex(tau_lex[:, None])[:, 0])
    kth = vals_f[:, -1]
    # slicing shallower than the encoded runs drops tail entries from the
    # candidate rescore — never exact then
    sliced_full = jnp.all(lengths <= p_depth, axis=1)
    if dense_covered is not None:
        sliced_full = sliced_full & dense_covered
    cert = complete & sliced_full & cert_lexmax
    if norm == "minmax":
        cert = cert & lex_min_zero
    exact = ((kth >= tau) | ~jnp.isfinite(kth)) & cert
    if margin_exact is not None:
        # the margin-path certificate covers queries with truncated terms
        # the `complete` gate above can never certify
        exact = exact | (margin_exact & sliced_full)
    return HybridTopK(values=vals_f, indices=idxs_f, exact=exact)


def hybrid_impact_topk(
    q: jax.Array,
    docs: jax.Array,
    imp,  # ImpactPostings
    enc,  # ImpactQueryEnc
    k: int,
    w_s: float,
    w_l: float,
    bias: Optional[jax.Array] = None,
    k_dense: int = 512,
    c_per_term: int = 64,
    p_depth: int = 1024,
    norm: str = "minmax",
    block_n: int = 262144,
    n_alive: Optional[int] = None,
    bq: int = 8,
    full_postings: Optional[Tuple[jax.Array, jax.Array]] = None,
    margin: int = 128,
    kd_tiles: Optional[int] = None,
) -> HybridTopK:
    """Hybrid top-k at scale via the impact-pruned lexical arm
    (ops/impact.py). Same fused semantics as the reference's hybrid
    (reference core.py:199-271) over the pruned posting set; the per-query
    `exact` flag is True only when the result provably equals full-corpus
    fusion. q must be L2-normalized; docs pre-normalized with
    docs.shape[0] % 128 == 0.

    full_postings = (doc_ids, weights) of the FULL doc-sorted CSR enables
    the hot-term margin correction when enc carries hot descriptors: the
    top-`margin` fused candidates get exact lexical scores (bisection over
    the full runs) before the final top-k."""
    N = docs.shape[0]
    p = min(p_depth, imp.p_max)
    hs = hl = hc = fdi = fwi = None
    if full_postings is None:
        full_postings = getattr(enc, "full_postings", None)
    cc = ft = None
    if enc.hot_starts is not None and full_postings is not None:
        hs, hl, hc = enc.hot_starts, enc.hot_lens, enc.hot_cols
        fdi, fwi = full_postings
        if getattr(enc, "corrected_complete", None) is not None:
            cc = jnp.asarray(enc.corrected_complete)
        if getattr(enc, "full_touched", None) is not None:
            ft = jnp.asarray(enc.full_touched)
    return _hybrid_impact_impl(
        q, docs, imp.doc_ids, imp.weights,
        enc.starts, enc.lengths, enc.slack, jnp.asarray(enc.complete),
        jnp.float32(w_s), jnp.float32(w_l), bias,
        jnp.int32(N if n_alive is None else n_alive),
        hs, hl, hc, fdi, fwi, cc, ft,
        k=k, k_dense=k_dense, c_per_term=c_per_term, p_depth=p,
        norm=norm, block_n=block_n, bq=bq, margin=margin,
        imp_align=getattr(imp, "align", 1), kd_tiles=kd_tiles,
    )


@functools.partial(
    jax.jit,
    static_argnames=("k", "kt", "p_depth", "norm", "block_n", "margin",
                     "imp_align"),
)
def _hybrid_tile_impl(
    q: jax.Array,  # [B, D] L2-normalized fp32 queries
    docs: jax.Array,  # [N, D] L2-normalized (bf16/fp32), N % 128 == 0
    imp_doc_ids: jax.Array,
    imp_weights: jax.Array,
    starts: jax.Array,  # [B, T]
    lengths: jax.Array,  # [B, T]
    slack: jax.Array,  # [B, T]
    complete: jax.Array,  # [B]
    w_s: jax.Array,
    w_l: jax.Array,
    bias: Optional[jax.Array],
    n_alive: jax.Array,
    hot_starts: Optional[jax.Array],
    hot_lens: Optional[jax.Array],
    hot_cols: Optional[jax.Array],
    full_doc_ids: Optional[jax.Array],
    full_weights: Optional[jax.Array],
    corrected_complete: Optional[jax.Array],
    full_touched: Optional[jax.Array],
    k: int,
    kt: int,
    p_depth: int,
    norm: str,
    block_n: int,
    margin: int,
    imp_align: int,
) -> HybridTopK:
    """Tile-resident joint-bound hybrid for CLUSTERED layouts.

    Block-max WAND generalized to the FUSED score at 128-doc tile
    granularity: every tile gets an upper bound on any resident doc's
    fused score — w_s * nsem(exact tile sem max, from the pass-1 sweep)
    + w_l * nlex(tile posting-weight sum + truncation slack) — the top-kt
    tiles by bound are probed, and EVERY doc inside them is scored
    exactly (semantic: tile gather + MXU dot; lexical: one bisect-scatter
    of the pruned posting entries into the resident buffer — no sort, no
    one-hot comparison matrix). The certificate is the tile-max theorem
    applied to fused scores: if the k-th fused result >= every unprobed
    tile's bound (and the normalizers are certified exact), the result
    equals full-corpus fusion (reference core.py:199-271 semantics).

    Beats the candidate-union path (_hybrid_impact_impl) on clustered
    layouts because a topical query's true top-k concentrates in few
    tiles: probing 128 tiles scores ~16k docs exactly — covering entire
    topics where k_dense=512 covers 5% — at less cost than rescoring
    1.5k scattered candidates against 8k posting entries.
    """
    from hybridsearch_tpu.ops.dense import dense_tile_stats, gather_tile_scores
    from hybridsearch_tpu.ops.impact import slice_impact_runs

    B, D = q.shape
    N = docs.shape[0]
    n_tiles = -(-N // TILE)
    eps = jnp.float32(1e-12)
    T = starts.shape[1]

    # -- dense arm: per-tile exact maxima + exact alive min/max, one sweep
    tile_sem, smin, smax = dense_tile_stats(q, docs, bias, block_n=block_n)

    # -- lexical arm: pruned runs -> per-tile weight sums ------------------
    ids_r, ws_r = slice_impact_runs(
        imp_doc_ids, imp_weights, starts, lengths, p_depth=p_depth,
        n_docs=N, align=imp_align,
    )  # [B, T, p]
    W = T * p_depth
    ids_flat = ids_r.reshape(B, W)
    ws_flat = ws_r.reshape(B, W)
    tids = ids_flat // TILE  # sentinel ids land >= n_tiles -> drop
    rowsB = jnp.arange(B, dtype=jnp.int32)[:, None]
    S = jnp.sum(slack, axis=1)  # [B] per-doc missing-mass bound

    # per-term per-tile MAX weights — the block-max WAND bound at tile
    # granularity. A doc in tile τ scores at most
    #   Σ_t max(tile-max of term t in τ, slack_t)
    # (each term contributes one posting: its pruned entry is <= the
    # term's tile max, a truncated tail entry is <= slack_t). The naive
    # tile SUM bound (all postings of all docs in τ) is ~100x looser and
    # never lets the certificate close at 78k tiles.
    lex_bound_tile = jnp.zeros((B, n_tiles), jnp.float32)
    tids_r = ids_r // TILE  # [B, T, p]
    for t in range(T):
        bm_t = jnp.zeros((B, n_tiles), jnp.float32).at[
            rowsB, tids_r[:, t, :]].max(ws_r[:, t, :], mode="drop")
        lex_bound_tile = lex_bound_tile + jnp.maximum(
            bm_t, slack[:, t:t + 1])

    # -- joint bound + probe selection ------------------------------------
    rng_s = smax - smin
    if norm == "minmax":
        def nsem(x):
            return jnp.where(
                rng_s[:, None] > eps,
                (x - smin[:, None]) / jnp.maximum(rng_s[:, None], eps),
                jnp.ones_like(x),
            )
    else:  # "max"
        def nsem(x):
            return jnp.where(smax[:, None] > eps,
                             x / jnp.maximum(smax[:, None], eps), x)

    L0 = jnp.maximum(jnp.max(lex_bound_tile, axis=1), eps)
    bound0 = w_s * nsem(tile_sem) + w_l * lex_bound_tile / L0[:, None]
    kt_eff = min(kt, n_tiles)
    if n_tiles > 8192:
        from hybridsearch_tpu.ops.dense import tiled_matrix_topk as _tmk

        _, top_tiles = _tmk(bound0, kt_eff)
        top_tiles = jnp.maximum(top_tiles, 0)
    else:
        _, top_tiles = jax.lax.top_k(bound0, kt_eff)
    ts = jnp.sort(top_tiles, axis=1)  # ascending: bisect + buffer order

    # -- resident scores: sem via tile gather, lex via bisect-scatter ------
    s3, gidx3 = gather_tile_scores(q, docs, ts, bias)  # [B, R]
    R = kt_eff * TILE
    alive_res = jnp.isfinite(s3)
    pos = jax.vmap(jnp.searchsorted)(ts, tids)  # [B, W] in [0, kt_eff]
    pos_c = jnp.clip(pos, 0, kt_eff - 1)
    hit = jnp.take_along_axis(ts, pos_c, axis=1) == tids
    bufidx = jnp.where(hit, pos_c * TILE + ids_flat % TILE, R)
    lex_res = jnp.zeros((B, R), jnp.float32).at[rowsB, bufidx].add(
        ws_flat, mode="drop")
    lex_res = jnp.where(alive_res, lex_res, 0.0)
    lex_max1 = jnp.max(lex_res, axis=1)  # [B] >= 0
    L1 = jnp.maximum(lex_max1, eps)

    fused0 = w_s * nsem(s3) + w_l * lex_res / L1[:, None]
    fused0 = jnp.where(alive_res, fused0, NEG_INF)

    # -- cushion: exact lexical correction for the top-`margin` fused ------
    k_eff = min(k, R)
    c2 = min(max(margin, k_eff), R)
    if R > 4096:
        from hybridsearch_tpu.ops.dense import tiled_matrix_topk as _tmk2

        mvals, mpos = _tmk2(fused0, c2)
        mpos = jnp.maximum(mpos, 0)
    else:
        mvals, mpos = jax.lax.top_k(fused0, c2)
    mids = jnp.take_along_axis(gidx3, mpos, axis=1)
    msem = jnp.take_along_axis(s3, mpos, axis=1)
    mlex = jnp.take_along_axis(lex_res, mpos, axis=1)
    malive = jnp.isfinite(mvals) & (mvals > NEG_INF / 2)
    safe_m = jnp.where(malive, mids, N + 2)

    if hot_starts is not None:
        full_hot = cand_scores_bisect(full_doc_ids, full_weights,
                                      hot_starts, hot_lens, safe_m)
        # pruned prefix of the truncated columns, via the SAME scatter
        # structure as lex_res (no extra sort/bisect over candidates)
        ws_hot_flat = (ws_r * hot_cols[:, :, None]).reshape(B, W)
        hot_res = jnp.zeros((B, R), jnp.float32).at[rowsB, bufidx].add(
            ws_hot_flat, mode="drop")
        prefix_hot = jnp.take_along_axis(hot_res, mpos, axis=1)
        mlex_corr = jnp.maximum(mlex - prefix_hot + full_hot, 0.0)
    else:
        mlex_corr = mlex
    lex_max2 = jnp.maximum(
        lex_max1, jnp.max(jnp.where(malive, mlex_corr, 0.0), axis=1))
    L2 = jnp.maximum(lex_max2, eps)
    fused_corr = jnp.where(
        malive,
        w_s * nsem(msem) + w_l * mlex_corr / L2[:, None],
        NEG_INF,
    )
    vals_f, pos2 = jax.lax.top_k(fused_corr, min(k_eff, c2))
    idxs_f = jnp.take_along_axis(mids, pos2, axis=1)
    idxs_f = jnp.where(jnp.isfinite(vals_f) & (vals_f > NEG_INF / 2),
                       idxs_f, -1)

    # -- certificate -------------------------------------------------------
    # (a) unprobed tiles: no resident's fused score can reach the k-th
    #     result (joint bound under the FINAL normalizers);
    # (b) probed non-cushion docs: pruned fused + slack can't reach it;
    # (c) normalizer exactness: lex_max2 is the true global lexical max
    #     (it is an actual doc's exact score, and every other doc is
    #     bounded below it);
    # (d) min-max only: the true lexical min is 0 (some alive doc holds
    #     no query term) and sem stats are exact (full sweep: always).
    kth = vals_f[:, -1]
    probed = jnp.zeros((B, n_tiles), bool).at[rowsB, ts].set(True)
    bound_f = w_s * nsem(tile_sem) + w_l * lex_bound_tile / L2[:, None]
    tau_tile = jnp.max(jnp.where(probed, NEG_INF, bound_f), axis=1)
    c2_vals = mvals[:, -1]
    tau_mid = jnp.where(jnp.isfinite(c2_vals) & (c2_vals > NEG_INF / 2),
                        c2_vals + w_l * S / L2, NEG_INF)
    sel_mask = jnp.zeros((B, R), bool).at[rowsB, mpos].set(True)
    pruned_out_max = jnp.max(
        jnp.where(sel_mask, 0.0, jnp.maximum(lex_res, 0.0)), axis=1)
    lex_unprobed = jnp.maximum(
        jnp.max(jnp.where(probed, NEG_INF, lex_bound_tile), axis=1), 0.0)
    cert_norm = ((lex_max2 >= pruned_out_max + S)
                 & (lex_max2 >= lex_unprobed))
    cc = complete if corrected_complete is None else (
        complete | corrected_complete)
    exact = (cc & cert_norm
             & ((kth >= tau_tile) | ~jnp.isfinite(tau_tile))
             & ((kth >= tau_mid) | ~jnp.isfinite(tau_mid)))
    if norm == "minmax":
        if full_touched is not None:
            exact = exact & (full_touched < n_alive)
        else:
            touched = jnp.sum(lengths, axis=1)
            exact = exact & complete & (touched < n_alive)
    return HybridTopK(values=vals_f, indices=idxs_f, exact=exact)


def hybrid_tile_topk(
    q: jax.Array,
    docs: jax.Array,
    imp,  # ImpactPostings
    enc,  # ImpactQueryEnc
    k: int,
    w_s: float,
    w_l: float,
    bias: Optional[jax.Array] = None,
    kt: int = 128,
    p_depth: int = 1024,
    norm: str = "minmax",
    block_n: int = 262144,
    n_alive: Optional[int] = None,
    full_postings: Optional[Tuple[jax.Array, jax.Array]] = None,
    margin: int = 128,
) -> HybridTopK:
    """Tile-resident joint-bound hybrid (clustered layouts). Same fused
    semantics and HybridTopK contract as hybrid_impact_topk; `exact` is
    sound per-query. kt is the probe budget in 128-doc tiles — callers
    escalate it when certificates fail (retrieval/searcher.py)."""
    N = docs.shape[0]
    p = min(p_depth, imp.p_max)
    hs = hl = hc = fdi = fwi = None
    if full_postings is None:
        full_postings = getattr(enc, "full_postings", None)
    cc = ft = None
    if enc.hot_starts is not None and full_postings is not None:
        hs, hl, hc = enc.hot_starts, enc.hot_lens, enc.hot_cols
        fdi, fwi = full_postings
        if getattr(enc, "corrected_complete", None) is not None:
            cc = jnp.asarray(enc.corrected_complete)
        if getattr(enc, "full_touched", None) is not None:
            ft = jnp.asarray(enc.full_touched)
    return _hybrid_tile_impl(
        q, docs, imp.doc_ids, imp.weights,
        enc.starts, enc.lengths, enc.slack, jnp.asarray(enc.complete),
        jnp.float32(w_s), jnp.float32(w_l), bias,
        jnp.int32(N if n_alive is None else n_alive),
        hs, hl, hc, fdi, fwi, cc, ft,
        k=k, kt=kt, p_depth=p, norm=norm, block_n=block_n, margin=margin,
        imp_align=getattr(imp, "align", 1),
    )


def hybrid_sparse_topk(
    q: jax.Array,
    docs: jax.Array,
    postings: BM25Postings,
    groups: Sequence[Tuple[int, jax.Array, jax.Array]],
    k: int,
    w_s: float,
    w_l: float,
    bias: Optional[jax.Array] = None,
    k_dense: int = 128,
    m_tiles: int = 64,
    c_lex: int = 512,
    norm: str = "minmax",
    block_n: int = 262144,
    n_alive: Optional[int] = None,
    hot: Optional[Tuple[jax.Array, jax.Array, jax.Array]] = None,
) -> HybridTopK:
    """Exact hybrid top-k at scale without [B, N] score arrays.

    q must be L2-normalized; docs pre-normalized with docs.shape[0] % 128
    == 0 (capacity rounding guarantees it). groups come from
    BM25.encode_queries_bucketed with hot terms excluded when `hot` is
    given (ops/bm25.py encode_hot_terms: per-query rows into the postings'
    precomputed hot tile-bound table + run starts/lengths for bisection).
    Returns per-query `exact` flags; callers escalate (k_dense, m_tiles)
    or fall back to full fusion when False.
    """
    B = q.shape[0]
    N = docs.shape[0]
    n_tiles = N // TILE
    widths = tuple(int(w) for w, _s, _l in groups)
    run_arrays = tuple(a for _w, st, ln in groups for a in (st, ln))
    hot_rows = hot_starts = hot_lens = hot_bounds = None
    if hot is not None:
        hot_rows, hot_starts, hot_lens = hot
        hot_bounds = postings.hot_tile_bounds
        if hot_bounds.shape[1] < n_tiles:  # capacity-padded doc matrix
            hot_bounds = jnp.pad(
                hot_bounds, ((0, 0), (0, n_tiles - hot_bounds.shape[1]))
            )
    # lexical-min-is-zero certificate: postings touched < alive docs
    n_alive = N if n_alive is None else n_alive
    touched = np.zeros(B, dtype=np.int64)
    for _w, _st, ln in groups:
        touched += np.asarray(ln).sum(axis=1)
    if hot is not None:
        touched += np.asarray(hot_lens).sum(axis=1)
    lex_min_zero = jnp.asarray(touched < n_alive)
    return _hybrid_sparse_impl(
        q, docs, postings.doc_ids, postings.weights, run_arrays,
        hot_rows, hot_starts, hot_lens, hot_bounds,
        jnp.float32(w_s), jnp.float32(w_l), bias, lex_min_zero,
        k=k, k_dense=k_dense, m_tiles=m_tiles, c_lex=c_lex,
        widths=widths, norm=norm, block_n=block_n,
    )
