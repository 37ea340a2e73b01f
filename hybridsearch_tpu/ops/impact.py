"""Impact-ordered pruned postings — the TPU-shaped lexical arm at scale.

The exact sparse-correction hybrid (ops/hybrid.py) is bounded by XLA
gather/scatter throughput on TPU (~40-100M posting entries/s measured on
v5e), because every query must touch every posting of its terms. This
module implements the classic IR answer — impact-ordered index pruning
(per-term top-P postings by weight) — re-shaped for the TPU's strengths:

  build   per term, keep the P highest-weight postings, stored
          weight-descending ("impact order"), plus the P-th weight as the
          tail bound (slack). Terms with df <= P are complete (slack 0).
  query   top-Cp lexical candidates per term are the FIRST Cp entries of
          each pruned run — a contiguous slice, no sort, no scatter, no
          heap. The bound for any doc outside a term's top-Cp is that
          term's Cp-th weight (impact order makes the prefix the argmax).
  rescore candidate scores are computed by a ONE-HOT MATMUL on the MXU:
          score[c] = sum_w (cand[c] == ids[w]) * weight[w] — the
          comparison matrix streams through the systolic array instead of
          element-serial scatter. Measured ~100x the XLA scatter rate.

Semantics: scores are exact over the PRUNED entries; a doc's true BM25
score exceeds its pruned score by at most the sum of the slacks of the
query terms that do not cover it. `hybrid_impact_topk` (ops/hybrid.py)
reports a per-query `exact` flag that is True only when the top-k is
provably identical to full-corpus fusion (all query terms complete AND
the candidate-coverage bound closes). This replaces the reference's
score-everything hybrid (reference core.py:199-271) the way WAND/
block-max engines replace exhaustive scoring — bounded, flagged,
measurably near-exact.
"""

from __future__ import annotations

import functools
import os
from typing import List, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# Per-query term-count pad ladder (bounded compile set, like
# ops/bm25.py TERM_LADDER).
IMPACT_T_LADDER = (8, 16, 32)
# Serving-time slice depths must come from a fixed ladder too: p_depth is a
# static argument of the jitted rescore.
IMPACT_P_LADDER = (256, 1024, 4096)


class ImpactPostings(NamedTuple):
    """Device-resident impact-ordered pruned postings (term-major CSR).

    doc_ids/weights are weight-DESCENDING within each term's run and
    padded with one extra run of `p_max` sentinel entries (doc_id =
    n_docs, weight = 0) so every dynamic slice of width <= p_max is
    in-bounds.
    """

    doc_ids: jax.Array  # [nnz_pruned + p_max] int32
    weights: jax.Array  # [nnz_pruned + p_max] float32
    n_docs: int  # static
    p_max: int  # static — build-time prune depth
    starts_host: np.ndarray  # [V] int64 run starts
    lengths_host: np.ndarray  # [V] int64 pruned run lengths (= min(df, P))
    slack_host: np.ndarray  # [V] f32 — P-th weight when df > P else 0
    weights_host: np.ndarray  # [nnz_pruned] f32 — for depth-d slack lookups
    df_host: np.ndarray  # [V] int64 full document frequencies
    # build-time run-start alignment; the aligned slice fast paths
    # (row-gather / Pallas DMA) are gated on THIS value, never on the env
    # at slice time — an index built unaligned must take the general path
    align: int = 1


def build_impact_postings(
    term_ids: np.ndarray,
    doc_ids: np.ndarray,
    weights: np.ndarray,
    n_docs: int,
    vocab_size: int,
    p_max: int = IMPACT_P_LADDER[-1],
    align: int = 1,
) -> ImpactPostings:
    """Host-side build from COO (term, doc, weight) triples.

    One lexsort (term asc, weight desc) + one vectorized prefix mask —
    no per-term Python loops, so 100M+ posting corpora build in seconds.

    align > 1 pads every run start to that boundary (sentinel entries):
    required by the Pallas slice kernel, whose HBM DMAs must start on a
    Mosaic tiling boundary (ops/pallas_impact.py). Costs ~align/2 extra
    entries per term.
    """
    t = np.asarray(term_ids, dtype=np.int64)
    d = np.asarray(doc_ids, dtype=np.int64)
    w = np.asarray(weights, dtype=np.float32)
    order = np.lexsort((-w, t))
    t, d, w = t[order], d[order], w[order]
    df = np.bincount(t, minlength=vocab_size).astype(np.int64)
    starts_full = np.concatenate([[0], np.cumsum(df)])
    # keep mask: position-within-run < p_max (vectorized)
    pos_in_run = np.arange(len(t), dtype=np.int64) - starts_full[t]
    keep = pos_in_run < p_max
    imp_d = d[keep].astype(np.int32)
    imp_w = w[keep].astype(np.float32)
    keep_len = np.minimum(df, p_max)
    if align > 1:
        # scatter kept entries into align-padded run slots (vectorized)
        alloc = -(-keep_len // align) * align
        imp_starts = np.concatenate([[0], np.cumsum(alloc)])[:-1]
        nnz_p = int(alloc.sum())
        dst = (np.repeat(imp_starts, keep_len)
               + (np.arange(len(imp_d), dtype=np.int64)
                  - np.repeat(np.concatenate([[0], np.cumsum(keep_len)])[:-1],
                              keep_len)))
        d_al = np.full(nnz_p, n_docs, np.int32)
        w_al = np.zeros(nnz_p, np.float32)
        d_al[dst] = imp_d
        w_al[dst] = imp_w
        imp_d, imp_w = d_al, w_al
    else:
        imp_starts = np.concatenate([[0], np.cumsum(keep_len)])[:-1]
    # slack: weight at position p_max-1 of each truncated run
    slack = np.zeros(vocab_size, dtype=np.float32)
    trunc = df > p_max
    if trunc.any():
        slack[trunc] = w[starts_full[:-1][trunc] + p_max - 1]
    d_pad = np.concatenate([imp_d, np.full(p_max, n_docs, np.int32)])
    w_pad = np.concatenate([imp_w, np.zeros(p_max, np.float32)])
    return ImpactPostings(
        doc_ids=jnp.asarray(d_pad),
        weights=jnp.asarray(w_pad),
        n_docs=n_docs,
        p_max=p_max,
        starts_host=imp_starts.astype(np.int64),
        lengths_host=keep_len.astype(np.int64),
        slack_host=slack,
        weights_host=imp_w,
        df_host=df,
        align=align,
    )


_HOT_H_LADDER = (1, 2, 4)


class ImpactQueryEnc(NamedTuple):
    """Encoded query batch against an ImpactPostings tier."""

    starts: jax.Array  # [B, T] int32 pruned-run starts (pad -> sentinel run)
    lengths: jax.Array  # [B, T] int32 pruned-run lengths (pad -> 0)
    slack: jax.Array  # [B, T] f32 per-term tail bound AT the encode depth
    complete: np.ndarray  # [B] bool — every query term's full run covered
    certifiable_deeper: np.ndarray  # [B] bool — complete achievable at p_max
    t_pad: int  # static
    # [B] bool — every truncated term carries a hot (bisect) descriptor and
    # no term was dropped: the margin correction then produces EXACT
    # lexical scores for the cushion, enabling the margin-path certificate
    # (ops/hybrid.py) even when `complete` is False
    corrected_complete: Optional[np.ndarray] = None
    # [B] int64 — sum of FULL dfs of the query's terms; full_touched <
    # n_alive certifies the true lexical min is 0 (some alive doc contains
    # no query term), which the pruned `touched` sum cannot certify
    full_touched: Optional[np.ndarray] = None
    # hot-term margin correction (None unless full postings were provided
    # at encode): FULL doc-sorted run descriptors of query terms truncated
    # at the encode depth, plus which pruned column each occupies
    hot_starts: Optional[jax.Array] = None  # [B, Hm] int32 into full CSR
    hot_lens: Optional[jax.Array] = None  # [B, Hm] int32 (0 = pad)
    hot_cols: Optional[jax.Array] = None  # [B, T] bool — truncated columns
    # (doc_ids, weights) of the FULL doc-sorted CSR the hot descriptors
    # index into — attached by BM25.encode_queries_impact from the SAME
    # state snapshot, so callers can never pair this enc with postings
    # from a different index generation (ADVICE r2: snapshot skew between
    # the impact tier, the enc, and full_postings caused wrong bisection)
    full_postings: Optional[Tuple[jax.Array, jax.Array]] = None


def encode_impact_queries(
    imp: ImpactPostings,
    query_term_ids: Sequence[Sequence[int]],
    p_depth: Optional[int] = None,
    full_starts: Optional[np.ndarray] = None,
    full_lengths: Optional[np.ndarray] = None,
) -> ImpactQueryEnc:
    """Host-side encode: term-id lists -> padded [B, T] run descriptors.

    p_depth (<= p_max, from IMPACT_P_LADDER) limits the slice depth; the
    per-term slack is then the weight at position p_depth-1 (still a
    valid tail bound for everything below the slice).

    When full_starts/full_lengths (the FULL doc-sorted CSR's host run
    table) are given, terms truncated at the encode depth additionally get
    hot descriptors for the margin correction (ops/hybrid.py: exact
    bisection rescore of the top fused candidates)."""
    p = imp.p_max if p_depth is None else min(p_depth, imp.p_max)
    B = len(query_term_ids)
    longest = max((len(ids) for ids in query_term_ids), default=1)
    t_pad = next((t for t in IMPACT_T_LADDER if t >= longest),
                 IMPACT_T_LADDER[-1])
    sentinel_start = len(imp.weights_host)  # the all-pad tail run
    st = np.full((B, t_pad), sentinel_start, dtype=np.int32)
    ln = np.zeros((B, t_pad), dtype=np.int32)
    sl = np.zeros((B, t_pad), dtype=np.float32)
    complete = np.ones(B, dtype=bool)
    certifiable = np.ones(B, dtype=bool)
    corrected = np.ones(B, dtype=bool)
    full_touched = np.zeros(B, dtype=np.int64)
    with_hot = full_starts is not None and full_lengths is not None
    hot_cols = np.zeros((B, t_pad), dtype=bool)
    hot_rows: List[List[Tuple[int, int]]] = [[] for _ in range(B)]
    for b, ids in enumerate(query_term_ids):
        for j, tid in enumerate(ids[:t_pad]):
            full_len = int(imp.df_host[tid])
            full_touched[b] += full_len
            kept = int(imp.lengths_host[tid])
            s0 = int(imp.starts_host[tid])
            st[b, j] = s0
            ln[b, j] = min(kept, p)
            if full_len > p:
                # tail bound at this depth: p-th kept weight (impact order)
                sl[b, j] = float(imp.weights_host[s0 + min(p, kept) - 1])
                complete[b] = False
                # mark the column ONLY when it fits the bisect ladder: the
                # margin correction subtracts every marked column's pruned
                # prefix, so a marked-but-not-bisected term would make
                # scores WORSE than uncorrected
                if with_hot and len(hot_rows[b]) < _HOT_H_LADDER[-1]:
                    hot_cols[b, j] = True
                    hot_rows[b].append((int(full_starts[tid]),
                                        int(full_lengths[tid])))
                else:
                    # an uncorrected truncated term: margin scores are not
                    # exact, the margin certificate must not fire
                    corrected[b] = False
            if full_len > imp.p_max:
                certifiable[b] = False
        if len(ids) > t_pad:
            # dropped terms are absent from BOTH the pruned rescore and
            # the correction — nothing can certify
            complete[b] = False
            corrected[b] = False
            for tid in ids[t_pad:]:
                full_touched[b] += int(imp.df_host[tid])
            if len(ids) > IMPACT_T_LADDER[-1]:
                certifiable[b] = False
    hs = hl = hc = None
    longest_hot = max((len(r) for r in hot_rows), default=0)
    if with_hot and longest_hot:
        hm = next((h for h in _HOT_H_LADDER if h >= longest_hot),
                  _HOT_H_LADDER[-1])
        hs_np = np.zeros((B, hm), dtype=np.int32)
        hl_np = np.zeros((B, hm), dtype=np.int32)
        for b, rows in enumerate(hot_rows):
            for j, (s0, l0) in enumerate(rows[:hm]):
                hs_np[b, j], hl_np[b, j] = s0, l0
        hs, hl = jnp.asarray(hs_np), jnp.asarray(hl_np)
        hc = jnp.asarray(hot_cols)
    return ImpactQueryEnc(
        starts=jnp.asarray(st),
        lengths=jnp.asarray(ln),
        slack=jnp.asarray(sl),
        complete=complete,
        certifiable_deeper=certifiable,
        t_pad=t_pad,
        corrected_complete=corrected,
        full_touched=full_touched,
        hot_starts=hs,
        hot_lens=hl,
        hot_cols=hc,
    )


def _rescore_backend() -> str:
    """Candidate-rescore backend on TPU (HST_RESCORE): "sortmerge"
    (default — one key sort, no comparison matrix; the XLA one-hot
    materializes ~25 GB of comparisons per 10M batch at ~428 ms and the
    Mosaic broadcast-compare kernel measured ~404 ms, ~60x off VPU peak),
    "pallas", or "xla"."""
    import os

    if jax.default_backend() != "tpu":
        return "xla"
    return os.environ.get("HST_RESCORE", "sortmerge")


def _use_pallas_rescore() -> bool:
    return _rescore_backend() == "pallas"


def _use_pallas_slice() -> bool:
    """Pallas DMA slice kernel — still OPT-IN (HST_PALLAS_SLICE=1): this
    environment's remote compile helper has wedged on DMA-heavy kernels
    before, and the aligned row-gather XLA path already lowers to
    blockwise DMA. Values pinned by interpret-mode tests either way."""
    import os

    return (jax.default_backend() == "tpu"
            and os.environ.get("HST_PALLAS_SLICE", "0") == "1")


def _use_pallas() -> bool:
    # kept for backward compatibility: "is the impact fast path on at all"
    return _use_pallas_rescore()


def default_align() -> int:
    """Build-time run-start alignment for impact postings: 1024 on TPU
    (enables the row-gather slice fast path and the Pallas DMA kernel —
    costs ~align/2 sentinel entries per term), 1 elsewhere."""
    return 1024 if jax.default_backend() == "tpu" else 1


@functools.partial(jax.jit, static_argnames=("p_depth", "align"))
def slice_impact_runs(
    doc_ids: jax.Array,
    weights: jax.Array,
    starts: jax.Array,  # [B, T]
    lengths: jax.Array,  # [B, T]
    p_depth: int,
    n_docs: int,
    align: int = 1,
) -> Tuple[jax.Array, jax.Array]:
    """([B, T, p] ids, [B, T, p] weights) — contiguous top-p prefixes of
    each query term's impact run; invalid tails masked to (n_docs, 0).

    `align` MUST be the postings' build-time run-start alignment
    (ImpactPostings.align) — the fast paths below are sound only when every
    start is an align-multiple, so the gate is the recorded build value,
    never the env at slice time.

    Fast paths for aligned builds:
      - row-gather (pure XLA): reshape the postings to [M, R] rows with
        R | gcd(align, p_depth); each slice is then p/R whole-row gathers,
        which XLA lowers to blockwise DMA instead of the scalar gather
        pipeline the vmapped dynamic_slice takes.
      - Pallas (HST_PALLAS_IMPACT=1): explicit async DMA per (b, t) block
        with the starts prefetched to SMEM (ops/pallas_impact.py)."""
    import math

    B, T = starts.shape
    iota = jax.lax.broadcasted_iota(jnp.int32, (1, 1, p_depth), 2)
    R = math.gcd(align, p_depth)
    if _use_pallas_slice() and p_depth % 1024 == 0 and align % 1024 == 0:
        from hybridsearch_tpu.ops.pallas_impact import pallas_slice_runs

        ids_f, ws_f = pallas_slice_runs(doc_ids, weights, starts, p=p_depth,
                                        align=1024)
        ids_r = ids_f.reshape(B, T, p_depth)
        ws_r = ws_f.reshape(B, T, p_depth)
    elif R >= 256:
        rows = doc_ids.shape[0] // R
        ids2 = doc_ids[: rows * R].reshape(rows, R)
        ws2 = weights[: rows * R].reshape(rows, R)
        m = p_depth // R
        base = ((starts // R)[:, :, None]
                + jax.lax.broadcasted_iota(jnp.int32, (1, 1, m), 2))
        base = jnp.minimum(base, rows - 1)
        ids_r = jnp.take(ids2, base, axis=0).reshape(B, T, p_depth)
        ws_r = jnp.take(ws2, base, axis=0).reshape(B, T, p_depth)
    else:
        def one(s):
            return (jax.lax.dynamic_slice(doc_ids, (s,), (p_depth,)),
                    jax.lax.dynamic_slice(weights, (s,), (p_depth,)))

        ids_r, ws_r = jax.vmap(jax.vmap(one))(starts)
    valid = iota < lengths[:, :, None]
    return (jnp.where(valid, ids_r, jnp.int32(n_docs)),
            jnp.where(valid, ws_r, 0.0))


def sortmerge_rescore_multi(
    cand: jax.Array,  # [B, C] candidate doc ids (sentinels never match)
    ids_flat: jax.Array,  # [B, W] pruned posting doc ids (pad = n_docs)
    ws_list: Sequence[jax.Array],  # each [B, W] posting weights (pad = 0)
) -> Tuple[jax.Array, ...]:
    """Per weight vector, [B, C] exact sums of pruned posting weights at
    each candidate via key sorts — no [C, W] comparison anywhere.
    Multiple weight vectors (the hybrid's full weights + the margin
    correction's marked-column weights) share the sorts and pay only an
    extra segmented scan each.

    The posting axis is processed in chunks of <= _SORTMERGE_CHUNK and
    the per-chunk candidate scores summed — exact by additivity of the
    posting weights. Chunking keeps every sort at most
    (_SORTMERGE_CHUNK + C) wide: this environment's remote compile
    helper has wedged on ~18k-wide multi-operand sorts (deep rungs,
    p_depth=1024 x 16 terms), while the ~6k-wide serving-rung shape
    compiles cleanly; narrower sorts also tile better lane-wise."""
    W = ids_flat.shape[1]
    chunk = int(os.environ.get("HST_SORTMERGE_CHUNK", "4096"))
    if W <= chunk:
        return _sortmerge_core(cand, ids_flat, ws_list)
    totals = None
    for s in range(0, W, chunk):
        e = min(s + chunk, W)
        part = _sortmerge_core(cand, ids_flat[:, s:e],
                               [w[:, s:e] for w in ws_list])
        totals = part if totals is None else tuple(
            t + p for t, p in zip(totals, part))
    return totals


def _sortmerge_core(
    cand: jax.Array,
    ids_flat: jax.Array,
    ws_list: Sequence[jax.Array],
) -> Tuple[jax.Array, ...]:
    """One-sort rescore over a single posting chunk.

    Keys are 2*id for postings and 2*id+1 for candidates, so after the
    sort every candidate sits directly after all postings with its id; a
    SEGMENTED cumsum (reset at id boundaries, so no long-prefix f32
    cancellation) hands each candidate its id's total posting weight, and
    a second sort by stored column (postings carry pos = C, sorting to
    the tail) restores original order — a sort is far cheaper than a
    [B, C+W] element-scatter on TPU. int32 keys: doc ids are int32
    throughout the engine and 2*id+1 stays in range for n_docs < 2^30."""
    B, C = cand.shape
    W = ids_flat.shape[1]
    key = jnp.concatenate(
        [ids_flat.astype(jnp.int32) * 2, cand.astype(jnp.int32) * 2 + 1],
        axis=1,
    )
    zeros_c = jnp.zeros((B, C), jnp.float32)
    ws_cat = [jnp.concatenate([w, zeros_c], axis=1) for w in ws_list]
    pos = jnp.concatenate(
        [jnp.full((B, W), C, jnp.int32),
         jnp.broadcast_to(jax.lax.broadcasted_iota(jnp.int32, (1, C), 1),
                          (B, C))],
        axis=1,
    )
    key_s, pos_s, *ws_s = jax.lax.sort((key, pos, *ws_cat), dimension=1,
                                       num_keys=1)
    id_s = key_s >> 1
    new_run = jnp.concatenate(
        [jnp.ones((B, 1), bool), id_s[:, 1:] != id_s[:, :-1]], axis=1
    )

    def seg(a, b):
        va, ga = a
        vb, gb = b
        return jnp.where(gb, vb, va + vb), ga | gb

    sums = [jax.lax.associative_scan(seg, (w_s, new_run), axis=1)[0]
            for w_s in ws_s]
    _pos2, *outs = jax.lax.sort((pos_s, *sums), dimension=1, num_keys=1)
    return tuple(o[:, :C] for o in outs)


@jax.jit
def sortmerge_rescore(
    cand: jax.Array,
    ids_flat: jax.Array,
    ws_flat: jax.Array,
) -> jax.Array:
    """Single-weight wrapper over sortmerge_rescore_multi."""
    return sortmerge_rescore_multi(cand, ids_flat, (ws_flat,))[0]


@functools.partial(jax.jit, static_argnames=("bq",))
def onehot_rescore(
    cand: jax.Array,  # [B, C] candidate doc ids (sentinels never match)
    ids_flat: jax.Array,  # [B, W] pruned posting doc ids (pad = n_docs)
    ws_flat: jax.Array,  # [B, W] pruned posting weights (pad = 0)
    bq: int = 8,
) -> jax.Array:
    """[B, C] exact sums of pruned posting weights at each candidate, via
    a one-hot comparison matmul on the MXU.

    A[c, w] = (cand[c] == ids[w]) is exact in bf16 (0/1); the f32-
    accumulated dot A @ ws gives candidate scores at matmul speed instead
    of element-serial scatter/gather. Pad candidates (id = n_docs) match
    only pad postings whose weight is 0, so they score 0 by construction.
    Blocked over bq queries to bound the [bq, C, W] comparison transient.
    """
    B, C = cand.shape
    W = ids_flat.shape[1]
    if _rescore_backend() == "sortmerge":
        return sortmerge_rescore(cand, ids_flat, ws_flat)
    if _use_pallas_rescore() and W % 1024 == 0:
        from hybridsearch_tpu.ops.pallas_impact import pallas_onehot_rescore

        cp = (-(-C // 128)) * 128
        if cp != C:
            cand = jnp.pad(cand, ((0, 0), (0, cp - C)), constant_values=-1)
        bp = (-(-B // 8)) * 8
        if bp != B:
            cand = jnp.pad(cand, ((0, bp - B), (0, 0)), constant_values=-1)
            ids_flat = jnp.pad(ids_flat, ((0, bp - B), (0, 0)),
                               constant_values=-2)
            ws_flat = jnp.pad(ws_flat, ((0, bp - B), (0, 0)))
        return pallas_onehot_rescore(cand, ids_flat, ws_flat)[:B, :C]
    nb = -(-B // bq)
    if nb * bq != B:
        pad = nb * bq - B
        cand = jnp.pad(cand, ((0, pad), (0, 0)), constant_values=-1)
        ids_flat = jnp.pad(ids_flat, ((0, pad), (0, 0)), constant_values=-2)
        ws_flat = jnp.pad(ws_flat, ((0, pad), (0, 0)))

    def blk(x):
        ca, idsb, wsb = x
        a = (ca[:, :, None] == idsb[:, None, :]).astype(jnp.bfloat16)
        return jax.lax.dot_general(
            a, wsb[..., None].astype(jnp.float32),
            (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )[..., 0]

    out = jax.lax.map(
        blk,
        (cand.reshape(nb, bq, C), ids_flat.reshape(nb, bq, W),
         ws_flat.reshape(nb, bq, W)),
    )
    return out.reshape(nb * bq, C)[:B]


def impact_scores_np(
    imp: ImpactPostings,
    term_ids: Sequence[int],
    p_depth: Optional[int] = None,
) -> np.ndarray:
    """NumPy oracle: dense [n_docs] pruned lexical scores for one query.
    Used by tests to pin the device path bit-for-bit (f32 sums)."""
    p = imp.p_max if p_depth is None else min(p_depth, imp.p_max)
    out = np.zeros(imp.n_docs, dtype=np.float64)
    for tid in term_ids:
        s0 = int(imp.starts_host[tid])
        ln = min(int(imp.lengths_host[tid]), p)
        d = np.asarray(imp.doc_ids[s0:s0 + ln])
        w = np.asarray(imp.weights[s0:s0 + ln])
        np.add.at(out, d, w)
    return out.astype(np.float32)
