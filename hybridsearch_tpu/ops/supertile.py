"""Supertile hybrid — exact-resident, scatter-free fused top-k at scale.

The v1 tile path (ops/hybrid.py hybrid_tile_topk) is bounded by XLA
scatter throughput on TPU: its per-term block-max bounds and its resident
lexical scores are both built by wide scatter-adds into [B, n_tiles] /
[B, R] buffers (measured ~400 ms/batch each at 10M docs), and its pruned
posting slices force a margin/slack correction ladder to recover
exactness. This module is the redesign that removes every wide scatter
and the entire slack machinery:

  build   * a DENSE per-term supertile-maximum table [V, n_super]
            (supertile = 128 tiles = 16384 docs): sup_max[t, s] is the
            exact max BM25 weight of term t over docs in supertile s.
            Bounds are then a row GATHER + sum — no scatter, no slack,
            no truncation (the table covers every posting).
          * the full doc-sorted CSR reshaped to 128-wide rows so any
            query-term window can be fetched as whole-row gathers
            (blockwise DMA), never element gathers.
  query   1. one streaming MXU sweep -> exact per-tile semantic maxima
             and exact alive min/max (ops/dense.py dense_tile_stats).
          2. joint supertile bound = w_s*nsem(supertile sem max)
             + w_l*nlex(sum_t sup_max[t, s]) — sound upper bound on any
             resident's fused score; top-S supertiles are probed.
          3. EVERY doc in a probed supertile is scored EXACTLY:
             sem via contiguous tile gathers + MXU dot
             (ops/dense.py gather_tile_scores); lex via the term's
             doc-sorted CSR window inside the supertile (bisect the run
             ends, row-gather the window) placed by a FACTORIZED ONE-HOT
             MATMUL: out[r, c] = sum_e (l_e//128==r)*(l_e%128==c)*w_e
             — two [E, 128] one-hot factors and one MXU contraction per
             (query, supertile) instead of a scatter.
          4. certificate: the k-th fused result >= every unprobed
             supertile's joint bound under the FINAL normalizers, and
             the resident lexical max dominates every unprobed
             supertile's lexical bound (so the normalizer is the true
             global max). Residents are exact by construction, so there
             is no margin/cushion pass at all.

Semantics matched: the reference's full hybrid fusion (reference
core.py:199-271 — min-max normalize both arms over alive docs, weighted
sum, top-k); `exact` is True only when the result provably equals
full-corpus fusion.
"""

from __future__ import annotations

import functools
from typing import List, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from hybridsearch_tpu.ops.hybrid import NEG_INF, HybridTopK

TILE = 128
ROW = 128  # CSR row width for whole-row window gathers

# Static window-cap ladder: the per-(term, supertile) CSR window is
# gathered at a fixed width; encode picks the smallest rung covering the
# query terms' build-time maxima (bounded compile set).
WCAP_LADDER = (512, 1024, 2048, 4096, 8192, 16384)
# Per-query term-count pad ladder (same as ops/impact.py).
SUPER_T_LADDER = (8, 16, 32)


class SuperPostings(NamedTuple):
    """Build-time lexical structures for the supertile hybrid."""

    sup_max: jax.Array  # [V+1, n_super] f32 per-term supertile maxima
    #                     (row V is zeros — the query-pad sentinel)
    sup_pos: jax.Array  # [V+1, n_super+1] int32 — absolute CSR position
    #                     of term t's first posting in supertile >= s;
    #                     window bounds are then ONE gather instead of a
    #                     31-step device bisection (35.6 ms/batch at 10M:
    #                     serial latency-bound gathers)
    ids_rows: jax.Array  # [M, ROW] int32 full doc-sorted CSR ids (pad n_docs)
    ws_rows: jax.Array  # [M, ROW] f32 full CSR weights (pad 0)
    n_docs: int
    n_super: int
    super_tiles: int  # tiles per supertile
    starts_host: np.ndarray  # [V] int64 run starts into the flat CSR
    df_host: np.ndarray  # [V] int64 full document frequencies
    win_max_host: np.ndarray  # [V] int64 max (term, supertile) window width

    @property
    def super_docs(self) -> int:
        return self.super_tiles * TILE


def build_super_postings(
    term_ids: np.ndarray,
    doc_ids: np.ndarray,
    weights: np.ndarray,
    n_docs: int,
    vocab_size: int,
    super_tiles: int = 128,
) -> SuperPostings:
    """Host-side build from term-major doc-sorted COO triples.

    One pass of segment reductions (np.maximum.reduceat over the
    (term, supertile) boundaries the sorted order already provides) — no
    per-term Python loops, no host scatters over the nnz axis."""
    t = np.asarray(term_ids, dtype=np.int64)
    d = np.asarray(doc_ids, dtype=np.int64)
    w = np.asarray(weights, dtype=np.float32)
    assert len(t) < 2**31, "int32 CSR positions (sup_pos) cap nnz at 2^31"
    V = vocab_size
    sd = super_tiles * TILE
    n_tiles = max(1, -(-n_docs // TILE))
    n_super = max(1, -(-n_tiles // super_tiles))
    df = np.bincount(t, minlength=V).astype(np.int64)
    starts = np.concatenate([[0], np.cumsum(df)])[:-1]

    table = np.zeros((V + 1, n_super), dtype=np.float32)
    pos_tab = np.zeros((V + 1, n_super + 1), dtype=np.int32)
    pos_tab[:V, n_super] = (starts + df).astype(np.int32)
    win_max = np.zeros(V, dtype=np.int64)
    nnz = len(t)
    if nnz:
        sig = d // sd
        key = t * n_super + sig
        bnd = np.flatnonzero(np.diff(key)) + 1
        seg_starts = np.concatenate([[0], bnd])
        seg_t = t[seg_starts]
        seg_s = sig[seg_starts]
        table[seg_t, seg_s] = np.maximum.reduceat(w, seg_starts)
        seg_len = np.diff(np.concatenate([seg_starts, [nnz]]))
        # per-term max window width: reduceat over term boundaries of the
        # (already term-sorted) segment list
        tb = np.concatenate([[0], np.flatnonzero(np.diff(seg_t)) + 1])
        win_max[seg_t[tb]] = np.maximum.reduceat(seg_len, tb)
        # boundary positions: reverse fill — a supertile with no segment
        # inherits the next one's start (first position with sig >= s)
        present = np.zeros((V, n_super), bool)
        seg_pos = np.zeros((V, n_super), np.int64)
        present[seg_t, seg_s] = True
        seg_pos[seg_t, seg_s] = seg_starts
        for s in range(n_super - 1, -1, -1):
            pos_tab[:V, s] = np.where(present[:, s], seg_pos[:, s],
                                      pos_tab[:V, s + 1])

    M = max(1, -(-(nnz + 1) // ROW))
    ids_pad = np.full(M * ROW, n_docs, dtype=np.int32)
    ws_pad = np.zeros(M * ROW, dtype=np.float32)
    ids_pad[:nnz] = d
    ws_pad[:nnz] = w
    return SuperPostings(
        sup_max=jnp.asarray(table),
        sup_pos=jnp.asarray(pos_tab),
        ids_rows=jnp.asarray(ids_pad.reshape(M, ROW)),
        ws_rows=jnp.asarray(ws_pad.reshape(M, ROW)),
        n_docs=n_docs,
        n_super=n_super,
        super_tiles=super_tiles,
        starts_host=starts,
        df_host=df,
        win_max_host=win_max,
    )


def save_super_postings(sp: SuperPostings, path: str) -> None:
    """Persist the build-time supertile structures as separate .npy
    files (mmap-able on load — a compressed npz can neither mmap nor
    stream, and np.load of multi-GB npz archives measured ~30 s on this
    host). Lets a cold bench/serving process skip the host-side build
    (VERDICT r3: the driver bench must measure, not rebuild)."""
    import json as _json
    import os as _os

    _os.makedirs(path, exist_ok=True)
    for name in ("sup_max", "sup_pos", "ids_rows", "ws_rows"):
        np.save(_os.path.join(path, f"{name}.npy"),
                np.asarray(getattr(sp, name)))
    np.save(_os.path.join(path, "starts_host.npy"), sp.starts_host)
    np.save(_os.path.join(path, "df_host.npy"), sp.df_host)
    np.save(_os.path.join(path, "win_max_host.npy"), sp.win_max_host)
    with open(_os.path.join(path, "meta.json"), "w") as f:
        _json.dump({"n_docs": sp.n_docs, "n_super": sp.n_super,
                    "super_tiles": sp.super_tiles, "version": 1}, f)


def load_super_postings(path: str) -> SuperPostings:
    """Load structures persisted by save_super_postings. Device arrays
    upload straight from mmap (no host copy)."""
    import json as _json
    import os as _os

    with open(_os.path.join(path, "meta.json")) as f:
        meta = _json.load(f)
    dev = {name: jnp.asarray(np.load(_os.path.join(path, f"{name}.npy"),
                                     mmap_mode="r"))
           for name in ("sup_max", "sup_pos", "ids_rows", "ws_rows")}
    return SuperPostings(
        n_docs=int(meta["n_docs"]), n_super=int(meta["n_super"]),
        super_tiles=int(meta["super_tiles"]),
        starts_host=np.load(_os.path.join(path, "starts_host.npy")),
        df_host=np.load(_os.path.join(path, "df_host.npy")),
        win_max_host=np.load(_os.path.join(path, "win_max_host.npy")),
        **dev,
    )


class ShardedSuperPostings(NamedTuple):
    """Per-shard supertile structures stacked on the leading axis, for
    the mesh serving path (parallel/collectives.py
    sharded_supertile_topk). Doc ids inside each shard's CSR are LOCAL
    (global - shard * docs_per_shard); tables cover the shard's slice."""

    sup_max: np.ndarray  # [S, V+1, ns_l] f32
    sup_pos: np.ndarray  # [S, V+1, ns_l+1] int32
    ids_rows: np.ndarray  # [S, M_l, ROW] int32 (pad = docs_per_shard)
    ws_rows: np.ndarray  # [S, M_l, ROW] f32
    docs_per_shard: int
    n_docs: int
    super_tiles: int
    df_host: np.ndarray  # [V] GLOBAL dfs (encode: full_touched)
    win_max_host: np.ndarray  # [V] max window width over ALL shards


def build_super_postings_sharded(
    term_ids: np.ndarray,
    doc_ids: np.ndarray,
    weights: np.ndarray,
    n_docs: int,
    vocab_size: int,
    docs_per_shard: int,
    n_shards: int,
    super_tiles: int = 128,
) -> ShardedSuperPostings:
    """Split the term-major doc-sorted COO by doc range and build each
    shard's SuperPostings with LOCAL doc ids. docs_per_shard must cover
    n_docs over n_shards (capacity padding rounds it)."""
    t = np.asarray(term_ids, dtype=np.int64)
    d = np.asarray(doc_ids, dtype=np.int64)
    w = np.asarray(weights, dtype=np.float32)
    parts = []
    for s in range(n_shards):
        base = s * docs_per_shard
        m = (d >= base) & (d < base + docs_per_shard)
        parts.append(build_super_postings(
            t[m], d[m] - base, w[m], docs_per_shard, vocab_size,
            super_tiles=super_tiles))
    M_l = max(p.ids_rows.shape[0] for p in parts)
    ids_s = np.full((n_shards, M_l, ROW), docs_per_shard, np.int32)
    ws_s = np.zeros((n_shards, M_l, ROW), np.float32)
    for s, p in enumerate(parts):
        ids_s[s, : p.ids_rows.shape[0]] = np.asarray(p.ids_rows)
        ws_s[s, : p.ws_rows.shape[0]] = np.asarray(p.ws_rows)
    return ShardedSuperPostings(
        sup_max=np.stack([np.asarray(p.sup_max) for p in parts]),
        sup_pos=np.stack([np.asarray(p.sup_pos) for p in parts]),
        ids_rows=ids_s,
        ws_rows=ws_s,
        docs_per_shard=docs_per_shard,
        n_docs=n_docs,
        super_tiles=super_tiles,
        df_host=np.sum([p.df_host for p in parts], axis=0),
        win_max_host=np.max([p.win_max_host for p in parts], axis=0),
    )


def encode_super_queries_sharded(
    ssp: ShardedSuperPostings,
    query_term_ids: Sequence[Sequence[int]],
) -> "SuperQueryEnc":
    """Encode against the GLOBAL df/window stats of a sharded build —
    same SuperQueryEnc contract (starts/lens are unused by the sharded
    path, which reads per-shard position tables)."""
    return _encode_super_vectorized(
        query_term_ids, ssp.df_host, ssp.win_max_host, starts_host=None,
        cap=min(ssp.super_tiles * TILE, WCAP_LADDER[-1]), wcap=None,
    )


def _encode_super_vectorized(
    query_term_ids: Sequence[Sequence[int]],
    df_host: np.ndarray,
    win_max_host: np.ndarray,
    starts_host: Optional[np.ndarray],
    cap: int,
    wcap: Optional[int],
) -> "SuperQueryEnc":
    """Vectorized host encode shared by the single-device and sharded
    paths. The per-query Python loops cost 9.3 ms per 256-query batch
    (~6% of the whole 10M serving budget) — here the ragged id lists
    flatten once and every lookup/sort/df-sum is a numpy batch op."""
    B = len(query_term_ids)
    V = len(df_host)
    lens = np.fromiter((len(ids) for ids in query_term_ids),
                       dtype=np.int64, count=B)
    total = int(lens.sum())
    longest = int(lens.max()) if B else 1
    t_pad = next((t for t in SUPER_T_LADDER if t >= max(longest, 1)),
                 SUPER_T_LADDER[-1])
    flat = np.fromiter((t for ids in query_term_ids for t in ids),
                       dtype=np.int64, count=total)
    row_of = np.repeat(np.arange(B, dtype=np.int64), lens)
    off = np.zeros(B + 1, dtype=np.int64)
    np.cumsum(lens, out=off[1:])
    pos_in_row = np.arange(total, dtype=np.int64) - off[row_of]

    full_touched = np.zeros(B, dtype=np.int64)
    np.add.at(full_touched, row_of, df_host[flat])
    complete = lens <= t_pad

    tid = np.full((B, t_pad), V, dtype=np.int64)
    keep = pos_in_row < t_pad
    tid[row_of[keep], pos_in_row[keep]] = flat[keep]

    # widest-window-first slotting (pad entries have window 0 -> last);
    # stable argsort keeps the original order on ties, matching the
    # previous per-query sorted(key=-win_max)
    win_ext = np.concatenate([win_max_host, [0]])
    wm = win_ext[tid]  # [B, t_pad]
    order = np.argsort(-wm, axis=1, kind="stable")
    tid = np.take_along_axis(tid, order, axis=1)
    wm = np.take_along_axis(wm, order, axis=1)

    if starts_host is not None:
        st_ext = np.concatenate([starts_host, [0]])
        df_ext = np.concatenate([df_host, [0]])
        st = st_ext[tid].astype(np.int32)
        ln = df_ext[tid].astype(np.int32)
    else:
        st = np.zeros((B, t_pad), dtype=np.int32)
        ln = np.zeros((B, t_pad), dtype=np.int32)

    slot_need = np.maximum(wm.max(axis=0), 1) if B else np.ones(t_pad)

    def _rung(need):
        r = next((c for c in WCAP_LADDER if c >= min(int(need), cap)), cap)
        return min(r, max(cap, WCAP_LADDER[0]))

    if wcap is None:
        # canonical TWO-rung pattern (widest slot, rest): wcaps is a jit
        # compile key; free-form per-slot tuples would recompile on
        # every query mix
        rest = _rung(slot_need[1:].max()) if t_pad > 1 else None
        wcaps = (_rung(slot_need[0]),) + (rest,) * (t_pad - 1)
    else:
        wcaps = (int(wcap),) * t_pad
    return SuperQueryEnc(
        term_ids=jnp.asarray(tid.astype(np.int32)),
        starts=jnp.asarray(st),
        lens=jnp.asarray(ln),
        complete=complete,
        full_touched=full_touched,
        wcaps=wcaps,
        t_pad=t_pad,
    )


class SuperQueryEnc(NamedTuple):
    """Encoded query batch against a SuperPostings build."""

    term_ids: jax.Array  # [B, T] int32 (pad = V -> the table's zero row)
    starts: jax.Array  # [B, T] int32 full-run starts (pad -> 0, len 0)
    lens: jax.Array  # [B, T] int32 full dfs (pad -> 0)
    complete: np.ndarray  # [B] bool — no term dropped by the T pad
    full_touched: np.ndarray  # [B] int64 — sum of full dfs (lex-min-0 cert)
    wcaps: tuple  # static per-SLOT window caps (WCAP_LADDER rungs;
    #               terms are slotted widest-first at encode)
    t_pad: int

    @property
    def wcap(self) -> int:  # back-compat: the widest slot's cap
        return max(self.wcaps)


def encode_super_queries(
    sp: SuperPostings,
    query_term_ids: Sequence[Sequence[int]],
    wcap: Optional[int] = None,
) -> SuperQueryEnc:
    """Host-side encode: term-id lists -> padded [B, T] run descriptors.

    Terms are sorted WIDEST-WINDOW-FIRST into the slots and each SLOT
    gets its own WCAP_LADDER rung (the smallest covering every term in
    that slot across the batch) — a query's one hot term no longer
    forces every other term's window to the batch-max cap, which cuts
    the placement contraction and window gather ~3-4x on typical mixed
    queries. No window can silently truncate (rungs cover the build-time
    maxima). Passing `wcap` forces one uniform rung (tests)."""
    return _encode_super_vectorized(
        query_term_ids, sp.df_host, sp.win_max_host,
        starts_host=sp.starts_host,
        cap=min(sp.super_docs, WCAP_LADDER[-1]), wcap=wcap,
    )


def _window_bounds(sup_pos, term_ids, sup_s):
    """[B, T, S] (lo, hi) absolute CSR window positions for every
    (query term slot, probed supertile) — one gather of the build-time
    boundary-position table (a device bisection measured 35.6 ms/batch
    at 10M). Supertiles past the table (capacity padding) get empty
    windows."""
    ns_tab = sup_pos.shape[1] - 1  # table's n_super (pre-padding)
    sup_c = jnp.minimum(sup_s, ns_tab - 1)
    tab_idx = term_ids[:, :, None] * (ns_tab + 1) + sup_c[:, None, :]
    pos_flat = sup_pos.reshape(-1)
    lo = jnp.take(pos_flat, tab_idx)  # [B, T, S] abs CSR positions
    hi = jnp.take(pos_flat, tab_idx + 1)
    in_tab = (sup_s < ns_tab)[:, None, :]
    lo = jnp.where(in_tab, lo, 0)
    hi = jnp.where(in_tab, hi, 0)
    return lo, hi


def _place_windows_fused(sup_pos, ids_rows, ws_rows, term_ids, sup_s, sd,
                         wcaps, super_tiles):
    """Gather-fused placement: window bounds from the position table,
    then ONE Pallas kernel that DMAs each slot's CSR window from HBM and
    accumulates the one-hot placement — no [B, S, E] staging arrays
    (pallas_place_fused). Returns (lex4 [B, S, St, TILE], ovf [B])."""
    from hybridsearch_tpu.ops.pallas_supertile import pallas_place_fused

    B, T = term_ids.shape
    S = sup_s.shape[1]
    lo, hi = _window_bounds(sup_pos, term_ids, sup_s)
    ovf = jnp.any(
        (hi - lo) > jnp.asarray(wcaps, jnp.int32)[None, :, None],
        axis=(1, 2))
    lo_f = lo.transpose(0, 2, 1).reshape(B * S, T)
    hi_f = hi.transpose(0, 2, 1).reshape(B * S, T)
    base = (sup_s * sd).astype(jnp.int32).reshape(B * S)
    lex4 = pallas_place_fused(lo_f, hi_f, base, ids_rows, ws_rows,
                              wcaps=tuple(wcaps),
                              super_tiles=super_tiles, tile=TILE,
                              interpret=_interpret_kernels())
    return lex4.reshape(B, S, super_tiles, TILE), ovf


def _resident_windows(sup_pos, ids_rows, ws_rows, term_ids, sup_s, sd,
                      wcaps, ech: int = 1024):
    """Per-SLOT CSR windows for every (query term, probed supertile):
    bounds from the boundary-position table (one gather — a device
    bisection measured 35.6 ms/batch at 10M), whole-row window gathers,
    per-slot caps (encode slots terms widest-first). Returns
    (l_cat [B, S, TEp] local doc ids, w_cat weights, ovf [B])."""
    B, T = term_ids.shape
    S = sup_s.shape[1]
    base = (sup_s * sd).astype(jnp.int32)  # [B, S]
    lo, hi = _window_bounds(sup_pos, term_ids, sup_s)
    M = ids_rows.shape[0]
    ovf = jnp.zeros((B,), bool)
    parts_l, parts_w = [], []
    for j, wc in enumerate(wcaps):
        lo_j, hi_j = lo[:, j], hi[:, j]  # [B, S]
        ovf = ovf | jnp.any((hi_j - lo_j) > wc, axis=1)
        m_j = wc // ROW + 1
        E_j = m_j * ROW
        row0 = lo_j // ROW
        rows_idx = jnp.minimum(
            row0[..., None] + jax.lax.broadcasted_iota(
                jnp.int32, (1, 1, m_j), 2),
            M - 1,
        )  # [B, S, m]
        wi = jnp.take(ids_rows, rows_idx, axis=0).reshape(B, S, E_j)
        ww = jnp.take(ws_rows, rows_idx, axis=0).reshape(B, S, E_j)
        gpos = (row0[..., None] * ROW
                + jax.lax.broadcasted_iota(jnp.int32, (1, 1, E_j), 2))
        valid = (gpos >= lo_j[..., None]) & (gpos < hi_j[..., None])
        w_j = jnp.where(valid, ww, 0.0)
        l_j = wi - base[:, :, None]  # [B, S, E_j] local doc ids
        pad_e = -(-E_j // ech) * ech - E_j
        if pad_e:
            l_j = jnp.pad(l_j, ((0, 0), (0, 0), (0, pad_e)),
                          constant_values=-1)
            w_j = jnp.pad(w_j, ((0, 0), (0, 0), (0, pad_e)))
        parts_l.append(l_j)
        parts_w.append(w_j)
    return (jnp.concatenate(parts_l, axis=2),
            jnp.concatenate(parts_w, axis=2), ovf)


def _place_windows(l_cat, w_cat, super_tiles, use_pallas: bool,
                   ech: int = 1024):
    """[B, S, super_tiles, TILE] resident lexical buffers via the
    factorized one-hot placement: out[b,s,r,c] += sum_e
    (l//TILE == r) * (l%TILE == c) * w — MXU contractions instead of a
    scatter. Out-of-range l (entries just outside the window, already
    weight-masked anyway) match no r row."""
    B, S, TEp = l_cat.shape
    n_ch = TEp // ech
    if use_pallas:
        import os as _os

        from hybridsearch_tpu.ops.pallas_supertile import (
            pallas_place_windows,
        )

        return pallas_place_windows(
            l_cat.reshape(B * S, TEp), w_cat.reshape(B * S, TEp),
            super_tiles, TILE, ech=ech, interpret=_interpret_kernels(),
            # DEFAULT ON since the chip A/B landed (2026-08-19): both
            # are bit-exact (interpret parity tests) and measured
            # end-to-end at 10M/B=1024 — sp2 rung 2,964 -> 5,427 qps,
            # sp4 1,558 -> 3,045, exactness unchanged (micro_place +
            # scripts/hw_place_ab_r5.sh; BENCH_CONFIGS.md round 5)
            tlhs=_os.environ.get("HST_PLACE_TLHS", "1") == "1",
            skip=_os.environ.get("HST_PLACE_SKIP", "1") == "1",
        ).reshape(B, S, super_tiles, TILE)
    r_iota = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, super_tiles), 3)
    c_iota = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, TILE), 3)
    l_ch = l_cat.reshape(B, S, n_ch, ech).transpose(2, 0, 1, 3)
    w_ch = w_cat.reshape(B, S, n_ch, ech).transpose(2, 0, 1, 3)

    def per_chunk(acc, ts_in):
        l_t, w_t = ts_in  # [B, S, ech]
        r_hot = (l_t[..., None] // TILE == r_iota).astype(jnp.float32)
        c_hot = ((l_t[..., None] % TILE == c_iota)
                 & (l_t[..., None] >= 0)).astype(jnp.bfloat16)
        contrib = jnp.einsum(
            "bser,bsec->bsrc", r_hot * w_t[..., None], c_hot,
            preferred_element_type=jnp.float32,
        )
        return acc + contrib, None

    lex4, _ = jax.lax.scan(
        per_chunk,
        jnp.zeros((B, S, super_tiles, TILE), jnp.float32),
        (l_ch, w_ch),
    )
    return lex4


def _interpret_kernels() -> bool:
    """HST_SUPER_INTERPRET=1 runs every Pallas kernel in the serve path
    in interpret mode so the FULL gated composition (placement + scores
    + dedup) executes end-to-end on CPU — integration coverage for the
    exact program the hardware A/B flips on (hw_session phase 12),
    without burning a tunnel window on wiring bugs."""
    import os

    return os.environ.get("HST_SUPER_INTERPRET", "0") == "1"


def _kernel_backend_ok() -> bool:
    return jax.default_backend() == "tpu" or _interpret_kernels()


def _use_fused_place() -> bool:
    """Gather-fused Pallas placement (HST_PLACE_FUSED=1 to enable, TPU
    only): DMAs CSR windows straight from HBM inside the placement
    kernel instead of staging [B, S, E] l_cat/w_cat arrays through HBM.

    DO NOT ENABLE IN SERVING: at serving shapes (wcaps=(8192,)*8,
    BS=512, 10M CSR) the kernel CRASHES the TPU worker — a runtime
    kernel fault, not a compile error, so the compile gate passes it
    (benchmarks/micro_place.py fused row, 2026-08-19; 'TPU worker
    process crashed or restarted'). The two-step path with
    HST_PLACE_SKIP=1 measured 3.4x faster than base anyway; fused is
    kept for small-shape experiments and interpret-mode coverage."""
    import os

    return (_kernel_backend_ok()
            and os.environ.get("HST_PLACE_FUSED", "0") == "1")


def _use_scores_dedup() -> bool:
    """Batch probe-union dedup in the resident-scores kernel
    (HST_SCORES_DEDUP=1 to enable, TPU only): pairs sorted by supertile
    id share one DMA per 8-pair group, so topic-correlated batches read
    each hot supertile from HBM once instead of once per probing query.
    Off by default until the hardware A/B lands (hw_session phase 12)."""
    import os

    return (_kernel_backend_ok()
            and os.environ.get("HST_SCORES_DEDUP", "0") == "1")


def _use_pallas_place() -> bool:
    """Pallas VMEM-resident placement on TPU (HST_PALLAS_SUPER=0 to
    disable): the jnp scan materializes its one-hot factors in HBM every
    chunk (~26 GB/batch at 10M, wcap 8192); the kernel's HBM traffic is
    the windows once plus the output once. Value parity pinned by
    interpret-mode tests."""
    import os

    return (_kernel_backend_ok()
            and os.environ.get("HST_PALLAS_SUPER", "1") != "0")


def _bisect_runs(
    ids_flat: jax.Array,  # [M*ROW] int32 doc-sorted CSR (pad = n_docs)
    starts: jax.Array,  # [B, T]
    lens: jax.Array,  # [B, T]
    points: jax.Array,  # [B, T, P] global doc-id targets
) -> jax.Array:
    """[B, T, P] first position p in each run with ids[start+p] >= point
    (relative to the run start). 31 fixed halving steps — element gathers
    of only [B, T, P] per step."""
    lo = jnp.zeros(points.shape, jnp.int32)
    hi = jnp.broadcast_to(lens[:, :, None], points.shape).astype(jnp.int32)

    def body(_, lh):
        lo, hi = lh
        mid = (lo + hi) // 2
        pos = starts[:, :, None] + jnp.minimum(mid, hi - 1)
        v = jnp.take(ids_flat, jnp.maximum(pos, 0))
        go = (v < points) & (lo < hi)
        return jnp.where(go, mid + 1, lo), jnp.where(go, hi, mid)

    lo, _hi = jax.lax.fori_loop(0, 31, body, (lo, hi))
    return lo


class SuperPrefix(NamedTuple):
    """Rung-invariant prefix of the supertile program (steps 1-3):
    dense tile stats + lexical bounds + the top-s_max probe candidates
    by joint bound. The escalation ladder computes this ONCE per batch
    and every rung reuses it — the full-corpus stats sweep (45 ms at
    B=1024/10M) and bound selection are identical at every probe depth,
    and rung r's probe set is the first r columns of the bound-ordered
    candidate list."""

    ssem: jax.Array  # [B, n_super] exact dense supertile maxima
    slex: jax.Array  # [B, n_super] lexical supertile upper bounds
    smin: jax.Array  # [B] alive dense min (minmax normalizer)
    smax: jax.Array  # [B] alive dense max
    sup_all: jax.Array  # [B, s_max] probe candidates, bound-DESC order


def _normalizers(smin, smax, norm):
    eps = jnp.float32(1e-12)
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

    def nlex(x, L):
        # oracle parity: an all-zero lexical arm min-max-normalizes to
        # ones (searcher._fuse_and_topk rng <= eps edge)
        return jnp.where(L[:, None] > eps, x / jnp.maximum(L[:, None], eps),
                         jnp.ones_like(x))

    return nsem, nlex


def _super_prefix_body(q, docs, sup_max, term_ids, bias, w_s, w_l,
                       norm, block_n, super_tiles, s_max):
    """Steps 1-3 of the supertile program; see SuperPrefix."""
    from hybridsearch_tpu.ops.dense import dense_tile_stats

    B = q.shape[0]
    N = docs.shape[0]
    n_tiles = -(-N // TILE)
    n_super = sup_max.shape[1]

    # -- 1. dense arm: exact per-tile maxima + alive min/max, one sweep --
    tile_sem, smin, smax = dense_tile_stats(q, docs, bias, block_n=block_n)
    # capacity-padded doc matrices can have more tiles than the build-time
    # table covers; the extra supertiles get zero lexical columns (their
    # docs hold no postings, and dead rows are bias-masked anyway)
    need_super = -(-n_tiles // super_tiles)
    if need_super > n_super:
        sup_max = jnp.pad(sup_max, ((0, 0), (0, need_super - n_super)))
        n_super = need_super
    pad_t = n_super * super_tiles - n_tiles
    ts_full = jnp.pad(tile_sem, ((0, 0), (0, pad_t)),
                      constant_values=NEG_INF) if pad_t else tile_sem
    ssem = jnp.max(ts_full.reshape(B, n_super, super_tiles), axis=2)

    # -- 2. lexical supertile bounds: one row gather, no scatter ----------
    slex = jnp.sum(jnp.take(sup_max, term_ids, axis=0), axis=1)  # [B, ns]

    # -- 3. probe selection by joint bound --------------------------------
    nsem, nlex = _normalizers(smin, smax, norm)
    L0 = jnp.max(slex, axis=1)
    bound0 = w_s * nsem(ssem) + w_l * nlex(slex, L0)
    _, sup_all = jax.lax.top_k(bound0, min(s_max, n_super))
    return SuperPrefix(ssem=ssem, slex=slex, smin=smin, smax=smax,
                       sup_all=sup_all)


@functools.partial(
    jax.jit,
    static_argnames=("k", "s_probe", "wcaps", "norm", "block_n",
                     "super_tiles"),
)
def _hybrid_super_impl(
    q: jax.Array,  # [B, D] L2-normalized f32 queries
    docs: jax.Array,  # [N, D] L2-normalized (bf16/f32)
    sup_max: jax.Array,  # [V+1, n_super]
    sup_pos: jax.Array,  # [V+1, n_super+1]
    ids_rows: jax.Array,  # [M, ROW]
    ws_rows: jax.Array,  # [M, ROW]
    term_ids: jax.Array,  # [B, T]
    complete: jax.Array,  # [B] bool
    lex_min_zero: jax.Array,  # [B] bool (full_touched < n_alive)
    w_s: jax.Array,
    w_l: jax.Array,
    bias: Optional[jax.Array],
    k: int,
    s_probe: int,
    wcaps: tuple,
    norm: str,
    block_n: int,
    super_tiles: int,
) -> Tuple[HybridTopK, jax.Array]:
    prefix = _super_prefix_body(q, docs, sup_max, term_ids, bias, w_s,
                                w_l, norm, block_n, super_tiles,
                                s_max=s_probe)
    return _super_rung_body(
        q, docs, sup_pos, ids_rows, ws_rows, term_ids, complete,
        lex_min_zero, w_s, w_l, bias, prefix,
        k=k, s_probe=s_probe, wcaps=wcaps, norm=norm,
        super_tiles=super_tiles)


def _super_rung_body(
    q, docs, sup_pos, ids_rows, ws_rows, term_ids, complete,
    lex_min_zero, w_s, w_l, bias, prefix: SuperPrefix,
    k: int, s_probe: int, wcaps: tuple, norm: str, super_tiles: int,
) -> Tuple[HybridTopK, jax.Array]:
    """Steps 4-7 of the supertile program, from a SuperPrefix."""
    from hybridsearch_tpu.ops.dense import gather_tile_scores

    B, Dm = q.shape
    N = docs.shape[0]
    sd = super_tiles * TILE
    eps = jnp.float32(1e-12)
    ssem, slex = prefix.ssem, prefix.slex
    n_super = ssem.shape[1]
    S = min(s_probe, n_super, prefix.sup_all.shape[1])
    nsem, nlex = _normalizers(prefix.smin, prefix.smax, norm)
    sup_s = jnp.sort(prefix.sup_all[:, :S], axis=1)  # [B, S] ascending

    # -- 4. resident semantic scores ---------------------------------------
    R = S * sd
    CH = 1024
    if (_use_pallas_place() and N % CH == 0 and Dm % 128 == 0
            and sd % CH == 0):
        # sd % CH mirrors pallas_super_scores' own assert: a build with
        # super_tiles < 8 (sd < 1024) must take the XLA fallback rather
        # than trip a trace-time assertion (ADVICE r3).
        # fused DMA+dot kernel: supertile rows stream from HBM once
        # (the XLA tile gather + einsum measured 58-120 ms/batch at 10M)
        from hybridsearch_tpu.ops.pallas_supertile import (
            dedup_pairs,
            pallas_super_scores,
            pallas_super_scores_dedup,
        )

        q3 = q.astype(docs.dtype) if docs.dtype == jnp.bfloat16 else q
        if _use_scores_dedup() and (B * S) % 8 == 0:
            tid, qid, rep, inv = dedup_pairs(sup_s)
            out_sorted = pallas_super_scores_dedup(
                jnp.take(q3, qid, axis=0), docs, tid, rep, sd, ch=CH,
                interpret=_interpret_kernels())
            s_res = jnp.take(out_sorted, inv, axis=0).reshape(B, R)
        else:
            s_res = pallas_super_scores(q3, docs, sup_s, sd, ch=CH,
                                        interpret=_interpret_kernels())
        gidx = (sup_s[:, :, None] * sd
                + jax.lax.broadcasted_iota(jnp.int32, (1, 1, sd), 2)
                ).reshape(B, R)
        if bias is not None:
            bias2 = bias.astype(jnp.float32).reshape(N // CH, CH)
            blk = jnp.minimum(
                sup_s[:, :, None] * (sd // CH)
                + jax.lax.broadcasted_iota(jnp.int32, (1, 1, sd // CH), 2),
                N // CH - 1,
            ).reshape(B, S * (sd // CH))
            s_res = s_res + jnp.take(bias2, blk, axis=0).reshape(B, R)
        s_res = jnp.where(gidx < N, s_res, NEG_INF)
    else:
        tiles_sel = (sup_s[:, :, None] * super_tiles
                     + jax.lax.broadcasted_iota(
                         jnp.int32, (1, 1, super_tiles), 2)
                     ).reshape(B, S * super_tiles)
        s_res, gidx = gather_tile_scores(q, docs, tiles_sel, bias)
    alive = jnp.isfinite(s_res)

    # -- 5. resident lexical scores: CSR windows + one-hot placement ------
    if _use_fused_place():
        lex4, ovf = _place_windows_fused(
            sup_pos, ids_rows, ws_rows, term_ids, sup_s, sd, wcaps,
            super_tiles)
    else:
        l_cat, w_cat, ovf = _resident_windows(
            sup_pos, ids_rows, ws_rows, term_ids, sup_s, sd, wcaps)
        lex4 = _place_windows(l_cat, w_cat, super_tiles,
                              use_pallas=_use_pallas_place())
    lex_res = lex4.reshape(B, R)
    lex_res = jnp.where(alive, lex_res, 0.0)

    # -- 6. exact fusion + top-k ------------------------------------------
    L_res = jnp.max(lex_res, axis=1)  # [B] exact resident lexical max
    fused = w_s * nsem(s_res) + w_l * nlex(lex_res, L_res)
    fused = jnp.where(alive, fused, NEG_INF)
    k_eff = min(k, R)
    M = min(4 * k_eff, R)  # final-rescore candidate margin
    if R > 4096:
        from hybridsearch_tpu.ops.dense import tiled_matrix_topk

        vals_m, pos_m = tiled_matrix_topk(fused, M)
        pos_m = jnp.maximum(pos_m, 0)
    else:
        vals_m, pos_m = jax.lax.top_k(fused, M)
    # f32 tie-break rescore: the kernel scores accumulate f32 in a
    # DIFFERENT order than a plain XLA dot (pallas VPU chunk reduce vs
    # dot_general), so near-ties can order-swap vs the oracle. Rescore
    # the M finalists' semantic dots with the oracle's own contraction
    # (one [B, M, D] gather + einsum — M = 4k rows/query, sub-ms) and
    # re-rank. Resident lex scores are already exact f32 placements.
    idxs_m = jnp.take_along_axis(gidx, pos_m, axis=1)  # [B, M]
    safe = jnp.clip(idxs_m, 0, N - 1)
    docs_m = jnp.take(docs, safe, axis=0)  # [B, M, D]
    # SAME operand precision as the kernel/oracle contraction: bf16
    # products (q cast to the docs' dtype), f32 accumulation via
    # dot_general — bit-aligned with a plain XLA dot over the corpus
    q_m = q.astype(docs.dtype) if docs.dtype == jnp.bfloat16 else q
    s_m = jnp.einsum("bmd,bd->bm", docs_m, q_m,
                     preferred_element_type=jnp.float32)
    if bias is not None:
        s_m = s_m + jnp.take(bias.astype(jnp.float32), safe)
    lex_m = jnp.take_along_axis(lex_res, pos_m, axis=1)
    alive_m = jnp.take_along_axis(alive, pos_m, axis=1)
    fused_m = w_s * nsem(s_m) + w_l * nlex(lex_m, L_res)
    fused_m = jnp.where(alive_m & (vals_m > NEG_INF / 2), fused_m,
                        NEG_INF)
    vals, sel = jax.lax.top_k(fused_m, k_eff)
    idxs = jnp.take_along_axis(idxs_m, sel, axis=1)
    ok = jnp.isfinite(vals) & (vals > NEG_INF / 2)
    idxs = jnp.where(ok, idxs, -1)

    # -- 7. certificate ----------------------------------------------------
    # (a) residents are EXACT (whole supertiles, full-CSR windows, no
    #     truncation when ovf is False);
    # (b) any unprobed supertile resident's fused score <= its joint bound
    #     under the FINAL normalizers;
    # (c) L_res is the true global lexical max: it is an achieved exact
    #     score and >= every unprobed supertile's lexical bound;
    # (d) minmax only: the true lexical min is 0 (some alive doc holds no
    #     query term — lex_min_zero) and sem stats are exact (full sweep).
    kth = vals[:, -1]
    sup_iota = jax.lax.broadcasted_iota(jnp.int32, (1, n_super), 1)
    probed = jnp.any(sup_iota[:, :, None] == sup_s[:, None, :], axis=2)
    slex_un = jnp.where(probed, 0.0, slex)
    # eps_num: tile maxima come from the bf16-MXU stats sweep while
    # resident scores use f32 contractions (pallas_super_scores /
    # placement) — same exact bf16 products, different f32 accumulation
    # order, so they can disagree by ~D*eps_f32. Certify only when the
    # comparison clears that noise floor (ADVICE r3).
    eps_num = jnp.float32(1e-4)
    max_un = jnp.max(slex_un, axis=1)
    # max_un <= 0 is exact (no query term touches an unprobed supertile:
    # the bound table entries are exact zeros), so no epsilon is needed.
    cert_norm = (L_res >= max_un + eps_num) | (max_un <= 0.0)
    bound_f = w_s * nsem(ssem) + w_l * nlex(slex, jnp.maximum(L_res, eps))
    tau = jnp.max(jnp.where(probed, NEG_INF, bound_f), axis=1)
    exact = (complete & cert_norm & ~ovf
             & ((kth >= tau + eps_num) | ~jnp.isfinite(tau)))
    if norm == "minmax":
        exact = exact & lex_min_zero
    return HybridTopK(values=vals, indices=idxs, exact=exact), sup_s


def hybrid_supertile_topk(
    q: jax.Array,
    docs: jax.Array,
    sp: SuperPostings,
    enc: SuperQueryEnc,
    k: int,
    w_s: float,
    w_l: float,
    bias: Optional[jax.Array] = None,
    s_probe: int = 4,
    norm: str = "minmax",
    block_n: int = 262144,
    n_alive: Optional[int] = None,
    return_probes: bool = False,
):
    """Supertile hybrid top-k (clustered layouts). Same fused semantics
    and HybridTopK contract as hybrid_impact_topk/hybrid_tile_topk;
    `exact` is sound per-query. s_probe is the probe budget in
    supertiles (128 tiles = 16384 docs each) — callers escalate it when
    certificates fail (retrieval/searcher.py). With return_probes=True,
    returns (HybridTopK, probed supertile ids [B, S]) — the quality
    harness uses the probes for per-arm disagreement attribution."""
    N = docs.shape[0]
    n_alive = N if n_alive is None else n_alive
    lex_min_zero = jnp.asarray(enc.full_touched < n_alive)
    out, probes = _hybrid_super_impl(
        q, docs, sp.sup_max, sp.sup_pos, sp.ids_rows, sp.ws_rows,
        enc.term_ids, jnp.asarray(enc.complete), lex_min_zero,
        jnp.float32(w_s), jnp.float32(w_l), bias,
        k=k, s_probe=s_probe,
        wcaps=tuple(min(w, sp.super_docs) for w in enc.wcaps),
        norm=norm, block_n=block_n, super_tiles=sp.super_tiles,
    )
    return (out, probes) if return_probes else out


@functools.partial(
    jax.jit,
    static_argnames=("norm", "block_n", "super_tiles", "s_max"),
)
def _super_prefix_impl(q, docs, sup_max, term_ids, bias, w_s, w_l,
                       norm, block_n, super_tiles, s_max):
    return _super_prefix_body(q, docs, sup_max, term_ids, bias, w_s, w_l,
                              norm, block_n, super_tiles, s_max)


@functools.partial(
    jax.jit,
    static_argnames=("k", "s_probe", "wcaps", "norm", "super_tiles"),
)
def _super_rung_impl(q, docs, sup_pos, ids_rows, ws_rows, term_ids,
                     complete, lex_min_zero, w_s, w_l, bias, prefix,
                     k, s_probe, wcaps, norm, super_tiles):
    return _super_rung_body(
        q, docs, sup_pos, ids_rows, ws_rows, term_ids, complete,
        lex_min_zero, w_s, w_l, bias, prefix,
        k=k, s_probe=s_probe, wcaps=wcaps, norm=norm,
        super_tiles=super_tiles)


def super_prefix(
    q: jax.Array,
    docs: jax.Array,
    sp: SuperPostings,
    enc: SuperQueryEnc,
    bias: Optional[jax.Array] = None,
    w_s: float = 0.7,
    w_l: float = 0.3,
    norm: str = "minmax",
    block_n: int = 262144,
    s_max: int = 16,
) -> SuperPrefix:
    """Rung-invariant prefix for a ladder of hybrid_supertile_topk_rung
    calls: ONE full-corpus stats sweep + bound selection serves every
    probe depth up to s_max (the ladder's deepest rung). Escalating from
    the prefix costs only the per-rung resident work."""
    return _super_prefix_impl(
        q, docs, sp.sup_max, enc.term_ids, bias,
        jnp.float32(w_s), jnp.float32(w_l),
        norm=norm, block_n=block_n, super_tiles=sp.super_tiles,
        s_max=s_max)


def hybrid_supertile_topk_rung(
    q: jax.Array,
    docs: jax.Array,
    sp: SuperPostings,
    enc: SuperQueryEnc,
    prefix: SuperPrefix,
    k: int,
    w_s: float,
    w_l: float,
    bias: Optional[jax.Array] = None,
    s_probe: int = 4,
    norm: str = "minmax",
    n_alive: Optional[int] = None,
) -> HybridTopK:
    """One escalation rung from a shared SuperPrefix — identical output
    to hybrid_supertile_topk at the same s_probe (the prefix's bound-
    ordered candidates restrict to the rung's top-S; top_k is ordered).
    The searcher ladder pairs this with row compaction: deeper rungs
    take a row-subset of both the prefix and the enc."""
    N = docs.shape[0]
    n_alive = N if n_alive is None else n_alive
    lex_min_zero = jnp.asarray(enc.full_touched < n_alive)
    out, _probes = _super_rung_impl(
        q, docs, sp.sup_pos, sp.ids_rows, sp.ws_rows,
        enc.term_ids, jnp.asarray(enc.complete), lex_min_zero,
        jnp.float32(w_s), jnp.float32(w_l), bias, prefix,
        k=k, s_probe=s_probe,
        wcaps=tuple(min(w, sp.super_docs) for w in enc.wcaps),
        norm=norm, super_tiles=sp.super_tiles)
    return out
