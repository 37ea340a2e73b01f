"""Pallas TPU kernel for the supertile hybrid's resident placement
(ops/supertile.py).

The XLA path of the factorized one-hot placement materializes its
[*, ECH, 128] one-hot factors in HBM every scan step — ~26 GB of traffic
per 256-query batch at 10M docs (window cap 8192). This kernel builds
both factors in VMEM per (query, supertile) block and accumulates the
[super_tiles, 128] resident buffer on the MXU, so HBM traffic is the
gathered windows once plus the output once.

Semantics (exact, same as the jnp scan):
    out[bs, r, c] = sum_e (l[bs,e] // 128 == r) * (l[bs,e] % 128 == c)
                          * (l[bs,e] >= 0) * w[bs,e]
Entries with l outside [0, super_tiles*128) contribute nothing (their
weights are window-masked to 0 upstream anyway).

jnp fallback lives in ops/supertile.py; CPU tests run this kernel in
interpret mode for value parity (interpret mode does not validate
Mosaic's block-shape rules — those are exercised by the TPU benchmarks).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


@functools.partial(jax.jit, static_argnames=("sd", "ch", "interpret"))
def pallas_super_scores(
    q: jax.Array,  # [B, D] in the docs' matmul dtype (bf16 for bf16 docs)
    docs: jax.Array,  # [N, D], N % ch == 0, D % 128 == 0
    sup_s: jax.Array,  # [B, S] int32 probed supertile ids (sorted)
    sd: int,  # docs per supertile; sd % ch == 0
    ch: int = 1024,
    interpret: bool = False,
) -> jax.Array:
    """[B, S*sd] raw dot scores of every doc in each query's probed
    supertiles — the DMA-fused replacement for the XLA gather+einsum
    (jnp.take of tile rows measured ~105 GB/s effective: 58-120 ms/batch
    at 10M). Each grid step DMAs 8 queries' supertile-contiguous row
    chunks straight from HBM and dots them against the query block; HBM
    traffic is docs-rows once + output once.

    Out-of-range chunk indices (capacity-padded supertiles past the end)
    are clamped to the last chunk; the caller masks those slots by
    global doc id anyway. The caller applies bias and validity masks."""
    B, D = q.shape
    N = docs.shape[0]
    S = sup_s.shape[1]
    assert N % ch == 0 and sd % ch == 0 and D % 128 == 0
    nch = sd // ch
    _R = 8
    bp = -(-B // _R) * _R
    if bp != B:
        q = jnp.pad(q, ((0, bp - B), (0, 0)))
        sup_s = jnp.pad(sup_s, ((0, bp - B), (0, 0)))
    sup_flat = sup_s.reshape(-1).astype(jnp.int32)
    last = N // ch - 1

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(bp // _R, S, nch),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # docs (HBM)
            pl.BlockSpec((_R, D), lambda b, s, c, sup: (b, 0)),
        ],
        out_specs=pl.BlockSpec((_R, ch), lambda b, s, c, sup: (b, s * nch + c)),
        scratch_shapes=[
            pltpu.VMEM((_R, ch, D), docs.dtype),
            pltpu.SemaphoreType.DMA((_R,)),
        ],
    )

    def kernel(sup_ref, docs_hbm, q_ref, out_ref, scr, sem):
        b = pl.program_id(0)
        s = pl.program_id(1)
        c = pl.program_id(2)
        copies = []
        for r in range(_R):
            idx = jnp.minimum(sup_ref[(b * _R + r) * S + s] * nch + c,
                              last)
            cp = pltpu.make_async_copy(
                docs_hbm.at[pl.ds(idx * ch, ch)], scr.at[r], sem.at[r])
            cp.start()
            copies.append(cp)
        for r in range(_R):
            copies[r].wait()
            # explicit f32 multiply + lane reduce: Mosaic mis-lowers both
            # the [D]->[D,1] bf16 reshape (16-bit minor-dim insertion)
            # and the [ch,D]x[1,D] dot (bf16->f32 via vector.broadcast);
            # the op is HBM-bound, so VPU FLOPs are free.
            prod = (scr[r].astype(jnp.float32)
                    * q_ref[pl.ds(r, 1)].astype(jnp.float32))
            out_ref[r, :] = jnp.sum(prod, axis=1)

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((bp, S * sd), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(sup_flat, docs, q)
    return out[:B] if bp != B else out


@functools.partial(jax.jit, static_argnames=("sd", "ch", "interpret"))
def pallas_super_scores_dedup(
    qp: jax.Array,  # [P, D] query row PER PAIR (q[qid], pre-gathered:
    #                  static-row VMEM reads beat dynamic sublane starts)
    docs: jax.Array,  # [N, D], N % ch == 0, D % 128 == 0
    tid: jax.Array,  # [P] int32 supertile id per (query, probe) pair,
    #                  SORTED ascending across the whole batch
    rep: jax.Array,  # [P] int32 index of the FIRST pair in p's 8-group
    #                  with the same tid (rep[p] == p -> p owns the DMA)
    sd: int,  # docs per supertile; sd % ch == 0
    ch: int = 1024,
    interpret: bool = False,
) -> jax.Array:
    """[P, sd] raw dot scores with the batch probe union DEDUPED: pairs
    are pre-sorted by supertile id, so duplicates (topic-correlated
    queries probing the same supertile) sit adjacent; within each
    8-pair grid group only the first pair of a run DMAs the supertile's
    row chunk and the rest dot against the owner's scratch buffer. HBM
    traffic drops from P x sd x D to ~(unique supertiles) x sd x D —
    pallas_super_scores re-reads every duplicated supertile.

    Callers build (tid, rep, inv) with `dedup_pairs`, pre-gather
    qp = q[qid], and unpermute the result back to [B, S*sd]
    (ops/supertile.py)."""
    import os

    P, D = qp.shape
    N = docs.shape[0]
    _R = 8
    assert N % ch == 0 and sd % ch == 0 and D % 128 == 0 and P % _R == 0
    nch = sd // ch
    last = N // ch - 1
    # HST_DEDUP_MXU=1 (trace-time gate): when an 8-pair group is a single
    # equal-tid run, compute all 8 rows as ONE [_R, D] x [ch, D]^T MXU
    # dot against the owner's scratch instead of 8 VPU multiply+reduce
    # rows. The VPU path's f32 element FLOPs scale linearly with the
    # batch (13 ms at B=256 -> ~52 ms at B=1024 estimated) and become
    # the resident pass's compute bound exactly in the big-batch,
    # topic-correlated regime where dedup runs are long and most groups
    # ARE uniform. Same exact bf16 products, different f32 accumulation
    # order — covered by the serving path's eps_num certificate margin
    # and the f32 finalist rescore (ops/supertile.py step 6).
    mxu = os.environ.get("HST_DEDUP_MXU") == "1"

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # tid, rep
        grid=(P // _R, nch),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # docs (HBM)
            pl.BlockSpec((_R, D), lambda g, c, tid, rep: (g, 0)),
        ],
        out_specs=pl.BlockSpec((_R, ch), lambda g, c, tid, rep: (g, c)),
        scratch_shapes=[
            pltpu.VMEM((_R, ch, D), docs.dtype),
            pltpu.SemaphoreType.DMA((_R,)),
        ],
    )

    def kernel(tid_ref, rep_ref, docs_hbm, q_ref, out_ref, scr, sem):
        g = pl.program_id(0)
        c = pl.program_id(1)
        for r in range(_R):
            p = g * _R + r
            own = rep_ref[p] == p

            @pl.when(own)
            def _start(r=r, p=p):
                idx = jnp.minimum(tid_ref[p] * nch + c, last)
                pltpu.make_async_copy(
                    docs_hbm.at[pl.ds(idx * ch, ch)], scr.at[r],
                    sem.at[r]).start()
        for r in range(_R):
            p = g * _R + r
            own = rep_ref[p] == p

            @pl.when(own)
            def _wait(r=r, p=p):
                idx = jnp.minimum(tid_ref[p] * nch + c, last)
                pltpu.make_async_copy(
                    docs_hbm.at[pl.ds(idx * ch, ch)], scr.at[r],
                    sem.at[r]).wait()
        def _vpu_rows():
            for r in range(_R):
                p = g * _R + r
                src = rep_ref[p] - g * _R  # 0..r: the run owner's scratch
                rows = scr[pl.ds(src, 1)][0]  # [ch, D] dynamic VMEM read
                qv = q_ref[pl.ds(r, 1)]  # [1, D] static row
                prod = rows.astype(jnp.float32) * qv.astype(jnp.float32)
                out_ref[r, :] = jnp.sum(prod, axis=1)

        if mxu:
            # uniform group: the last pair's run owner IS the group head
            # (rep is clamped to the group start), so scr[0] holds the
            # one supertile chunk every pair in the group dots against
            uniform = rep_ref[g * _R + _R - 1] == g * _R

            @pl.when(uniform)
            def _mxu_dot():
                out_ref[:, :] = jax.lax.dot_general(
                    q_ref[:], scr[0],
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )

            @pl.when(jnp.logical_not(uniform))
            def _mixed():
                _vpu_rows()
        else:
            _vpu_rows()

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((P, sd), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(tid.astype(jnp.int32), rep.astype(jnp.int32), docs, qp)


def dedup_pairs(sup_s: jax.Array, group: int = 8):
    """(tid, qid, rep, inv) for pallas_super_scores_dedup from the
    per-query probe table `sup_s` [B, S]: pairs sorted by supertile id,
    rep = first pair of each equal-tid run clamped into the pair's
    `group`-sized grid block, inv = inverse permutation such that
    out_sorted[inv].reshape(B, S*sd) restores query-major order."""
    B, S = sup_s.shape
    P = B * S
    flat = sup_s.reshape(-1).astype(jnp.int32)
    order = jnp.argsort(flat, stable=True).astype(jnp.int32)
    tid = jnp.take(flat, order)
    qid = order // S
    run0 = jnp.searchsorted(tid, tid, side="left").astype(jnp.int32)
    grp0 = (jnp.arange(P, dtype=jnp.int32) // group) * group
    rep = jnp.maximum(run0, grp0)
    inv = jnp.argsort(order, stable=True).astype(jnp.int32)
    return tid, qid, rep, inv


@functools.partial(jax.jit,
                   static_argnames=("wcaps", "super_tiles", "tile",
                                    "interpret"))
def pallas_place_fused(
    lo: jax.Array,  # [BS, T] int32 absolute CSR window starts
    hi: jax.Array,  # [BS, T] int32 absolute CSR window ends
    base: jax.Array,  # [BS] int32 supertile base doc id
    ids_rows: jax.Array,  # [M, 128] int32 doc-sorted CSR ids (HBM)
    ws_rows: jax.Array,  # [M, 128] f32 CSR weights (HBM)
    wcaps: tuple,  # static per-slot window caps (ROW multiples)
    super_tiles: int = 128,
    tile: int = 128,
    interpret: bool = False,
) -> jax.Array:
    """[BS, super_tiles, tile] f32 resident lexical buffers with the CSR
    window gather FUSED into the placement: each grid step DMAs its T
    slots' windows straight from the HBM CSR (scalar-prefetched lo/hi
    bounds), masks validity in VMEM, and accumulates the factorized
    one-hot MXU contraction — the [B,T,S,E] l_cat/w_cat staging arrays of
    the two-step path (_resident_windows + pallas_place_windows) never
    exist. HBM traffic: window rows once + output once.

    Semantics match _place_windows on the windows _resident_windows
    would have staged: entry positions p in [lo, hi) contribute
    w_p to out[(id_p - base) // tile, (id_p - base) % tile] when
    0 <= id_p - base < super_tiles*tile; everything else contributes 0."""
    ROW = 128
    BS, T = lo.shape
    M = ids_rows.shape[0]
    assert len(wcaps) == T and all(wc % ROW == 0 for wc in wcaps)
    # pad the batch*probe axis to a multiple of 8: the (8, T) sliding
    # lo/hi SMEM block below needs it (Mosaic block dim -2 rule); padded
    # rows carry lo=hi=0 -> empty windows -> all-zero outputs, sliced off
    bs_pad = -(-BS // 8) * 8 - BS
    if bs_pad:
        lo = jnp.pad(lo, ((0, bs_pad), (0, 0)))
        hi = jnp.pad(hi, ((0, bs_pad), (0, 0)))
        base = jnp.pad(base, (0, bs_pad))
    BS_P = BS + bs_pad
    # one extra row per slot: a window of width <= wc can straddle
    # wc//ROW + 1 CSR rows
    ms = tuple(min(wc // ROW + 1, M) for wc in wcaps)

    # lo/hi arrive as 8-step (8, T) SMEM BLOCKS, not scalar-prefetch:
    # prefetching the full [BS, T] tables overflowed the 1 MiB SMEM at
    # serving shapes ("prefetched SMEM operand 0" = 2 MiB,
    # docs/HW_R4_LOG.txt phase 12). Only the grid/BlockSpec index_maps
    # require prefetched scalars; the in-kernel DMA slice indices below
    # may read any SMEM scalar, so a 32*T-byte sliding block is enough.
    # Block rows = 8 because Mosaic requires dim -2 of a block divisible
    # by 8 (or equal to the array dim); BS is asserted a multiple of 8.
    # `base` ([BS] int32) stays prefetched — it is small at any batch.
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,  # base
        grid=(BS_P,),
        in_specs=[
            pl.BlockSpec((8, T), lambda b, base: (b // 8, 0),
                         memory_space=pltpu.SMEM),  # lo slice
            pl.BlockSpec((8, T), lambda b, base: (b // 8, 0),
                         memory_space=pltpu.SMEM),  # hi slice
            pl.BlockSpec(memory_space=pltpu.ANY),  # ids_rows (HBM)
            pl.BlockSpec(memory_space=pltpu.ANY),  # ws_rows (HBM)
        ],
        out_specs=pl.BlockSpec((1, super_tiles, tile),
                               lambda b, base: (b, 0, 0)),
        scratch_shapes=(
            [pltpu.VMEM((m, ROW), jnp.int32) for m in ms]
            + [pltpu.VMEM((m, ROW), jnp.float32) for m in ms]
            + [pltpu.SemaphoreType.DMA((2 * T,))]
        ),
    )

    def kernel(base_ref, lo_ref, hi_ref, ids_hbm, ws_hbm, out_ref, *scr):
        scr_ids, scr_ws, sem = scr[:T], scr[T:2 * T], scr[2 * T]
        bs = pl.program_id(0)
        r8 = bs % 8  # row within the (8, T) sliding lo/hi block
        row0s, copies = [], []
        for j in range(T):
            row0 = jnp.clip(lo_ref[r8, j] // ROW, 0, M - ms[j])
            row0s.append(row0)
            cp_i = pltpu.make_async_copy(
                ids_hbm.at[pl.ds(row0, ms[j])], scr_ids[j], sem.at[2 * j])
            cp_w = pltpu.make_async_copy(
                ws_hbm.at[pl.ds(row0, ms[j])], scr_ws[j], sem.at[2 * j + 1])
            cp_i.start()
            cp_w.start()
            copies.append((cp_i, cp_w))
        out_ref[...] = jnp.zeros_like(out_ref)
        for j in range(T):
            copies[j][0].wait()
            copies[j][1].wait()
            lo_j, hi_j, b_j = lo_ref[r8, j], hi_ref[r8, j], base_ref[bs]
            # chunk 8 CSR rows (1024 entries) per contraction; [8, 128]
            # collapses to [1024] with no relayout (native (8,128) tiling)
            for c0 in range(0, ms[j], 8):
                rows = min(8, ms[j] - c0)
                E = rows * ROW

                def _chunk(j=j, c0=c0, rows=rows, E=E, lo_j=lo_j,
                           hi_j=hi_j, b_j=b_j):
                    ids = scr_ids[j][pl.ds(c0, rows)].reshape(E)
                    ws = scr_ws[j][pl.ds(c0, rows)].reshape(E)
                    # 2D position iota reshaped like the data (Mosaic
                    # has no 1D iota): pos of scratch entry (u, v) is
                    # (row0 + c0 + u) * ROW + v
                    gpos = ((row0s[j] + c0) * ROW
                            + jax.lax.broadcasted_iota(
                                jnp.int32, (rows, ROW), 0) * ROW
                            + jax.lax.broadcasted_iota(
                                jnp.int32, (rows, ROW), 1)).reshape(E)
                    w = jnp.where((gpos >= lo_j) & (gpos < hi_j), ws, 0.0)
                    l = ids - b_j
                    r_io = jax.lax.broadcasted_iota(
                        jnp.int32, (E, super_tiles), 1)
                    c_io = jax.lax.broadcasted_iota(jnp.int32, (E, tile), 1)
                    # negative l floor-divides negative -> matches no
                    # row; l >= sd rows >= super_tiles -> also no match
                    wh = jnp.where(l[:, None] // tile == r_io,
                                   w[:, None], 0.0)
                    c_hot = (l[:, None] % tile == c_io).astype(jnp.bfloat16)
                    out_ref[0] += jax.lax.dot_general(
                        wh, c_hot, (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )

                # scalar chunk skip: caps ride the batch max (wcaps =
                # (8192,)*8 at 10M/B=1024) while a typical slot's true
                # window is a few hundred entries — chunks past hi (or
                # of an empty window) are entirely masked to zero, so
                # skipping them is bit-exact and saves most of the
                # one-hot + MXU work
                pl.when(((row0s[j] + c0) * ROW < hi_j)
                        & (hi_j > lo_j))(_chunk)

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((BS_P, super_tiles, tile),
                                       jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(base.astype(jnp.int32), lo.astype(jnp.int32), hi.astype(jnp.int32),
      ids_rows, ws_rows)
    return out[:BS] if bs_pad else out


@functools.partial(jax.jit,
                   static_argnames=("super_tiles", "tile", "ech",
                                    "interpret", "tlhs", "skip"))
def pallas_place_windows(
    l_flat: jax.Array,  # [BS, TE] int32 local doc ids (invalid < 0 or >= R)
    w_flat: jax.Array,  # [BS, TE] float32 (invalid entries = 0)
    super_tiles: int = 128,
    tile: int = 128,
    ech: int = 1024,  # 2048 OOMed VMEM: the 8 unrolled rows' one-hot
    #                   temporaries (~2.5 MB each) co-allocate on stack
    interpret: bool = False,
    tlhs: bool = False,
    skip: bool = False,
) -> jax.Array:
    """[BS, super_tiles, tile] f32 resident lexical buffers. TE must be a
    multiple of `ech`; BS is padded to a multiple of 8 here (Mosaic:
    block rows divisible by 8).

    tlhs=True builds the weighted row one-hot TRANSPOSED ([St, ech]
    instead of [ech, St]) so the contraction is a plain [M,K]x[K,N]
    matmul with K minor on the LHS — the dim-0/dim-0 contraction of the
    default layout makes Mosaic relayout/transpose the f32 operand on
    the VPU every chunk, which chip attribution measured at ~392 ms of
    the 473 ms sp4/B=1024 placement stage (docs/HW_R4_LOG + attr2,
    2026-08-19). Same values bit-for-bit: the one-hots are exact.

    skip=True predicates each (row, chunk) contraction on the chunk
    holding ANY nonzero weight. At 10M/B=1024 the per-slot window caps
    ride the batch max (wcaps=(8192,)*8 -> TE=66k entries/pair) while a
    typical slot's true window is a few hundred entries — most chunks
    are masked zeros, and a zero chunk contributes exactly zero, so
    skipping preserves bit-exact output."""
    _ROWS = 8
    BS, TE = l_flat.shape
    ech = min(ech, TE)
    assert TE % ech == 0
    nk = TE // ech
    bs_pad = -(-BS // _ROWS) * _ROWS
    if bs_pad != BS:
        l_flat = jnp.pad(l_flat, ((0, bs_pad - BS), (0, 0)),
                         constant_values=-1)
        w_flat = jnp.pad(w_flat, ((0, bs_pad - BS), (0, 0)))

    def kernel(l_ref, w_ref, out_ref):
        k = pl.program_id(1)

        @pl.when(k == 0)
        def _init():
            out_ref[...] = jnp.zeros_like(out_ref)

        r_iota = jax.lax.broadcasted_iota(jnp.int32, (ech, super_tiles), 1)
        c_iota = jax.lax.broadcasted_iota(jnp.int32, (ech, tile), 1)
        rt_iota = jax.lax.broadcasted_iota(jnp.int32, (super_tiles, ech), 0)
        for r in range(_ROWS):
            l = l_ref[r]  # [ech]
            w = w_ref[r]  # [ech]

            def _contract(l=l, w=w, r=r):
                # no explicit l >= 0 guard: a negative l floor-divides
                # to a negative row, matching no r_iota row, so its
                # c_hot column never receives weight. (A bool [ech] ->
                # [ech, 1] reshape also trips Mosaic: "insertion of
                # minor dim ... only supported for 32-bit types".)
                c_hot = (l[:, None] % tile == c_iota).astype(jnp.bfloat16)
                if tlhs:
                    wh_t = jnp.where(l[None, :] // tile == rt_iota,
                                     w[None, :], 0.0)  # [St, ech] f32
                    out_ref[r] += jax.lax.dot_general(
                        wh_t, c_hot, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                else:
                    r_hot = l[:, None] // tile == r_iota  # [ech, St]
                    wh = jnp.where(r_hot, w[:, None], 0.0)  # f32 select
                    out_ref[r] += jax.lax.dot_general(
                        wh, c_hot, (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )

            if skip:
                pl.when(jnp.any(w != 0.0))(_contract)
            else:
                _contract()

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((bs_pad, super_tiles, tile),
                                       jnp.float32),
        grid=(bs_pad // _ROWS, nk),
        in_specs=[
            pl.BlockSpec((_ROWS, ech), lambda b, k: (b, k)),
            pl.BlockSpec((_ROWS, ech), lambda b, k: (b, k)),
        ],
        out_specs=pl.BlockSpec((_ROWS, super_tiles, tile),
                               lambda b, k: (b, 0, 0)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(l_flat, w_flat)
    return out[:BS] if bs_pad != BS else out
