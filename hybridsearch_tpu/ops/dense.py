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

Implementations:
  - `scan_dense_topk`: lax.scan over doc blocks (pure XLA; fuses
    matmul + per-block top-k merge; small-N path, runs on CPU for tests).
  - `tiled_dense_topk`: exact tile-max two-phase selection; pass 1 uses the
    Pallas fused matmul+tile-max kernel (ops/pallas_topk.py) on TPU.
  - `tiled_matrix_topk`: exact top-k over a precomputed score matrix with
    no wide sorts (used by the fused hybrid paths).
`dense_topk` dispatches between scan and tiled.
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

    # bf16 doc storage: keep the matmul operands bf16 (halves HBM read
    # traffic; the MXU accumulates in fp32 via preferred_element_type).
    q_mm = q.astype(d.dtype) if d.dtype == jnp.bfloat16 else q

    def body(carry, inp):
        vals, idxs = carry
        blk_i, e_blk, b_blk = inp
        # [B, block_n] block scores on the MXU.
        s = jax.lax.dot_general(
            q_mm, e_blk,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
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


@functools.partial(jax.jit,
                   static_argnames=("k", "block_n", "tile", "with_stats",
                                    "probe_tiles"))
def tiled_dense_topk(
    queries: jax.Array,
    docs: jax.Array,
    k: int,
    block_n: int = 262144,
    tile: int = 128,
    bias: jax.Array | None = None,
    with_stats: bool = False,
    probe_tiles: int | None = None,
) -> Tuple[jax.Array, ...]:
    """Exact top-k via tile-max two-phase selection — the fast path at scale.

    lax.top_k over a [B, block_n] score block is sort-dominated; this kernel
    replaces it with:
      pass 1: stream doc blocks through the MXU, reduce each 128-doc tile to
              its max score -> [B, n_tiles] (a 128x smaller array, fused by
              XLA into the matmul epilogue; HBM traffic ~= one bf16 read of
              the doc matrix);
      pass 2: top-k over tile maxima -> the k best tiles per query;
      pass 3: re-score just those k tiles (k*128 docs) and take the exact
              top-k.

    Exactness: if a global top-k value v lived in a tile outside the top-k
    tiles by max, then >= k tiles would each contain a value (their max)
    > v — contradicting v being in the top-k. So the k selected tiles
    contain all top-k values.

    docs must be pre-L2-normalized. bias: optional [N] additive score bias
    (0 / -inf tombstone + filter mask).

    with_stats=True additionally returns (smin [B], smax [B]): the exact
    global min/max of the RAW scores over alive docs (bias treated as a
    0/-inf mask), computed inside the same single sweep — the normalization
    statistics of the sparse-correction hybrid (ops/hybrid.py). Return is
    then (vals, idxs, smin, smax). In int8 mode the stats are exact over
    the DEQUANTIZED int8 scores — self-consistent with the values this
    kernel returns, which sit within ±(rq + (1+rq)·r_j) of the bf16
    scores (see int8_swept_topk for the bound); callers needing bf16-
    exact min-max parity keep the sweep on bf16.

    probe_tiles < k bounds pass 3's gather to that many tiles per query
    (the gather is the dominant cost at deep k: k tiles x 128 docs x D per
    query). The result is then exact ONLY when the per-query `covered`
    flag — appended as the last return value — is True: covered means the
    k-th found value is >= the best UNSELECTED tile's max, so no top-k
    value can live outside the probed tiles. On cluster-ordered layouts
    the top-k concentrates in few tiles and a small budget covers almost
    always; callers escalate probe_tiles when it doesn't.
    """
    q = queries.astype(jnp.float32)
    B, Dm = q.shape
    N = docs.shape[0]
    n_tiles = -(-N // tile)
    Np = n_tiles * tile
    d = jnp.pad(docs, ((0, Np - N), (0, 0))) if Np != N else docs
    if bias is not None:
        bias_p = jnp.pad(bias.astype(jnp.float32), (0, Np - N),
                         constant_values=NEG_INF)
    else:
        bias_p = None

    # int8 mode: docs are symmetric-quantized (x*127 rounded); the query is
    # quantized identically so every pass computes the same values
    # (int_prod / 127^2 ~= cosine). bf16 mode: operands stay bf16 for the
    # MXU. Otherwise fp32.
    int8_mode = d.dtype == jnp.int8
    INV8 = jnp.float32(1.0 / (127.0 * 127.0))
    if int8_mode:
        # native int8 operands with int32 accumulation: XLA lowers this
        # to the MXU's int8 path (2x the bf16 rate on v5e) instead of
        # the old f32-held-integer dot
        q_mm = jnp.clip(jnp.round(q * 127.0), -127.0, 127.0).astype(
            jnp.int8)
    else:
        q_mm = q.astype(d.dtype) if d.dtype == jnp.bfloat16 else q

    # pass 1 fast path: Pallas fused matmul + tile-max epilogue in
    # TRANSPOSED layout (ops/pallas_topk.py pallas_tile_stats_t): one
    # natural [block, D] x [D, B] MXU dot per grid step, invalid rows
    # masked in-kernel, output [nb, tpb, B] with full lanes (the v1
    # [nb, B, tpb] layout padded its 32-wide lane dim 4x in HBM).
    import os

    pallas_tpb = int(os.environ.get("HST_PALLAS_TPB", "32"))
    use_pallas = (
        jax.default_backend() == "tpu"
        and tile == 128
        and Np == N  # capacity rounding guarantees this in the framework
        and Dm % 128 == 0
        and n_tiles >= 2 * pallas_tpb
        and not int8_mode  # int8 scores through the XLA fallback
    )

    tile_mins_b = None  # [nb, tpb, B] alive-minima when with_stats
    if use_pallas:
        from hybridsearch_tpu.ops.pallas_topk import pallas_tile_stats_t

        Bp = _round_up(B, 128)  # lane-full query batch for the kernel
        q_t = q_mm.T
        if Bp != B:
            q_t = jnp.pad(q_t, ((0, 0), (0, Bp - B)))
        outs = pallas_tile_stats_t(
            q_t, d, bias_p, n_valid=N, block_n=pallas_tpb * tile,
            with_min=with_stats,
        )
        tiles_b = outs[0][:, :, :B]  # [nb, tpb, B]
        if with_stats:
            tile_mins_b = outs[1][:, :, :B]
        nb, tpb = tiles_b.shape[0], tiles_b.shape[1]
    else:
        # XLA fallback (CPU tests, int8, tiny corpora): lax.scan over doc
        # blocks, emitting the same [nb, tpb, B] layout. tiles_per_block
        # must divide n_tiles (jnp.pad to a block multiple would COPY the
        # multi-GB doc matrix in HBM — measured allocator thrash).
        tpb_target = max(1, min(block_n, Np) // tile)
        tpb = 1
        for cand in range(min(tpb_target, n_tiles), 0, -1):
            if n_tiles % cand == 0:
                tpb = cand
                break
            if tpb_target - cand > 4096:  # give up the hunt, pad instead
                break
        if n_tiles % tpb == 0 and tpb >= max(1, tpb_target // 64):
            blk = tpb * tile
            nb = n_tiles // tpb
        else:  # rare: n_tiles nearly prime — pad (copies the doc matrix)
            blk = max(tile, (min(block_n, Np) // tile) * tile)
            nb = -(-Np // blk)
            if nb * blk != Np:
                d = jnp.pad(d, ((0, nb * blk - Np), (0, 0)))
            tpb = blk // tile
        d_blocks = d[: nb * blk].reshape(nb, blk, Dm)
        col = jax.lax.broadcasted_iota(jnp.int32, (1, blk), 1)
        POS_INF = jnp.float32(jnp.inf)

        def pass1(_, inp):
            blk_i, e_blk = inp
            s = jax.lax.dot_general(
                q_mm, e_blk, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=(jnp.int32 if int8_mode
                                        else jnp.float32),
            )  # [B, blk]
            if int8_mode:
                s = s.astype(jnp.float32) * INV8
            gidx = blk_i * blk + col
            raw = s
            if bias_p is not None:
                b_blk = jax.lax.dynamic_slice(bias_p, (blk_i * blk,), (blk,))
                s = s + b_blk[None, :]
            else:
                b_blk = None
            s = jnp.where(gidx < N, s, NEG_INF)
            tile_max = jnp.max(s.reshape(B, tpb, tile), axis=2).T  # [tpb, B]
            if not with_stats:
                return None, tile_max
            alive = gidx < N
            if b_blk is not None:
                alive = alive & (b_blk[None, :] >= 0.0)
            s_min = jnp.where(alive, raw, POS_INF)
            tile_min = jnp.min(s_min.reshape(B, tpb, tile), axis=2).T
            return None, (tile_max, tile_min)

        _, scanned = jax.lax.scan(
            pass1, None, (jnp.arange(nb, dtype=jnp.int32), d_blocks)
        )  # [nb, tpb, B] (pair when with_stats)
        if with_stats:
            tiles_b, tile_mins_b = scanned
        else:
            tiles_b = scanned

    # pass 2 (hierarchical, on the [nb, tpb, B] layout directly): the block
    # max IS the supertile max — take the top-k blocks per query (cheap
    # [B, nb] sort), gather just those blocks' tile maxima, then the top-k
    # tiles. Exact by the tile-max theorem at both levels: if a global
    # top-k value lived outside the selected blocks/tiles, >= k
    # blocks/tiles would each hold a larger value — contradiction. Garbage
    # tiles from grid overhang are -inf (masked in-kernel), never selected.
    # probe budget: select ONE extra tile beyond the gather budget so the
    # best unselected tile's max is known (the coverage certificate)
    if probe_tiles is not None and probe_tiles < min(k, n_tiles):
        # never fewer tiles than needed to hold k result slots
        k_gather = max(1, probe_tiles, -(-min(k, N) // tile))
        k_tiles = min(k_gather + 1, n_tiles)
    else:
        k_tiles = min(k, n_tiles)
        k_gather = k_tiles
    block_max_t = jnp.max(tiles_b, axis=1).T  # [B, nb]
    k_blocks = min(k_tiles, nb)
    if nb > 8192:  # avoid a wide sort program at extreme corpus sizes
        _, top_blocks = tiled_matrix_topk(block_max_t, k_blocks)
        top_blocks = jnp.maximum(top_blocks, 0)
    else:
        _, top_blocks = jax.lax.top_k(block_max_t, k_blocks)  # [B, kb]
    # gather the selected blocks' tile maxima: [B, kb, tpb]
    sel_tm = jax.vmap(lambda col, rows: col[rows], in_axes=(2, 0))(
        tiles_b, top_blocks
    )
    sel_tm = sel_tm.reshape(B, k_blocks * tpb)
    tile_ids = (top_blocks[:, :, None] * tpb
                + jax.lax.broadcasted_iota(jnp.int32, (1, 1, tpb), 2)
                ).reshape(B, k_blocks * tpb)
    if k_blocks * tpb > 4096:
        tmvals, sel_pos = tiled_matrix_topk(sel_tm, k_tiles)
        sel_pos = jnp.maximum(sel_pos, 0)
    else:
        tmvals, sel_pos = jax.lax.top_k(sel_tm, k_tiles)
    top_tiles = jnp.take_along_axis(tile_ids, sel_pos, axis=1)
    top_tiles = jnp.minimum(top_tiles, n_tiles - 1)
    if k_gather < k_tiles:
        # best unselected tile max (tmvals is descending): everything at
        # rank > k_gather is outside the probed set
        next_tile_max = tmvals[:, k_gather]
        top_tiles = top_tiles[:, :k_gather]
        k_tiles = k_gather
    else:
        next_tile_max = None

    # pass 3: gather the selected tiles' docs and re-score exactly (same
    # quantized values as pass 1 in int8 mode). Chunked over tiles so the
    # gathered [B, chunk, tile, D] buffer stays bounded (~256 MB) for any
    # k — an unchunked gather at k_dense=1024, B=128 was a 12 GB HBM temp.
    # bf16 docs stay bf16 through the gather AND the dot (f32 accumulate):
    # converting first doubled the gather's HBM traffic — at k_dense=512,
    # B=256, 10M docs that gather is the dense arm's dominant cost.
    d_tiles = d[: Np].reshape(n_tiles, tile, Dm)
    if int8_mode:
        q3 = q_mm.astype(jnp.float32)
    elif d.dtype == jnp.bfloat16:
        q3 = q.astype(jnp.bfloat16)
    else:
        q3 = q
    el_bytes = 4 if (int8_mode or d.dtype != jnp.bfloat16) else 2
    per_tile_bytes = max(1, B * tile * Dm * el_bytes)
    chunk = max(1, min(k_tiles, 268_435_456 // per_tile_bytes))
    s3_parts = []
    for c0 in range(0, k_tiles, chunk):
        tt = top_tiles[:, c0 : c0 + chunk]  # [B, c]
        sel = jnp.take(d_tiles, tt, axis=0)  # [B, c, tile, D]
        if int8_mode:
            sel = sel.astype(jnp.float32)
        s3_parts.append(jnp.einsum(
            "bktd,bd->bkt", sel, q3,
            preferred_element_type=jnp.float32,
        ).reshape(B, tt.shape[1] * tile))
    s3 = jnp.concatenate(s3_parts, axis=1) if len(s3_parts) > 1 else s3_parts[0]
    if int8_mode:
        s3 = s3 * INV8
    gidx3 = (top_tiles[:, :, None] * tile
             + jax.lax.broadcasted_iota(jnp.int32, (1, 1, tile), 2)).reshape(
        B, k_tiles * tile
    )
    if bias_p is not None:
        s3 = s3 + jnp.take(bias_p, gidx3)
    s3 = jnp.where(gidx3 < N, s3, NEG_INF)
    k_eff = min(k, N)
    if k_tiles * tile > 4096:
        vals, sel3 = tiled_matrix_topk(s3, k_eff)
        sel3 = jnp.maximum(sel3, 0)
    else:
        vals, sel3 = jax.lax.top_k(s3, k_eff)
    idxs = jnp.take_along_axis(gidx3, sel3, axis=1)
    idxs = jnp.where(jnp.isfinite(vals), idxs, -1)
    outs: Tuple[jax.Array, ...] = (vals, idxs)
    if with_stats:
        smax = jnp.max(block_max_t, axis=1)
        smin = jnp.min(tile_mins_b, axis=(0, 1))
        outs = outs + (smin, smax)
    if next_tile_max is not None:
        # coverage certificate: no unselected tile can hold a top-k value
        covered = (vals[:, k_eff - 1] >= next_tile_max) | (
            ~jnp.isfinite(next_tile_max)
        )
        outs = outs + (covered,)
    elif probe_tiles is not None:
        outs = outs + (jnp.ones((B,), bool),)
    return outs if len(outs) > 2 else (vals, idxs)


@functools.partial(jax.jit, static_argnames=("k", "tile"))
def tiled_matrix_topk(
    scores: jax.Array, k: int, tile: int = 128
) -> Tuple[jax.Array, jax.Array]:
    """Exact top-k over a precomputed [B, N] score matrix WITHOUT a wide
    sort: tile-max -> (hierarchical) top-k tiles -> exact top-k within the
    selected tiles. A single lax.top_k over millions of columns compiles to
    a huge sort program; every sort here is <= a few thousand wide.

    Same exactness argument as tiled_dense_topk. Padding columns (if N is
    not a tile multiple) are treated as -inf.
    """
    B, N = scores.shape
    n_tiles = -(-N // tile)
    Np = n_tiles * tile
    s = scores.astype(jnp.float32)
    if Np != N:
        s = jnp.pad(s, ((0, 0), (0, Np - N)), constant_values=NEG_INF)
    tile_maxes = jnp.max(s.reshape(B, n_tiles, tile), axis=2)

    k_tiles = min(k, n_tiles)
    SUPER = 128
    if n_tiles > 4 * SUPER and k_tiles * SUPER < n_tiles:
        n_super = -(-n_tiles // SUPER)
        pad_t = n_super * SUPER - n_tiles
        tm = jnp.pad(tile_maxes, ((0, 0), (0, pad_t)), constant_values=NEG_INF)
        super_max = jnp.max(tm.reshape(B, n_super, SUPER), axis=2)
        _, top_super = jax.lax.top_k(super_max, k_tiles)
        tm_groups = tm.reshape(B, n_super, SUPER)
        sel_tm = jnp.take_along_axis(tm_groups, top_super[:, :, None], axis=1)
        sel_tm = sel_tm.reshape(B, k_tiles * SUPER)
        tile_ids = (top_super[:, :, None] * SUPER
                    + jax.lax.broadcasted_iota(jnp.int32, (1, 1, SUPER), 2)
                    ).reshape(B, k_tiles * SUPER)
        _, sel_pos = jax.lax.top_k(sel_tm, k_tiles)
        top_tiles = jnp.take_along_axis(tile_ids, sel_pos, axis=1)
        top_tiles = jnp.minimum(top_tiles, n_tiles - 1)
    else:
        _, top_tiles = jax.lax.top_k(tile_maxes, k_tiles)

    s_tiles = s.reshape(B, n_tiles, tile)
    sel = jnp.take_along_axis(
        s_tiles, top_tiles[:, :, None], axis=1
    ).reshape(B, k_tiles * tile)
    gidx = (top_tiles[:, :, None] * tile
            + jax.lax.broadcasted_iota(jnp.int32, (1, 1, tile), 2)
            ).reshape(B, k_tiles * tile)
    k_eff = min(k, N)
    vals, pos = jax.lax.top_k(sel, k_eff)
    idxs = jnp.take_along_axis(gidx, pos, axis=1)
    idxs = jnp.where(jnp.isfinite(vals), idxs, -1)
    return vals, idxs


def dense_topk(
    queries: jax.Array,
    docs: jax.Array,
    k: int,
    block_n: int = 4096,
    normalized: bool = True,
    use_tiled: bool | None = None,
) -> Tuple[jax.Array, jax.Array]:
    """Exact top-k dense search. Dispatches to the tiled two-phase kernel
    (which itself uses the Pallas fused pass 1 on TPU when shapes allow)
    above ~16k docs, else the scan path."""
    N = docs.shape[0]
    k_eff = min(k, N)
    if not normalized:
        queries = l2_normalize(queries.astype(jnp.float32))
        docs = l2_normalize(docs.astype(jnp.float32))
    if use_tiled is None:
        use_tiled = N >= 4 * block_n and k_eff <= 512
    if use_tiled:
        return tiled_dense_topk(queries, docs, k_eff,
                                block_n=max(block_n, 65536))
    return scan_dense_topk(queries, docs, k_eff,
                           block_n=min(block_n, _round_up(N, 128)))


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


@functools.partial(jax.jit, static_argnames=("block_n", "tile"))
def dense_tile_stats(
    queries: jax.Array,
    docs: jax.Array,
    bias: jax.Array | None = None,
    block_n: int = 262144,
    tile: int = 128,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """([B, n_tiles] exact per-tile score maxima, [B] alive min, [B] alive
    max) in ONE streaming MXU sweep.

    The tile-max array is 128x smaller than the score matrix and carries
    everything the clustered joint-bound hybrid (ops/hybrid.py
    hybrid_tile_topk) needs from the dense arm: the probe-selection bound,
    the unprobed-tile certificate bound, and the exact min-max
    normalization statistics — without materializing [B, N] anywhere.
    Same Pallas fused pass-1 as tiled_dense_topk on TPU; lax.scan
    fallback elsewhere. bias is the 0/-inf alive mask.
    """
    import os

    q = queries.astype(jnp.float32)
    B, Dm = q.shape
    N = docs.shape[0]
    n_tiles = -(-N // tile)
    Np = n_tiles * tile
    d = jnp.pad(docs, ((0, Np - N), (0, 0))) if Np != N else docs
    bias_p = None
    if bias is not None:
        bias_p = jnp.pad(bias.astype(jnp.float32), (0, Np - N),
                         constant_values=NEG_INF)
    q_mm = q.astype(d.dtype) if d.dtype == jnp.bfloat16 else q

    pallas_tpb = int(os.environ.get("HST_PALLAS_TPB", "32"))
    use_pallas = (
        jax.default_backend() == "tpu"
        and tile == 128
        and Np == N
        and Dm % 128 == 0
        and n_tiles >= 2 * pallas_tpb
        and d.dtype != jnp.int8
    )
    if use_pallas:
        from hybridsearch_tpu.ops.pallas_topk import pallas_tile_stats_t

        Bp = _round_up(B, 128)
        q_t = q_mm.T
        if Bp != B:
            q_t = jnp.pad(q_t, ((0, 0), (0, Bp - B)))
        tiles_b, tile_mins_b = pallas_tile_stats_t(
            q_t, d, bias_p, n_valid=N, block_n=pallas_tpb * tile,
            with_min=True,
        )
        tiles_b = tiles_b[:, :, :B]
        tile_mins_b = tile_mins_b[:, :, :B]
        nb, tpb = tiles_b.shape[0], tiles_b.shape[1]
    else:
        blk = max(tile, (min(block_n, Np) // tile) * tile)
        nb = -(-Np // blk)
        if nb * blk != Np:
            d = jnp.pad(d, ((0, nb * blk - Np), (0, 0)))
            if bias_p is not None:
                bias_p = jnp.pad(bias_p, (0, nb * blk - Np),
                                 constant_values=NEG_INF)
        tpb = blk // tile
        d_blocks = d[: nb * blk].reshape(nb, blk, Dm)
        col = jax.lax.broadcasted_iota(jnp.int32, (1, blk), 1)
        POS_INF = jnp.float32(jnp.inf)

        def pass1(_, inp):
            blk_i, e_blk = inp
            s = jax.lax.dot_general(
                q_mm, e_blk, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [B, blk]
            gidx = blk_i * blk + col
            raw = s
            alive = gidx < N
            if bias_p is not None:
                b_blk = jax.lax.dynamic_slice(bias_p, (blk_i * blk,), (blk,))
                s = s + b_blk[None, :]
                alive = alive & (b_blk[None, :] >= 0.0)
            s = jnp.where(gidx < N, s, NEG_INF)
            tile_max = jnp.max(s.reshape(B, tpb, tile), axis=2).T
            s_min = jnp.where(alive, raw, POS_INF)
            tile_min = jnp.min(s_min.reshape(B, tpb, tile), axis=2).T
            return None, (tile_max, tile_min)

        _, (tiles_b, tile_mins_b) = jax.lax.scan(
            pass1, None, (jnp.arange(nb, dtype=jnp.int32), d_blocks)
        )  # [nb, tpb, B]

    smax = jnp.max(tiles_b, axis=(0, 1))
    smin = jnp.min(tile_mins_b, axis=(0, 1))
    tile_max = tiles_b.transpose(2, 0, 1).reshape(B, nb * tpb)[:, :n_tiles]
    return tile_max, smin, smax


def quantize_corpus_int8(
    docs: jax.Array, tile: int = 128
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Per-doc symmetric int8 quantization of an L2-normalized corpus.

    Returns (d8 [N, D] int8, scale [N] f32, tile_resid [n_tiles] f32):
      d8_j    = round(d_j / s_j * 127), s_j = max_i |d_j[i]|
      resid_j = ||d_j - d8_j * s_j/127||_2   (exact, computed here)
      tile_resid[t] = max over the 128 docs in tile t of resid_j
    Per-doc scaling shrinks the quantization step to s_j/127 (~6x tighter
    than global 1/127 scaling at D=384, where |d[i]| ~ 1/sqrt(D)), which
    keeps the int8 sweep's error interval small enough for the coverage
    certificate in int8_swept_topk to hold at realistic score gaps."""
    d = docs.astype(jnp.float32)
    N = d.shape[0]
    scale = jnp.maximum(jnp.max(jnp.abs(d), axis=1), 1e-12)  # [N]
    d8 = jnp.clip(jnp.round(d / scale[:, None] * 127.0), -127.0, 127.0)
    deq = d8 * (scale[:, None] / 127.0)
    resid = jnp.sqrt(jnp.sum(jnp.square(d - deq), axis=1))  # [N]
    n_tiles = -(-N // tile)
    resid_p = jnp.pad(resid, (0, n_tiles * tile - N))
    tile_resid = jnp.max(resid_p.reshape(n_tiles, tile), axis=1)
    return d8.astype(jnp.int8), scale, tile_resid


@functools.partial(jax.jit,
                   static_argnames=("k", "probe_tiles", "block_n", "tile"))
def int8_swept_topk(
    queries: jax.Array,  # [B, D] L2-normalized f32
    d8: jax.Array,  # [N, D] int8 (quantize_corpus_int8)
    d_scale: jax.Array,  # [N] f32
    docs: jax.Array,  # [N, D] bf16/f32 exact corpus (rescore operand)
    tile_resid: jax.Array,  # [n_tiles] f32
    k: int,
    probe_tiles: int | None = None,
    block_n: int = 262144,
    tile: int = 128,
    bias: jax.Array | None = None,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Exact-when-certified top-k with an INT8 pass-1 sweep (VERDICT r4
    ask 4 / ROADMAP lever 3, generalized from the hybrid's stats sweep to
    the dense kernel itself).

    pass 1 streams the int8 corpus (half the HBM bytes of bf16) through
    the MXU's int8 path (2x the bf16 rate on v5e) and reduces per-tile
    maxima of the dequantized scores; tile selection ranks the SOUND
    upper bounds m^_t + delta[b,t] where

      |q.d_j - q^.d^_j| <= rq + (1 + rq) * r_j   (triangle + Cauchy-
      Schwarz on unit q, d: q^ = dequantized query, rq = ||q - q^||,
      d^_j = dequantized doc, r_j = ||d_j - d^_j||)

      delta[b, t] = rq_b + (1 + rq_b) * tile_resid[t]

    pass 3 gathers the selected tiles' BF16 rows and rescores exactly, so
    returned VALUES are bit-identical to tiled_dense_topk's. The third
    return is the per-query coverage certificate: True iff the k-th found
    value >= the best UNSELECTED tile's inflated bound, in which case no
    top-k member can live outside the probed tiles and the result is
    EXACT. Callers escalate probe_tiles (or fall back to the bf16 sweep)
    on uncertified rows — same ladder as the supertile hybrid
    (retrieval/searcher.py). Baseline mandate: reference indexer.py:20-67
    (FAISS flat = exact); this kernel keeps the exactness contract while
    sweeping at int8 speed.

    probe_tiles defaults to 4*k (margin absorbs bound slack ~2e-2 from
    per-doc-scaled quantization at D=384)."""
    q = queries.astype(jnp.float32)
    B, Dm = q.shape
    N = d8.shape[0]
    n_tiles = -(-N // tile)
    Np = n_tiles * tile
    if Np != N:
        d8 = jnp.pad(d8, ((0, Np - N), (0, 0)))
        d_scale = jnp.pad(d_scale, (0, Np - N))
    bias_p = None
    if bias is not None:
        bias_p = jnp.pad(bias.astype(jnp.float32), (0, Np - N),
                         constant_values=NEG_INF)

    # query quantization (exact rq on device)
    sq = jnp.maximum(jnp.max(jnp.abs(q), axis=1), 1e-12)  # [B]
    q8 = jnp.clip(jnp.round(q / sq[:, None] * 127.0), -127.0, 127.0)
    rq = jnp.sqrt(jnp.sum(jnp.square(q - q8 * (sq[:, None] / 127.0)),
                          axis=1))  # [B]
    q8 = q8.astype(jnp.int8)
    INV = sq / (127.0 * 127.0)  # [B] per-query dequant factor (x scale_j)

    # -- pass 1: int8 sweep -> dequantized per-tile maxima ----------------
    blk = max(tile, (min(block_n, Np) // tile) * tile)
    nb = -(-Np // blk)
    if nb * blk != Np:
        d8 = jnp.pad(d8, ((0, nb * blk - Np), (0, 0)))
        d_scale = jnp.pad(d_scale, (0, nb * blk - Np))
        if bias_p is not None:
            bias_p = jnp.pad(bias_p, (0, nb * blk - Np),
                             constant_values=NEG_INF)
    tpb = blk // tile
    d_blocks = d8[: nb * blk].reshape(nb, blk, Dm)
    s_blocks = d_scale[: nb * blk].reshape(nb, blk)
    col = jax.lax.broadcasted_iota(jnp.int32, (1, blk), 1)

    def pass1(_, inp):
        blk_i, e_blk, sc_blk = inp
        s32 = jax.lax.dot_general(
            q8, e_blk, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        )  # [B, blk] int32
        s = s32.astype(jnp.float32) * (INV[:, None] * sc_blk[None, :])
        gidx = blk_i * blk + col
        ok = gidx < N
        if bias_p is not None:
            b_blk = jax.lax.dynamic_slice(bias_p, (blk_i * blk,), (blk,))
            ok = ok & (b_blk[None, :] >= 0.0)  # 0/-inf alive mask
        s = jnp.where(ok, s, NEG_INF)
        return None, jnp.max(s.reshape(B, tpb, tile), axis=2).T  # [tpb, B]

    _, tiles_b = jax.lax.scan(
        pass1, None,
        (jnp.arange(nb, dtype=jnp.int32), d_blocks, s_blocks),
    )  # [nb, tpb, B]
    tile_hat = tiles_b.transpose(2, 0, 1).reshape(B, nb * tpb)[:, :n_tiles]

    # -- pass 2: rank by sound inflated bounds ----------------------------
    delta = rq[:, None] + (1.0 + rq)[:, None] * tile_resid[None, :]
    bounds = jnp.where(jnp.isfinite(tile_hat), tile_hat + delta, NEG_INF)
    if probe_tiles is None:
        probe_tiles = 4 * k
    k_gather = max(1, min(probe_tiles, n_tiles), -(-min(k, N) // tile))
    k_sel = min(k_gather + 1, n_tiles)  # +1: the coverage witness
    if n_tiles > 4096:
        bvals, top_tiles = tiled_matrix_topk(bounds, k_sel)
        top_tiles = jnp.maximum(top_tiles, 0)
    else:
        bvals, top_tiles = jax.lax.top_k(bounds, k_sel)
    if k_gather < k_sel:
        next_bound = bvals[:, k_gather]  # best unselected tile's bound
        top_tiles = top_tiles[:, :k_gather]
    else:
        next_bound = jnp.full((B,), NEG_INF)

    # -- pass 3: exact bf16 rescore of the selected tiles -----------------
    s3, gidx3 = gather_tile_scores(q, docs, top_tiles, bias, tile=tile)
    k_eff = min(k, N)
    if k_gather * tile > 4096:
        vals, sel3 = tiled_matrix_topk(s3, k_eff)
        sel3 = jnp.maximum(sel3, 0)
    else:
        vals, sel3 = jax.lax.top_k(s3, k_eff)
    idxs = jnp.take_along_axis(gidx3, sel3, axis=1)
    idxs = jnp.where(jnp.isfinite(vals), idxs, -1)
    covered = (vals[:, k_eff - 1] >= next_bound) | ~jnp.isfinite(next_bound)
    return vals, idxs, covered


@functools.partial(jax.jit, static_argnames=("tile",))
def gather_tile_scores(
    queries: jax.Array,
    docs: jax.Array,
    top_tiles: jax.Array,  # [B, KT] int32 tile ids
    bias: jax.Array | None = None,
    tile: int = 128,
) -> Tuple[jax.Array, jax.Array]:
    """Exact scores of EVERY doc in the given tiles: ([B, KT*tile] scores,
    [B, KT*tile] global doc ids). Chunked tile gather + einsum with bf16
    operands and f32 accumulation — identical numerics to
    tiled_dense_topk's pass 3. Overhang rows (beyond len(docs)) and
    bias-dead docs score NEG_INF."""
    q = queries.astype(jnp.float32)
    B, Dm = q.shape
    N = docs.shape[0]
    n_tiles = -(-N // tile)
    Np = n_tiles * tile
    d = jnp.pad(docs, ((0, Np - N), (0, 0))) if Np != N else docs
    KT = top_tiles.shape[1]
    d_tiles = d.reshape(n_tiles, tile, Dm)
    q3 = q.astype(jnp.bfloat16) if docs.dtype == jnp.bfloat16 else q
    el_bytes = 2 if docs.dtype == jnp.bfloat16 else 4
    per_tile_bytes = max(1, B * tile * Dm * el_bytes)
    # transient budget per gather chunk: too small fragments the gather
    # into many sequential low-utilization einsums (26 chunks measured
    # 57.7 ms for 256 tiles x 256 queries at 10M — ~12% of HBM speed);
    # 1 GB keeps it to a few large steps
    import os as _os

    budget = int(_os.environ.get("HST_GATHER_CHUNK_MB", "1024")) << 20
    chunk = max(1, min(KT, budget // per_tile_bytes))
    tt_safe = jnp.minimum(top_tiles, n_tiles - 1)
    parts = []
    for c0 in range(0, KT, chunk):
        tt = tt_safe[:, c0 : c0 + chunk]
        sel = jnp.take(d_tiles, tt, axis=0)  # [B, c, tile, D]
        parts.append(jnp.einsum(
            "bktd,bd->bkt", sel, q3,
            preferred_element_type=jnp.float32,
        ).reshape(B, tt.shape[1] * tile))
    s = jnp.concatenate(parts, axis=1) if len(parts) > 1 else parts[0]
    gidx = (tt_safe[:, :, None] * tile
            + jax.lax.broadcasted_iota(jnp.int32, (1, 1, tile), 2)
            ).reshape(B, KT * tile)
    if bias is not None:
        s = s + jnp.take(bias.astype(jnp.float32),
                         jnp.minimum(gidx, N - 1))
    valid = (jnp.repeat(top_tiles, tile, axis=1) < n_tiles) & (gidx < N)
    s = jnp.where(valid, s, NEG_INF)
    return s, gidx
