"""Pallas TPU kernels for the dense retrieval hot path.

`pallas_tile_stats_t`: fused matmul + per-tile max (and optional alive-min)
epilogue — pass 1 of the tiled exact top-k (ops/dense.py:tiled_dense_topk),
replacing the reference's numba cosine loops and FAISS flat search
(reference utils.py:5-54, indexer.py:20-67). The XLA version materializes
the [B, block_n] score block in HBM between the dot and the reduce (~10 GB
of extra traffic per sweep at 10M docs); this kernel keeps the scores in
VMEM and writes only the per-tile maxima (128x smaller), making the whole
pass HBM-bound on reading the bf16 doc matrix once — the speed-of-light
for exact flat search.

Grid: one program per doc block. The transposed query block [D, B] stays
resident in VMEM across the grid and each step runs one natural
[block, D] x [D, B] MXU dot; Pallas double-buffers the doc-block DMA
automatically. Output layout is [nb, tpb, B] (lanes = queries, kept full
by padding B to 128) — see the v2 note below.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 128  # docs per selection tile (lane width)


# -- transposed-layout kernels (v2) ------------------------------------------------
#
# The v1 kernels compute q [B, D] x docs [block, D]^T — an rhs-transposed
# dot Mosaic must relayout every grid step — and write [nb, B, tpb] blocks
# whose trailing tpb=32 lane dim pads 4x in HBM (measured 152 MB/sweep
# written for 38 MB of data). v2 takes the query TRANSPOSED ([D, B], cast
# once outside) so each grid step is one natural [M, K] x [K, N] MXU dot
# (docs stationary-major, no relayout, no per-chunk loop), masks invalid
# rows in-kernel, and writes [nb, tpb, B] — B >= 128 keeps lanes full, so
# the output is unpadded and 4x less write traffic.


def _tile_max_t_body(qt_ref, d_ref, o_ref, bias_ref, n_valid, block_n):
    """One doc block, transposed: s = d_blk @ q_t -> [block_n, B];
    per-tile (128 doc rows) maxima -> [tpb, B]."""
    B = qt_ref.shape[1]
    tpb = block_n // TILE
    i = pl.program_id(0)
    s = jax.lax.dot_general(
        d_ref[:], qt_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [block_n, B]
    row = i * block_n + jax.lax.broadcasted_iota(jnp.int32, (block_n, 1), 0)
    if bias_ref is not None:
        s = s + bias_ref[:][:, None]
    s = jnp.where(row < n_valid, s, jnp.float32(-jnp.inf))
    o_ref[0] = jnp.max(s.reshape(tpb, TILE, B), axis=1)


def _tile_minmax_t_body(qt_ref, d_ref, omax_ref, omin_ref, bias_ref,
                        n_valid, block_n):
    """v2 minmax: maxima see s + bias (dead -> -inf); minima see raw s
    masked to +inf on dead/padding rows (exact alive-min stats for the
    sparse-correction hybrid, one sweep).

    HST_TILE_STATS_SUB=1 sub-chunks the dot+reduce in 1024-row pieces:
    the single-dot variant holds ~12 MB of live f32 intermediates per
    instance ([block_n, B] scores + two masked copies at B=256), which
    leaves Mosaic no VMEM headroom to double-buffer the doc blocks."""
    import os

    B = qt_ref.shape[1]
    tpb = block_n // TILE
    i = pl.program_id(0)
    sub = 1024
    if (os.environ.get("HST_TILE_STATS_SUB", "0") == "1"
            and block_n % sub == 0 and block_n > sub):
        spt = sub // TILE
        for c in range(block_n // sub):
            s = jax.lax.dot_general(
                d_ref[c * sub:(c + 1) * sub], qt_ref[:],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [sub, B]
            row = (i * block_n + c * sub
                   + jax.lax.broadcasted_iota(jnp.int32, (sub, 1), 0))
            valid = row < n_valid
            if bias_ref is not None:
                bias = bias_ref[c * sub:(c + 1) * sub][:, None]
                s_max = jnp.where(valid, s + bias, jnp.float32(-jnp.inf))
                s_min = jnp.where(valid & (bias >= 0.0), s,
                                  jnp.float32(jnp.inf))
            else:
                s_max = jnp.where(valid, s, jnp.float32(-jnp.inf))
                s_min = jnp.where(valid, s, jnp.float32(jnp.inf))
            omax_ref[0, c * spt:(c + 1) * spt] = jnp.max(
                s_max.reshape(spt, TILE, B), axis=1)
            omin_ref[0, c * spt:(c + 1) * spt] = jnp.min(
                s_min.reshape(spt, TILE, B), axis=1)
        return
    s = jax.lax.dot_general(
        d_ref[:], qt_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    row = i * block_n + jax.lax.broadcasted_iota(jnp.int32, (block_n, 1), 0)
    valid = row < n_valid
    if bias_ref is not None:
        bias = bias_ref[:][:, None]
        s_max = jnp.where(valid, s + bias, jnp.float32(-jnp.inf))
        s_min = jnp.where(valid & (bias >= 0.0), s, jnp.float32(jnp.inf))
    else:
        s_max = jnp.where(valid, s, jnp.float32(-jnp.inf))
        s_min = jnp.where(valid, s, jnp.float32(jnp.inf))
    omax_ref[0] = jnp.max(s_max.reshape(tpb, TILE, B), axis=1)
    omin_ref[0] = jnp.min(s_min.reshape(tpb, TILE, B), axis=1)


@functools.partial(jax.jit,
                   static_argnames=("block_n", "n_valid", "with_min", "interpret"))
def pallas_tile_stats_t(
    queries_t: jax.Array,  # [D, B] already in the docs' matmul dtype
    docs: jax.Array,  # [N, D] bf16/fp32, N % 128 == 0
    bias: jax.Array | None,
    n_valid: int,
    block_n: int = 4096,
    with_min: bool = False,
    interpret: bool = False,
) -> Tuple[jax.Array, ...]:
    """Tile maxima (and optionally alive-tile minima) of docs @ queries_t
    in [nb, tpb, B] layout. Rows >= n_valid are masked in-kernel (-inf max /
    +inf min), so grid overhang needs no epilogue slicing.

    Requirements: D % 128 == 0, block_n % (8 * TILE) == 0, B % 128 == 0
    (lane-full output; callers pad the query batch)."""
    D, B = queries_t.shape
    N = docs.shape[0]
    assert N % TILE == 0 and block_n % (8 * TILE) == 0 and D % 128 == 0
    assert B % 128 == 0
    nb = -(-N // block_n)
    tpb = block_n // TILE

    in_specs = [
        pl.BlockSpec((D, B), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((block_n, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
    ]
    args = [queries_t, docs]
    if bias is not None:
        in_specs.append(
            pl.BlockSpec((block_n,), lambda i: (i,), memory_space=pltpu.VMEM)
        )
        args.append(bias.astype(jnp.float32))

    out_block = pl.BlockSpec((1, tpb, B), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM)
    n_out = 2 if with_min else 1
    if with_min:
        if bias is not None:
            def kernel(qt, d, b, omax, omin):
                _tile_minmax_t_body(qt, d, omax, omin, b, n_valid, block_n)
        else:
            def kernel(qt, d, omax, omin):
                _tile_minmax_t_body(qt, d, omax, omin, None, n_valid, block_n)
    else:
        if bias is not None:
            def kernel(qt, d, b, o):
                _tile_max_t_body(qt, d, o, b, n_valid, block_n)
        else:
            def kernel(qt, d, o):
                _tile_max_t_body(qt, d, o, None, n_valid, block_n)

    out = pl.pallas_call(
        kernel,
        out_shape=[jax.ShapeDtypeStruct((nb, tpb, B), jnp.float32)] * n_out,
        grid_spec=pl.GridSpec(
            grid=(nb,),
            in_specs=in_specs,
            out_specs=[out_block] * n_out,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(1024 * 1024 * 100),
            dimension_semantics=(
                __import__("os").environ.get("HST_PALLAS_SEM", "arbitrary"),
            ),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * N * D,
            bytes_accessed=N * D * docs.dtype.itemsize + B * D * 4
            + (N * 4 if bias is not None else 0)
            + n_out * B * (N // TILE) * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*args)
    return tuple(out)
