"""Pallas TPU kernels for the dense retrieval hot path.

`pallas_tile_max`: fused matmul + per-tile max epilogue — pass 1 of the
tiled exact top-k (ops/dense.py:tiled_dense_topk). The XLA version
materializes the [B, block_n] score block in HBM between the dot and the
reduce (~10 GB of extra traffic per sweep at 10M docs); this kernel keeps
the scores in VMEM and writes only the [B, n_tiles] tile maxima (128x
smaller), making the whole pass HBM-bound on reading the bf16 doc matrix
once — the speed-of-light for exact flat search.

Grid: one program per doc block. The query block [B, D] stays resident in
VMEM across the grid; Pallas double-buffers the doc-block DMA automatically.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 128  # docs per selection tile (lane width)


def _tile_max_body(q_ref, d_ref, o_ref, bias_ref=None):
    """One doc block: scores = q @ d_blk^T (+bias), write per-tile maxima.

    The matmul runs in query chunks of <=128 rows so the fp32 score buffer
    stays small (<=2 MB at block_n=4096) regardless of batch size — large
    batches otherwise blow the VMEM budget and stall the DMA pipeline."""
    B = q_ref.shape[0]
    block_n = d_ref.shape[0]
    tpb = block_n // TILE
    bias = bias_ref[:][None, :] if bias_ref is not None else None
    q_chunk = min(B, 128)
    for c in range(0, B, q_chunk):
        s = jax.lax.dot_general(
            q_ref[c : c + q_chunk, :], d_ref[:],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [q_chunk, block_n] in VMEM
        if bias is not None:
            s = s + bias
        o_ref[0, c : c + q_chunk, :] = jnp.max(
            s.reshape(s.shape[0], tpb, TILE), axis=2
        )


def _tile_max_kernel(q_ref, d_ref, bias_ref, o_ref):
    _tile_max_body(q_ref, d_ref, o_ref, bias_ref)


def _tile_max_kernel_nobias(q_ref, d_ref, o_ref):
    _tile_max_body(q_ref, d_ref, o_ref, None)


def _tile_minmax_body(q_ref, d_ref, omax_ref, omin_ref, bias_ref=None):
    """Like _tile_max_body but also writes per-tile minima over ALIVE docs.

    bias is a 0/-inf mask: maxima see s + bias (dead -> -inf), minima see s
    masked to +inf where bias < 0 (dead rows never set the min). The minima
    feed the exact min-max normalization stats of the sparse-correction
    hybrid (ops/hybrid.py) without a second sweep of the doc matrix."""
    B = q_ref.shape[0]
    block_n = d_ref.shape[0]
    tpb = block_n // TILE
    bias = bias_ref[:][None, :] if bias_ref is not None else None
    q_chunk = min(B, 128)
    for c in range(0, B, q_chunk):
        s = jax.lax.dot_general(
            q_ref[c : c + q_chunk, :], d_ref[:],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if bias is not None:
            s_max = s + bias
            s_min = jnp.where(bias >= 0.0, s, jnp.float32(jnp.inf))
        else:
            s_max = s
            s_min = s
        rows = s.shape[0]
        omax_ref[0, c : c + q_chunk, :] = jnp.max(
            s_max.reshape(rows, tpb, TILE), axis=2
        )
        omin_ref[0, c : c + q_chunk, :] = jnp.min(
            s_min.reshape(rows, tpb, TILE), axis=2
        )


def _tile_minmax_kernel(q_ref, d_ref, bias_ref, omax_ref, omin_ref):
    _tile_minmax_body(q_ref, d_ref, omax_ref, omin_ref, bias_ref)


def _tile_minmax_kernel_nobias(q_ref, d_ref, omax_ref, omin_ref):
    _tile_minmax_body(q_ref, d_ref, omax_ref, omin_ref, None)


@functools.partial(jax.jit, static_argnames=("block_n",))
def pallas_tile_minmax(
    queries: jax.Array,
    docs: jax.Array,
    bias: jax.Array | None,
    block_n: int = 16384,
) -> Tuple[jax.Array, jax.Array]:
    """([B, n_tiles] tile maxima, [B, n_tiles] tile minima) of
    queries @ docs^T with a 0/-inf bias mask (see _tile_minmax_body).

    Same alignment requirements as pallas_tile_max. bf16/fp32 only (the
    int8 path keeps the max-only kernel)."""
    B, D = queries.shape
    N = docs.shape[0]
    assert N % TILE == 0 and block_n % (8 * TILE) == 0 and D % 128 == 0
    n_tiles = N // TILE
    nb = -(-N // block_n)
    tpb = block_n // TILE
    q = queries.astype(docs.dtype) if docs.dtype == jnp.bfloat16 else (
        queries.astype(jnp.float32)
    )
    in_specs = [
        pl.BlockSpec((B, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((block_n, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
    ]
    args = [q, docs]
    kernel = _tile_minmax_kernel_nobias
    if bias is not None:
        in_specs.append(
            pl.BlockSpec((block_n,), lambda i: (i,), memory_space=pltpu.VMEM)
        )
        args.append(bias.astype(jnp.float32))
        kernel = _tile_minmax_kernel
    grid_spec = pl.GridSpec(
        grid=(nb,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, B, tpb), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B, tpb), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
    )
    omax, omin = pl.pallas_call(
        kernel,
        out_shape=[
            jax.ShapeDtypeStruct((nb, B, tpb), jnp.float32),
            jax.ShapeDtypeStruct((nb, B, tpb), jnp.float32),
        ],
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(1024 * 1024 * 96),
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * N * D,
            bytes_accessed=N * D * docs.dtype.itemsize + B * D * 4
            + N * 4 + 2 * B * (N // TILE) * 4,
            transcendentals=0,
        ),
    )(*args)
    tmax = jnp.transpose(omax, (1, 0, 2)).reshape(B, nb * tpb)[:, :n_tiles]
    tmin = jnp.transpose(omin, (1, 0, 2)).reshape(B, nb * tpb)[:, :n_tiles]
    return tmax, tmin


INT8_INV_SCALE = 1.0 / (127.0 * 127.0)


def _tile_max_body_int8(q_ref, d_ref, o_ref, bias_ref=None):
    """int8 variant: int8 q x int8 docs on the MXU with int32 accumulation
    (2x MXU throughput and half the HBM read traffic of bf16); scores are
    rescaled to ~cosine before the bias add / tile max."""
    B = q_ref.shape[0]
    block_n = d_ref.shape[0]
    tpb = block_n // TILE
    bias = bias_ref[:][None, :] if bias_ref is not None else None
    q_chunk = min(B, 128)
    for c in range(0, B, q_chunk):
        s = jax.lax.dot_general(
            q_ref[c : c + q_chunk, :], d_ref[:],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        sf = s.astype(jnp.float32) * INT8_INV_SCALE
        if bias is not None:
            sf = sf + bias
        o_ref[0, c : c + q_chunk, :] = jnp.max(
            sf.reshape(sf.shape[0], tpb, TILE), axis=2
        )


def _tile_max_kernel_int8(q_ref, d_ref, bias_ref, o_ref):
    _tile_max_body_int8(q_ref, d_ref, o_ref, bias_ref)


def _tile_max_kernel_int8_nobias(q_ref, d_ref, o_ref):
    _tile_max_body_int8(q_ref, d_ref, o_ref, None)


@functools.partial(jax.jit, static_argnames=("block_n",))
def pallas_tile_max(
    queries: jax.Array,
    docs: jax.Array,
    bias: jax.Array | None,
    block_n: int = 16384,
) -> jax.Array:
    """[B, n_tiles] tile maxima of (queries @ docs^T + bias).

    bias=None selects the no-bias kernel variant (skips streaming the [N]
    bias vector — one less HBM input on the all-alive fast path).

    Requirements: docs.shape[0] % block_n == 0, block_n % 128 == 0,
    D % 128 == 0. Callers (tiled_dense_topk) guarantee alignment.
    """
    B, D = queries.shape
    N = docs.shape[0]
    # Mosaic rejects output blocks whose trailing dim is neither a multiple
    # of 8 nor the full array dim, so tpb must be a multiple of 8. The grid
    # need NOT divide N: Pallas pads edge blocks, and since N % 128 == 0 the
    # garbage rows land only in tiles >= n_tiles, which the caller slices
    # away below.
    assert N % TILE == 0 and block_n % (8 * TILE) == 0 and D % 128 == 0
    n_tiles = N // TILE
    nb = -(-N // block_n)
    tpb = block_n // TILE
    q = queries.astype(docs.dtype) if docs.dtype == jnp.bfloat16 else (
        queries.astype(jnp.float32)
    )

    in_specs = [
        pl.BlockSpec((B, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((block_n, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
    ]
    args = [q, docs]
    int8_mode = docs.dtype == jnp.int8
    kernel = _tile_max_kernel_int8_nobias if int8_mode else _tile_max_kernel_nobias
    if bias is not None:
        in_specs.append(
            pl.BlockSpec((block_n,), lambda i: (i,), memory_space=pltpu.VMEM)
        )
        args.append(bias.astype(jnp.float32))
        kernel = _tile_max_kernel_int8 if int8_mode else _tile_max_kernel
    grid_spec = pl.GridSpec(
        grid=(nb,),
        in_specs=in_specs,
        # out [nb, B, tpb]: trailing block dims equal the full array dims,
        # which satisfies the TPU (8, 128) tiling rule for any tpb.
        out_specs=pl.BlockSpec((1, B, tpb), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((nb, B, tpb), jnp.float32),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(1024 * 1024 * 96),
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * N * D,
            bytes_accessed=N * D * docs.dtype.itemsize + B * D * 4
            + N * 4 + B * (N // TILE) * 4,
            transcendentals=0,
        ),
    )(*args)
    full = jnp.transpose(out, (1, 0, 2)).reshape(B, nb * tpb)
    return full[:, :n_tiles]
