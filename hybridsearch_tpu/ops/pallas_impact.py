"""Pallas TPU kernels for the impact-pruned lexical arm (ops/impact.py).

Two hot ops become kernels:

1. `pallas_slice_runs` — gather-of-blocks: copy each query term's top-p
   impact-run prefix (a CONTIGUOUS [p] slice at a dynamic start) into the
   [B*T, p] staging layout. The XLA lowering of the vmapped dynamic_slice
   issues per-(b, t) gathers through the scalar pipeline (~54 ms at 10M
   docs, B=256); here each grid step issues 8 async DMAs from the
   HBM-resident postings with the starts prefetched to SMEM — pure copy
   at DMA speed. (8 rows per step: Mosaic requires output block rows
   divisible by 8.)

2. `pallas_onehot_rescore` — fused candidate rescore: the XLA path
   materializes the [B, C, W] one-hot comparison in HBM (~2.7 GB per
   256-query batch) before the dot; the kernel builds each [C, W_blk]
   comparison block in VMEM and accumulates the weighted row sums in a
   float32 accumulator, so HBM traffic is just cand + ids + ws once.

Both have jnp fallbacks in ops/impact.py; CPU tests run these kernels in
interpret mode for value parity (NOTE: interpret mode does not validate
Mosaic's block-shape rules — lowering constraints are exercised by the
TPU benchmarks).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_ROWS = 8  # Mosaic: output block rows must be divisible by 8


@functools.partial(jax.jit, static_argnames=("p", "align", "interpret"))
def pallas_slice_runs(
    doc_ids: jax.Array,  # [nnz_pad] int32 (pad tail >= p)
    weights: jax.Array,  # [nnz_pad] float32
    starts: jax.Array,  # [B, T] int32 run starts (align-multiples)
    p: int,
    align: int = 1024,
    interpret: bool = False,
):
    """([B*T, p] ids, [B*T, p] weights) — raw prefix copies; the caller
    masks invalid tails (ops/impact.py slice_impact_runs). B*T must be a
    multiple of 8 (the T ladder guarantees T >= 8).

    Run starts must be `align`-multiples (build_impact_postings align=):
    Mosaic must PROVE the HBM DMA start divisible by the memref tiling,
    so the kernel receives starts in units of align and multiplies by the
    constant inside."""
    BT = starts.shape[0] * starts.shape[1]
    assert BT % _ROWS == 0 and p % align == 0
    flat_starts = starts.reshape(BT) // align
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(BT // _ROWS,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=[
            pl.BlockSpec((_ROWS, p), lambda g, s: (g, 0)),
            pl.BlockSpec((_ROWS, p), lambda g, s: (g, 0)),
        ],
        scratch_shapes=[
            pltpu.SemaphoreType.DMA((_ROWS,)),
            pltpu.SemaphoreType.DMA((_ROWS,)),
        ],
    )

    def kernel(starts_ref, ids_hbm, ws_hbm, out_ids, out_ws, sem_i, sem_w):
        g = pl.program_id(0)
        copies = []
        for r in range(_ROWS):
            st = starts_ref[g * _ROWS + r] * align  # provably aligned
            ci = pltpu.make_async_copy(
                ids_hbm.at[pl.ds(st, p)], out_ids.at[r], sem_i.at[r])
            cw = pltpu.make_async_copy(
                ws_hbm.at[pl.ds(st, p)], out_ws.at[r], sem_w.at[r])
            ci.start()
            cw.start()
            copies.append((ci, cw))
        for ci, cw in copies:
            ci.wait()
            cw.wait()

    out_ids, out_ws = pl.pallas_call(
        kernel,
        out_shape=[
            jax.ShapeDtypeStruct((BT, p), doc_ids.dtype),
            jax.ShapeDtypeStruct((BT, p), weights.dtype),
        ],
        grid_spec=grid_spec,
        interpret=interpret,
    )(flat_starts, doc_ids, weights)
    return out_ids, out_ws


@functools.partial(jax.jit, static_argnames=("w_blk", "interpret"))
def pallas_onehot_rescore(
    cand: jax.Array,  # [B, C] int32, C % 128 == 0 (sentinels never match)
    ids_flat: jax.Array,  # [B, W] int32 pruned posting doc ids
    ws_flat: jax.Array,  # [B, W] float32 pruned posting weights (pad = 0)
    w_blk: int = 4096,  # 2048 measured ~60x slower on v5e (Mosaic layout)
    interpret: bool = False,
) -> jax.Array:
    """[B, C] float32 sums of posting weights at each candidate — the
    one-hot comparison built blockwise in VMEM, never in HBM. B must be a
    multiple of 8 (serving batches are; the wrapper in ops/impact.py pads
    otherwise)."""
    B, C = cand.shape
    W = ids_flat.shape[1]
    wb = min(w_blk, W)
    assert W % wb == 0 and C % 128 == 0 and B % _ROWS == 0
    nw = W // wb

    def kernel(cand_ref, ids_ref, ws_ref, out_ref):
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _init():
            out_ref[...] = jnp.zeros_like(out_ref)

        for r in range(_ROWS):
            eq = cand_ref[r][:, None] == ids_ref[r][None, :]  # [C, wb]
            contrib = jnp.where(eq, ws_ref[r][None, :], 0.0)
            out_ref[r, :] += jnp.sum(contrib, axis=1)

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, C), jnp.float32),
        grid=(B // _ROWS, nw),
        in_specs=[
            pl.BlockSpec((_ROWS, C), lambda b, j: (b, 0)),
            pl.BlockSpec((_ROWS, wb), lambda b, j: (b, j)),
            pl.BlockSpec((_ROWS, wb), lambda b, j: (b, j)),
        ],
        out_specs=pl.BlockSpec((_ROWS, C), lambda b, j: (b, 0)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(cand, ids_flat, ws_flat)
