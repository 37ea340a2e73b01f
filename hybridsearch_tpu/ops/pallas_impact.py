"""Pallas TPU kernels for the impact-pruned lexical arm (ops/impact.py).

Two hot ops become kernels:

1. `pallas_slice_runs` — gather-of-blocks: copy each query term's top-p
   impact-run prefix (a CONTIGUOUS [p] slice at a dynamic start) into the
   [B*T, p] staging layout. The XLA lowering of the vmapped dynamic_slice
   issues per-(b, t) gathers through the scalar pipeline (~54 ms at 10M
   docs, B=256); here each grid step is ONE async DMA from the HBM-resident
   postings with the start prefetched to SMEM — pure copy at DMA speed.

2. `pallas_onehot_rescore` — fused candidate rescore: the XLA path
   materializes the [B, C, W] one-hot comparison in HBM (~2.7 GB per
   256-query batch) before the dot; the kernel builds each [C, W_blk]
   comparison block in VMEM and accumulates the weighted row sums in a
   float32 [C] accumulator, so HBM traffic is just cand + ids + ws once.

Both have jnp fallbacks in ops/impact.py; CPU tests run these kernels in
interpret mode for bit-parity.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


@functools.partial(jax.jit, static_argnames=("p", "interpret"))
def pallas_slice_runs(
    doc_ids: jax.Array,  # [nnz_pad] int32 (pad tail >= p)
    weights: jax.Array,  # [nnz_pad] float32
    starts: jax.Array,  # [B, T] int32 run starts
    p: int,
    interpret: bool = False,
):
    """([B*T, p] ids, [B*T, p] weights) — raw prefix copies; the caller
    masks invalid tails (ops/impact.py slice_impact_runs)."""
    BT = starts.shape[0] * starts.shape[1]
    flat_starts = starts.reshape(BT)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(BT,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=[
            pl.BlockSpec((1, p), lambda g, s: (g, 0)),
            pl.BlockSpec((1, p), lambda g, s: (g, 0)),
        ],
        scratch_shapes=[
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
    )

    def kernel(starts_ref, ids_hbm, ws_hbm, out_ids, out_ws, sem_i, sem_w):
        g = pl.program_id(0)
        st = starts_ref[g]
        ci = pltpu.make_async_copy(
            ids_hbm.at[pl.ds(st, p)], out_ids.at[0], sem_i)
        cw = pltpu.make_async_copy(
            ws_hbm.at[pl.ds(st, p)], out_ws.at[0], sem_w)
        ci.start()
        cw.start()
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
    w_blk: int = 1024,
    interpret: bool = False,
) -> jax.Array:
    """[B, C] float32 sums of posting weights at each candidate — the
    one-hot comparison built blockwise in VMEM, never in HBM."""
    B, C = cand.shape
    W = ids_flat.shape[1]
    wb = min(w_blk, W)
    assert W % wb == 0 and C % 128 == 0
    nw = W // wb

    def kernel(cand_ref, ids_ref, ws_ref, out_ref):
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _init():
            out_ref[...] = jnp.zeros_like(out_ref)

        eq = cand_ref[0][:, None] == ids_ref[0][None, :]  # [C, wb]
        contrib = jnp.where(eq, ws_ref[0][None, :], 0.0)
        out_ref[0, :] += jnp.sum(contrib, axis=1)

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, C), jnp.float32),
        grid=(B, nw),
        in_specs=[
            pl.BlockSpec((1, C), lambda b, j: (b, 0)),
            pl.BlockSpec((1, wb), lambda b, j: (b, j)),
            pl.BlockSpec((1, wb), lambda b, j: (b, j)),
        ],
        out_specs=pl.BlockSpec((1, C), lambda b, j: (b, 0)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(cand, ids_flat, ws_flat)
