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


@functools.partial(jax.jit,
                   static_argnames=("super_tiles", "tile", "ech",
                                    "interpret"))
def pallas_place_windows(
    l_flat: jax.Array,  # [BS, TE] int32 local doc ids (invalid < 0 or >= R)
    w_flat: jax.Array,  # [BS, TE] float32 (invalid entries = 0)
    super_tiles: int = 128,
    tile: int = 128,
    ech: int = 1024,  # 2048 OOMed VMEM: the 8 unrolled rows' one-hot
    #                   temporaries (~2.5 MB each) co-allocate on stack
    interpret: bool = False,
) -> jax.Array:
    """[BS, super_tiles, tile] f32 resident lexical buffers. TE must be a
    multiple of `ech`; BS is padded to a multiple of 8 here (Mosaic:
    block rows divisible by 8)."""
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
        for r in range(_ROWS):
            l = l_ref[r]  # [ech]
            w = w_ref[r]  # [ech]
            # no explicit l >= 0 guard: a negative l floor-divides to a
            # negative row, matching no r_iota row, so its c_hot column
            # never receives weight. (A bool [ech] -> [ech, 1] reshape
            # also trips Mosaic: "insertion of minor dim ... only
            # supported for 32-bit types".)
            r_hot = l[:, None] // tile == r_iota  # [ech, St]
            wh = jnp.where(r_hot, w[:, None], 0.0)  # f32 exact row select
            c_hot = (l[:, None] % tile == c_iota).astype(jnp.bfloat16)
            out_ref[r] += jax.lax.dot_general(
                wh, c_hot, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

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
