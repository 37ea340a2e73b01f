"""Micro-benchmark: the supertile resident-placement kernel variants.

Chip attribution (benchmarks/attr_supertile.py, 2026-08-19) put the
placement stage at 473.7 ms of the 657 ms sp4/B=1024/10M hybrid batch —
~392 ms of it the one-hot contraction alone, ~100x its compute+HBM
floor (the factorized one-hot is ~0.5 TFLOP + ~1.1 GB of traffic at
these shapes). Hypothesis: the default dim-0/dim-0 `dot_general` makes
Mosaic relayout/transpose the f32 LHS on the VPU every 1024-entry
chunk; the `tlhs` variant builds the weighted row-one-hot transposed so
the MXU sees a native [M,K]x[K,N] contraction.

Rows (one JSON line each):
  perturb   cost of the i-dependent weight perturbation (subtract)
  base      pallas_place_windows, default layout
  tlhs      pallas_place_windows, transposed LHS
  jnp       the XLA scan fallback (reference point)
  twostep   _resident_windows + place (what serving pays today)
  fused     _place_windows_fused (gather fused into the kernel)

Usage (chip):  python benchmarks/micro_place.py [n_docs] [batch] [S,...]
Timing protocol: whole loop on device (fori_loop, checksum carry, one
scalar fetch), throwaway compile+run first — the environment's
identical-dispatch caching and first-executable-3x quirks are
documented in docs/KERNELS.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np  # noqa: F401  (shapes/debug)

from benchmarks.attr_supertile import setup, timed
from hybridsearch_tpu.ops.supertile import (
    _hybrid_super_impl,
    _place_windows,
    _place_windows_fused,
    _resident_windows,
    _interpret_kernels,
)
from hybridsearch_tpu.ops.pallas_supertile import pallas_place_windows

BLOCK_N = 262144
TOP_K = 10


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    probes = [int(s) for s in (sys.argv[3].split(",") if len(sys.argv) > 3
                               else ["4"])]
    iters = int(os.environ.get("HST_MICRO_ITERS", "8"))
    backend = jax.default_backend()
    assert backend in ("tpu", "cpu"), backend

    q, docs, sp, enc = setup(n_docs, batch)
    sd = sp.super_tiles * 128
    wcaps = tuple(min(w, sp.super_docs) for w in enc.wcaps)
    term_ids = enc.term_ids

    for S in probes:
        out, sup_s = _hybrid_super_impl(
            q, docs, sp.sup_max, sp.sup_pos, sp.ids_rows, sp.ws_rows,
            term_ids, jnp.asarray(enc.complete),
            jnp.asarray(enc.full_touched < n_docs),
            jnp.float32(0.7), jnp.float32(0.3), None,
            k=TOP_K, s_probe=S, wcaps=wcaps, norm="minmax",
            block_n=BLOCK_N, super_tiles=sp.super_tiles)
        jax.block_until_ready(out.values)
        sup_s = jax.device_put(sup_s)

        # stage the CSR windows ONCE for the pure-kernel rows — at a
        # REDUCED batch: at 10M the per-slot caps ride the batch max
        # (wcaps=(8192,)*8 -> TE=66k), so staging B=1024 x S=4 windows
        # is ~4.4 GB on top of the 7.7 GB corpus + CSR tables and
        # crashes the TPU worker (observed twice, 2026-08-19). Kernel
        # cost is linear in BS; B=256 isolates the same per-pair cost.
        bk = min(batch, int(os.environ.get("HST_MICRO_KB", "256")))
        l_cat, w_cat, _ovf = _resident_windows(
            sp.sup_pos, sp.ids_rows, sp.ws_rows, term_ids[:bk],
            sup_s[:bk], sd, wcaps)
        B, S_, TEp = l_cat.shape
        l2 = l_cat.reshape(B * S_, TEp)
        w2 = w_cat.reshape(B * S_, TEp)
        jax.block_until_ready(w2)
        del l_cat, w_cat
        row = {"n_docs": n_docs, "batch": batch, "kernel_batch": bk,
               "S": S, "TE": int(TEp), "BS": int(B * S_),
               "wcaps": list(wcaps), "backend": backend, "iters": iters}

        # i-dependent weight perturbation defeats loop-invariant hoisting
        # at ~one [BS, TE] f32 pass per iter; this row measures it so the
        # kernel rows can be read net of it
        def f_perturb(i, w_):
            return jnp.sum(w_ * (1.0 + i.astype(jnp.float32) * 1e-9))

        row["perturb_ms"] = round(timed(f_perturb, (w2,), iters), 2)

        def mk_pallas(tlhs, skip=False):
            def f(i, l_, w_):
                wi = w_ * (1.0 + i.astype(jnp.float32) * 1e-9)
                lex = pallas_place_windows(
                    l_, wi, sp.super_tiles, 128, ech=1024,
                    interpret=_interpret_kernels(), tlhs=tlhs, skip=skip)
                return jnp.sum(lex)
            return f

        row["base_ms"] = round(
            timed(mk_pallas(False), (l2, w2), iters), 2)
        print(json.dumps({"partial": True, **row}), flush=True)
        row["tlhs_ms"] = round(
            timed(mk_pallas(True), (l2, w2), iters), 2)
        print(json.dumps({"partial": True, **row}), flush=True)
        row["skip_ms"] = round(
            timed(mk_pallas(False, skip=True), (l2, w2), iters), 2)
        row["tlhs_skip_ms"] = round(
            timed(mk_pallas(True, skip=True), (l2, w2), iters), 2)
        print(json.dumps({"partial": True, **row}), flush=True)

        if os.environ.get("HST_MICRO_JNP", "0") == "1":
            def f_jnp(i, l_, w_):
                wi = w_ * (1.0 + i.astype(jnp.float32) * 1e-9)
                lex = _place_windows(
                    l_.reshape(B, S_, TEp), wi.reshape(B, S_, TEp),
                    sp.super_tiles, use_pallas=False)
                return jnp.sum(lex)

            row["jnp_ms"] = round(timed(f_jnp, (l2, w2), iters), 2)
            print(json.dumps({"partial": True, **row}), flush=True)

        # end-to-end placement (gather + one-hot), both layouts — what
        # the serving path actually pays per rung
        def mk_twostep(tlhs, skip=False):
            def f(i, t_, s_, pos_, ids_, ws_):
                # env gates are read at trace time inside _place_windows
                os.environ["HST_PLACE_TLHS"] = "1" if tlhs else "0"
                os.environ["HST_PLACE_SKIP"] = "1" if skip else "0"
                l_c, w_c, _o = _resident_windows(
                    pos_, ids_, ws_, jnp.roll(t_, i + 1, axis=0),
                    jnp.roll(s_, i, axis=0), sd, wcaps)
                lex4 = _place_windows(l_c, w_c, sp.super_tiles,
                                      use_pallas=True)
                return jnp.sum(lex4)
            return f

        args5 = (term_ids, sup_s, sp.sup_pos, sp.ids_rows, sp.ws_rows)
        row["twostep_base_ms"] = round(
            timed(mk_twostep(False), args5, iters), 2)
        row["twostep_tlhs_ms"] = round(
            timed(mk_twostep(True), args5, iters), 2)
        row["twostep_skip_ms"] = round(
            timed(mk_twostep(False, skip=True), args5, iters), 2)
        print(json.dumps({"partial": True, **row}), flush=True)

        def f_fused(i, t_, s_, pos_, ids_, ws_):
            lex4, _o = _place_windows_fused(
                pos_, ids_, ws_, jnp.roll(t_, i + 1, axis=0),
                jnp.roll(s_, i, axis=0), sd, wcaps, sp.super_tiles)
            return jnp.sum(lex4)

        try:
            row["fused_ms"] = round(timed(f_fused, args5, iters), 2)
        except Exception as e:  # noqa: BLE001 — keep the other rows
            row["fused_error"] = f"{type(e).__name__}: {e}"[:200]
        row.pop("partial", None)
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
