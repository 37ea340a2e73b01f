"""Real-TPU compile gate for gated serving kernels (VERDICT r4 ask 2).

Interpret-mode CI cannot see Mosaic resource limits: the round-4
HST_PLACE_FUSED lever passed the full interpret battery and then died
on hardware with `Allocation (size=2097152) would exceed memory
(size=1048576) .. space=smem` (docs/HW_R4_LOG.txt phase 12). This gate
AOT-compiles every gated serving kernel at real 10M serving shapes
through the actual TPU toolchain — `jit(fn).lower(<abstract shapes>)
.compile()` — WITHOUT uploading the corpus or executing anything, so a
lever that cannot compile can never again ship gated-but-dead.

Run it as `python benchmarks/compile_gate.py` on a live tunnel (or via
`python benchmarks/hw_session.py gate`). Prints one JSON line per
(kernel, variant) and a final summary line; exits non-zero if any
variant fails, so the hardware queue can block promotion on it.

Shapes come from the persisted 10M artifacts when present (the real
query encode against df/win_max/starts host tables); otherwise from a
representative worst-case fallback.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

D = 384
TILE = 128
SUPER_TILES = 128
SD = SUPER_TILES * TILE  # docs per supertile
N_DOCS = int(os.environ.get("HST_GATE_N", "10000000"))
NP_PAD = -(-N_DOCS // 4096) * 4096
SUPER_DIR = os.environ.get(
    "HST_GATE_SUPER_DIR",
    f"/tmp/hst_hybridbench_v2_{N_DOCS}_a1024_cl_super")


def _sds(shape, dtype):
    import jax

    return jax.ShapeDtypeStruct(shape, dtype)


def _encode_shapes(batch: int):
    """(T, wcaps, M) from the REAL artifacts + the standard bench query
    mix when available, else a representative fallback."""
    try:
        from benchmarks.bench_hybrid import correlated_queries
        from hybridsearch_tpu.ops.supertile import (
            WCAP_LADDER,
            _encode_super_vectorized,
        )

        df = np.load(os.path.join(SUPER_DIR, "df_host.npy"))
        win = np.load(os.path.join(SUPER_DIR, "win_max_host.npy"))
        starts = np.load(os.path.join(SUPER_DIR, "starts_host.npy"))
        ids_shape = np.load(os.path.join(SUPER_DIR, "ids_rows.npy"),
                            mmap_mode="r").shape
        term_lists, _topics = correlated_queries(batch)
        enc = _encode_super_vectorized(
            term_lists, df, win, starts_host=starts,
            cap=min(SD, WCAP_LADDER[-1]), wcap=None)
        return enc.term_ids.shape[1], tuple(
            min(int(w), SD) for w in enc.wcaps), ids_shape[0]
    except (OSError, ImportError, ValueError) as e:
        print(f"# artifacts unavailable ({type(e).__name__}: {e}); "
              "using fallback worst-case shapes", file=sys.stderr)
        wcaps = ((16384,) * 1 + (8192,) * 1 + (4096,) * 2 + (2048,) * 4
                 + (1024,) * 8 + (512,) * 16)
        return 32, tuple(min(w, SD) for w in wcaps), 3_600_000


def _variants(batch: int, s_probe: int):
    """(label, env overrides, thunk) per gated kernel at serving shapes.
    Thunks build the lowered computation lazily AFTER env is applied
    (some gates are read at trace time)."""
    import jax
    import jax.numpy as jnp

    from hybridsearch_tpu.ops import pallas_supertile as psup
    from hybridsearch_tpu.ops import pallas_topk as ptopk

    T, wcaps, M = _encode_shapes(batch)
    BS = batch * s_probe
    P = BS

    def place_fused():
        psup.pallas_place_fused.clear_cache()
        return psup.pallas_place_fused.lower(
            _sds((BS, T), jnp.int32), _sds((BS, T), jnp.int32),
            _sds((BS,), jnp.int32), _sds((M, 128), jnp.int32),
            _sds((M, 128), jnp.float32),
            wcaps=wcaps, super_tiles=SUPER_TILES, tile=TILE,
            interpret=False)

    def scores():
        fn = jax.jit(psup.pallas_super_scores,
                     static_argnames=("sd", "ch", "interpret"))
        return fn.lower(
            _sds((batch, D), jnp.bfloat16),
            _sds((NP_PAD, D), jnp.bfloat16),
            _sds((batch, s_probe), jnp.int32), sd=SD, interpret=False)

    def scores_dedup():
        psup.pallas_super_scores_dedup.clear_cache()
        return psup.pallas_super_scores_dedup.lower(
            _sds((P, D), jnp.bfloat16),
            _sds((NP_PAD, D), jnp.bfloat16),
            _sds((P,), jnp.int32), _sds((P,), jnp.int32),
            sd=SD, interpret=False)

    def tile_stats():
        ptopk.pallas_tile_stats_t.clear_cache()
        return ptopk.pallas_tile_stats_t.lower(
            _sds((D, batch), jnp.bfloat16),
            _sds((-(-N_DOCS // 128) * 128, D), jnp.bfloat16),
            None, n_valid=N_DOCS, with_min=True, interpret=False)

    return [
        ("place_fused", {"HST_PLACE_FUSED": "1"}, place_fused),
        ("scores_base", {}, scores),
        ("scores_dedup", {"HST_SCORES_DEDUP": "1", "HST_DEDUP_MXU": "0"},
         scores_dedup),
        ("scores_dedup_mxu", {"HST_SCORES_DEDUP": "1",
                              "HST_DEDUP_MXU": "1"}, scores_dedup),
        ("tile_stats_minmax", {"HST_TILE_STATS_SUB": "0"}, tile_stats),
        ("tile_stats_sub", {"HST_TILE_STATS_SUB": "1"}, tile_stats),
    ]


def main() -> int:
    import jax

    backend = jax.default_backend()
    if backend != "tpu" and os.environ.get("HST_GATE_ALLOW_CPU") != "1":
        print(json.dumps({"gate": "compile", "ok": False,
                          "error": f"need tpu backend, got {backend}"}))
        return 2
    rows, failed = [], []
    for batch in (int(b) for b in os.environ.get(
            "HST_GATE_BATCHES", "256,1024").split(",")):
        for label, env, thunk in _variants(batch,
                                           int(os.environ.get(
                                               "HST_GATE_SP", "4"))):
            prior = {k: os.environ.get(k) for k in env}
            os.environ.update(env)
            t0 = time.time()
            try:
                lowered = thunk()
                lowered.compile()
                row = {"kernel": label, "batch": batch, "env": env,
                       "compile_ok": True,
                       "compile_s": round(time.time() - t0, 1)}
            except Exception as e:  # noqa: BLE001 — report, don't die
                msg = str(e)
                row = {"kernel": label, "batch": batch, "env": env,
                       "compile_ok": False,
                       "compile_s": round(time.time() - t0, 1),
                       "error": f"{type(e).__name__}: {msg[:500]}"}
                failed.append(f"{label}@b{batch}")
            finally:
                for k, v in prior.items():
                    if v is None:
                        os.environ.pop(k, None)
                    else:
                        os.environ[k] = v
            rows.append(row)
            print(json.dumps(row), flush=True)
    print(json.dumps({"gate": "compile", "ok": not failed,
                      "failed": failed, "n": len(rows)}), flush=True)
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
