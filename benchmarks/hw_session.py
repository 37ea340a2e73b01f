"""One consolidated hardware session: this environment's device tunnel
often wedges between client processes, so every measurement a recovery
window allows runs from a SINGLE process, most valuable first.

Phases (each guarded; later phases still run if one fails):
  1. sortmerge rescore micro-measurement (real shapes, distinct inputs)
  2. 10M clustered hybrid serving (bench_hybrid.run — the headline)
  3. dense headline sanity (bench.run_once at 10M)
  4. IVF recall/QPS sweep at 10M (bench_ivf)

Usage: python benchmarks/hw_session.py [phases ...] (default: 1 2)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/hst_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np


def phase_rescore():
    """Sort-merge rescore at serving shapes. Timing protocol: distinct
    inputs per iteration AND a host fetch of a per-iteration reduction —
    the tunnel has returned instant cached handles for pre-staged inputs
    before (0.0 ms/iter readings), so each sample round-trips a scalar
    that depends on that iteration's output."""
    from hybridsearch_tpu.ops.impact import sortmerge_rescore

    rng = np.random.default_rng(2)

    @jax.jit
    def red(c, i, w):
        return jnp.sum(sortmerge_rescore(c, i, w))

    def measure(label, B, C, W, iters=6):
        cands = [jnp.asarray(
            rng.integers(0, 10_000_000, (B, C)).astype(np.int32))
            for _ in range(iters + 1)]
        idss = [jnp.asarray(
            rng.integers(0, 10_000_000, (B, W)).astype(np.int32))
            for _ in range(iters + 1)]
        ws = jnp.asarray(rng.random((B, W)).astype(np.float32))
        jax.block_until_ready((cands, idss))
        float(red(cands[-1], idss[-1], ws))  # warmup/compile
        samples = []
        for i in range(iters):
            t0 = time.perf_counter()
            float(red(cands[i], idss[i], ws))  # host fetch => real exec
            samples.append((time.perf_counter() - t0) * 1e3)
        samples.sort()
        print(f"# {label}: med {samples[len(samples)//2]:.1f} ms "
              f"min {samples[0]:.1f} ms (host-fetch bound)", flush=True)

    measure("throwaway sortmerge B=8 W=2048", 8, 128, 2048, iters=2)
    measure("sortmerge B=256 C=1536 W=4096", 256, 1536, 4096)
    # deep rung: chunked internally to 4x 4096-wide sorts
    measure("sortmerge B=256 C=1536 W=16384", 256, 1536, 16384)


def phase_hybrid():
    from benchmarks.bench_hybrid import run

    for pd in (int(os.environ.get("HST_BENCH_PD", "1024")),):
        os.environ["HST_BENCH_PD"] = str(pd)
        print(json.dumps(run(int(os.environ.get("HST_BENCH_N",
                                                "10000000")),
                             batch=256, iters=6)), flush=True)


def phase_dense():
    from bench import run_once

    qps = run_once(10_000_000, iters=8)
    print(json.dumps({"metric": "dense_topk_qps@10M_b512",
                      "value": round(qps, 1)}), flush=True)


def phase_ivf():
    from benchmarks.bench_ivf import main as ivf_main

    ivf_main()


def phase_profile():
    """Stage attribution for the 10M hybrid (the 478 ms/batch question)."""
    import benchmarks.profile_hybrid as ph

    sys.argv = ["profile_hybrid", "--n",
                os.environ.get("HST_BENCH_N", "10000000"), "--b", "256"]
    ph.main()


def phase_ivf10m():
    os.environ["HST_BENCH_N"] = "10000000"
    phase_ivf()


def phase_tile_hybrid():
    """10M clustered serving through the tile-resident joint-bound path."""
    os.environ["HST_BENCH_TILEHYB"] = "1"
    os.environ["HST_BENCH_PD"] = "4096"
    import importlib

    import benchmarks.bench_hybrid as bh

    importlib.reload(bh)
    print(json.dumps(bh.run(int(os.environ.get("HST_BENCH_N", "10000000")),
                            batch=256, iters=6)), flush=True)


def phase_tile_jaccard():
    """10M quality + certified fraction for the tile path (device sem
    oracle, host lexical oracle)."""
    os.environ["HST_BENCH_TILEHYB"] = "1"
    os.environ["HST_BENCH_PD"] = "4096"
    import importlib

    import benchmarks.bench_hybrid as bh

    importlib.reload(bh)
    print(json.dumps(bh.jaccard_vs_oracle(
        int(os.environ.get("HST_BENCH_N", "10000000")), batch=32)),
        flush=True)


PHASES = {"1": phase_rescore, "2": phase_hybrid, "3": phase_dense,
          "4": phase_ivf, "5": phase_profile, "6": phase_ivf10m,
          "7": phase_tile_hybrid, "8": phase_tile_jaccard}


def main():
    want = sys.argv[1:] or ["1", "2"]
    backend = jax.default_backend()
    print(f"# backend={backend}", flush=True)
    assert backend == "tpu", "tunnel not available — aborting session"
    for p in want:
        t0 = time.time()
        try:
            PHASES[p]()
            print(f"# phase {p} ok +{time.time()-t0:.0f}s", flush=True)
        except Exception as e:
            print(f"# phase {p} FAILED: {type(e).__name__}: {e}",
                  flush=True)


if __name__ == "__main__":
    main()
