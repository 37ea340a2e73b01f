"""Persistent XLA compile cache for serving processes.

On this class of deployment the expensive event is COMPILATION, not
execution: the serving path's executable set is the cross product of
batch pad buckets x query term-shape buckets x certificate-escalation
rungs, and on a remote-compile device tunnel each first-seen combo costs
seconds to minutes (loadgen on chip measured p99 20.7 s with 128 client
timeouts, all compile stalls — 2026-08-19). The persistent cache makes
every executable a one-time cost per HOST instead of per process: server
restarts, benchmark children, and the hardware queue all reuse it.

The reference has no equivalent concern (numpy/FAISS have no compile
step); this is TPU-native operational machinery.
"""

from __future__ import annotations

import os


def enable_persistent_compile_cache() -> str | None:
    """Point JAX's compilation cache at a persistent directory.

    Env: HST_COMPILE_CACHE=<dir> overrides the default
    (/tmp/hst_jax_cache); "0" or "" disables. Returns the directory in
    effect, or None when disabled/unsupported. Idempotent.
    """
    d = os.environ.get("HST_COMPILE_CACHE", "/tmp/hst_jax_cache")
    if d in ("", "0"):
        return None
    try:
        import jax

        jax.config.update("jax_compilation_cache_dir", d)
        try:
            # persist even fast compiles: the tunnel's cost is the
            # round trip + queueing, not XLA time, so small executables
            # are worth caching too
            jax.config.update("jax_persistent_cache_min_compile_time_secs",
                              0.5)
        except Exception:  # noqa: BLE001 — older flag name/absent
            pass
    except Exception:  # noqa: BLE001 — never fail serving over a cache
        return None
    return d
