"""Per-stage ablation profiler for the 10M impact hybrid.

The driver-observed mystery (ROADMAP round-3 item 1): clean-process hybrid
batches at 10M measure ~400 ms/batch regardless of batch size, while warm
processes measure 125-205 ms. This script times each sub-stage of
_hybrid_impact_impl as its own jitted program (rotated inputs, async
dispatch, one block at the end) so the fixed cost can be attributed.

Stages:
  dispatch   trivial jitted add round trip (tunnel dispatch floor)
  dense_k10  tiled_dense_topk k=10 (the headline kernel)
  dense_kd   tiled_dense_topk k=512 (the hybrid's pass-2/3 depth)
  dense_st   tiled_dense_topk k=512 with_stats=True (hybrid's actual call)
  slice      slice_impact_runs p=1024
  rescore    onehot_rescore on the real candidate/posting shapes
  semgather  row gather + einsum for lexical candidates' semantic scores
  bisect     cand_scores_bisect margin correction on the full CSR
  full       hybrid_impact_topk end to end

Usage: python benchmarks/profile_hybrid.py [--n 10000000] [--b 256]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/hst_jax_cache")

from benchmarks.bench_hybrid import (  # noqa: E402
    D,
    KD,
    CP,
    PD,
    P_MAX,
    TOP_K,
    build_correlated_corpus,
    correlated_queries,
    query_vectors,
    synth_correlated,
)


def _time(label, fn, *args, iters=4, rot=None):
    """Compile, then measure iters dispatches with rotated inputs."""
    try:
        out = fn(*args)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for i in range(iters):
            a = list(args)
            if rot is not None:
                a[rot] = jnp.roll(args[rot], i + 1, axis=0)
            out = fn(*a)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / iters * 1e3
        print(f"{label:12s} {dt:8.1f} ms/iter", flush=True)
        return dt
    except Exception as e:  # keep profiling the rest
        print(f"{label:12s} FAILED: {type(e).__name__}: {e}", flush=True)
        return float("nan")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=int(os.environ.get("HST_BENCH_N", "10000000")))
    ap.add_argument("--b", type=int, default=256)
    args = ap.parse_args()
    n_docs, B = args.n, args.b

    from hybridsearch_tpu.ops.dense import tiled_dense_topk
    from hybridsearch_tpu.ops.hybrid import hybrid_impact_topk
    from hybridsearch_tpu.ops.impact import (
        ImpactPostings,
        build_impact_postings,
        encode_impact_queries,
        onehot_rescore,
        slice_impact_runs,
    )
    from hybridsearch_tpu.ops.bm25 import cand_scores_bisect

    t0 = time.time()

    def _mark(label):
        print(f"# {label} +{time.time()-t0:.0f}s", flush=True)

    from hybridsearch_tpu.ops.impact import default_align

    align = default_align()
    cluster = os.environ.get("HST_BENCH_CLUSTER", "1") != "0"
    cache = (f"/tmp/hst_hybridbench_v2_{n_docs}_a{align}"
             + ("_cl" if cluster else "") + ".npz")
    if os.path.exists(cache):
        z = np.load(cache)
        topic_of, d_ids, w, df = z["topic_of"], z["d"], z["w"], z["df"]
        vocab = int(z["vocab"])
        _mark("npz host arrays")
        imp = ImpactPostings(
            doc_ids=jnp.asarray(z["imp_ids"]),
            weights=jnp.asarray(z["imp_ws"]),
            n_docs=n_docs, p_max=P_MAX, starts_host=z["imp_starts"],
            lengths_host=z["imp_lens"], slack_host=z["imp_slack"],
            weights_host=z["imp_wh"], df_host=z["df"].astype(np.int64),
            align=align,
        )
        jax.block_until_ready(imp.weights)
        _mark("imp on device")
    else:
        topic_of, t_ids, d_ids, w, vocab, df = synth_correlated(n_docs)
        _mark("synth")
        imp = build_impact_postings(t_ids, d_ids, w, n_docs, vocab,
                                    p_max=P_MAX, align=align)
        jax.block_until_ready(imp.weights)
        _mark("imp built")
    docs, cent = build_correlated_corpus(n_docs, topic_of)
    _mark("corpus on device")
    print(f"# setup {time.time()-t0:.0f}s  backend={jax.default_backend()}",
          flush=True)

    starts_full = np.concatenate([[0], np.cumsum(df)])[:-1]
    full = (jnp.asarray(d_ids.astype(np.int32)), jnp.asarray(w))
    term_lists, q_topics = correlated_queries(B)
    enc = encode_impact_queries(imp, term_lists, p_depth=PD,
                                full_starts=starts_full, full_lengths=df)
    q = query_vectors(q_topics, cent)
    N = docs.shape[0]
    T = enc.starts.shape[1]

    # dispatch floor
    small = jnp.ones((8, 128), jnp.float32)
    f_add = jax.jit(lambda x: (x + 1.0).sum())
    _time("dispatch", f_add, small)

    # dense arm variants
    _time("dense_k10", lambda qq: tiled_dense_topk(qq, docs, TOP_K), q, rot=0)
    _time("dense_kd", lambda qq: tiled_dense_topk(qq, docs, KD), q, rot=0)
    _time("dense_st",
          lambda qq: tiled_dense_topk(qq, docs, KD, with_stats=True), q,
          rot=0)

    # lexical slice + rescore
    f_slice = lambda s: slice_impact_runs(imp.doc_ids, imp.weights, s,
                                          enc.lengths, p_depth=PD, n_docs=N,
                                          align=imp.align)
    _time("slice", f_slice, enc.starts)

    ids_r, ws_r = slice_impact_runs(imp.doc_ids, imp.weights, enc.starts,
                                    enc.lengths, p_depth=PD, n_docs=N,
                                    align=imp.align)
    ids_flat = ids_r.reshape(B, T * PD)
    ws_flat = ws_r.reshape(B, T * PD)
    cand_l = ids_r[:, :, :CP].reshape(B, T * CP)
    rng = np.random.default_rng(0)
    cand_d = jnp.asarray(rng.integers(0, N, (B, KD)).astype(np.int32))
    cand_all = jnp.concatenate([cand_d, cand_l], axis=1)
    jax.block_until_ready(cand_all)
    _time("rescore", lambda c: onehot_rescore(c, ids_flat, ws_flat, bq=8),
          cand_all, rot=0)
    from hybridsearch_tpu.ops.impact import sortmerge_rescore

    _time("rescore_sm",
          lambda c: sortmerge_rescore(c, ids_flat, ws_flat),
          cand_all, rot=0)

    @jax.jit
    def semgather(cl, dd, qq):
        # dd/qq are ARGUMENTS: closing over the 7.7 GB corpus inside
        # jax.jit bakes it as a constant and breaks the compile tunnel
        # (HTTP 413 / broken transport).
        d_sel = jnp.take(dd, jnp.clip(cl, 0, N - 1).reshape(-1), axis=0)
        d_sel = d_sel.reshape(B, T * CP, D).astype(jnp.float32)
        return jnp.einsum("bcd,bd->bc", d_sel, qq,
                          preferred_element_type=jnp.float32)

    _time("semgather", semgather, cand_l, docs, q, rot=0)

    # the tile-budget dense pass exactly as the hybrid's pass 2/3 calls it
    _time("dense_ktb",
          lambda qq: tiled_dense_topk(qq, docs, KD, with_stats=True,
                                      probe_tiles=128), q, rot=0)

    if enc.hot_starts is not None:
        safe_m = cand_all[:, :128]
        _time("bisect",
              lambda m: cand_scores_bisect(full[0], full[1], enc.hot_starts,
                                           enc.hot_lens, m),
              safe_m, rot=0)

    def serve(qq):
        return hybrid_impact_topk(
            qq, docs, imp, enc, TOP_K, 0.7, 0.3, k_dense=KD, c_per_term=CP,
            p_depth=PD, n_alive=n_docs, full_postings=full,
        )

    _time("full", serve, q, rot=0, iters=6)
    # second measurement after everything is warm (placement steady state)
    _time("full2", serve, q, rot=0, iters=6)

    def serve_kt(qq):
        return hybrid_impact_topk(
            qq, docs, imp, enc, TOP_K, 0.7, 0.3, k_dense=KD, c_per_term=CP,
            p_depth=PD, n_alive=n_docs, full_postings=full, kd_tiles=128,
        )

    # the bench's exact serving config (tile-budget dense pass)
    _time("full_kt", serve_kt, q, rot=0, iters=6)
    _time("full_kt2", serve_kt, q, rot=0, iters=6)


if __name__ == "__main__":
    main()
