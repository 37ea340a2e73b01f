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
if os.environ.get("JAX_PLATFORMS") == "cpu":
    # the axon TPU plugin wins over the env var; force via config (must
    # run before backend init — same fix as run_configs.py)
    jax.config.update("jax_platforms", "cpu")

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


def phase_tile_profile():
    """Stage attribution for the tile-resident hybrid at 10M (the
    997 ms/batch question): each sub-stage timed as its own program with
    rotated inputs + a host-fetched reduction."""
    import numpy as np

    os.environ.setdefault("HST_BENCH_PD", "4096")
    import importlib

    import benchmarks.bench_hybrid as bh

    importlib.reload(bh)
    from hybridsearch_tpu.ops.dense import (
        dense_tile_stats,
        gather_tile_scores,
        tiled_matrix_topk,
    )
    from hybridsearch_tpu.ops.impact import (
        ImpactPostings,
        build_impact_postings,
        encode_impact_queries,
        slice_impact_runs,
    )

    n_docs, B = int(os.environ.get("HST_BENCH_N", "10000000")), 256
    PD = bh.PD
    from hybridsearch_tpu.ops.impact import default_align

    align = default_align()
    cache = f"/tmp/hst_hybridbench_v2_{n_docs}_a{align}_cl.npz"
    z = np.load(cache)
    topic_of, d_ids, w, df = z["topic_of"], z["d"], z["w"], z["df"]
    imp = ImpactPostings(
        doc_ids=jnp.asarray(z["imp_ids"]), weights=jnp.asarray(z["imp_ws"]),
        n_docs=n_docs, p_max=bh.P_MAX, starts_host=z["imp_starts"],
        lengths_host=z["imp_lens"], slack_host=z["imp_slack"],
        weights_host=z["imp_wh"], df_host=df.astype(np.int64), align=align)
    docs, cent = bh.build_correlated_corpus(n_docs, topic_of)
    jax.block_until_ready(imp.weights)
    starts_full = np.concatenate([[0], np.cumsum(df)])[:-1]
    term_lists, q_topics = bh.correlated_queries(B)
    enc = encode_impact_queries(imp, term_lists, p_depth=PD,
                                full_starts=starts_full, full_lengths=df)
    q = bh.query_vectors(q_topics, cent)
    N = docs.shape[0]
    n_tiles = N // 128
    T = enc.starts.shape[1]
    W = T * PD
    print(f"# T={T} W={W} n_tiles={n_tiles}", flush=True)
    rng = np.random.default_rng(0)

    @jax.jit
    def _red(out):
        return sum(jnp.sum(x.astype(jnp.float32))
                   for x in jax.tree_util.tree_leaves(out))

    def _time(label, fn, *args, iters=4, rot=0):
        # host-fetch a scalar reduction per iteration: block_until_ready
        # alone now resolves without execution on this tunnel (0.1 ms
        # readings for a 40 ms kernel, 2026-08-17)
        try:
            float(_red(fn(*args)))
            samples = []
            for i in range(iters):
                a = list(args)
                a[rot] = jnp.roll(args[rot], i + 1, axis=0)
                jax.block_until_ready(a[rot])
                t0 = time.perf_counter()
                float(_red(fn(*a)))
                samples.append((time.perf_counter() - t0) * 1e3)
            samples.sort()
            print(f"{label:14s} {samples[len(samples)//2]:8.1f} ms "
                  f"(min {samples[0]:.1f})", flush=True)
        except Exception as e:
            print(f"{label:14s} FAILED {type(e).__name__}: {e}", flush=True)

    # throwaway first-compile burn
    jax.block_until_ready(jax.jit(lambda x: (x @ x.T).sum())(q))

    # NOTE: dense_tile_stats / slice_impact_runs / gather_tile_scores are
    # already jitted with the big arrays as traced ARGUMENTS. Wrapping them
    # in an outer jax.jit(lambda ...) closure-captures the 7.7 GB corpus as
    # a baked CONSTANT — the compile request then exceeds the tunnel's
    # body limit (HTTP 413) and can break its transport (2026-08-17).
    _time("tile_stats", lambda qq: dense_tile_stats(qq, docs, None), q)

    f_slice = lambda s: slice_impact_runs(
        imp.doc_ids, imp.weights, s, enc.lengths, p_depth=PD, n_docs=N,
        align=imp.align)
    _time("slice4k", f_slice, enc.starts)
    ids_r, ws_r = f_slice(enc.starts)
    ids_flat = ids_r.reshape(B, W)
    ws_flat = ws_r.reshape(B, W)

    @jax.jit
    def scat_tile(idsf, wsf):
        tids = idsf // 128
        rows = jnp.arange(B, dtype=jnp.int32)[:, None]
        return jnp.zeros((B, n_tiles), jnp.float32).at[rows, tids].add(
            wsf, mode="drop")

    _time("scat_ntiles", scat_tile, ids_flat, ws_flat)
    lex_tile = scat_tile(ids_flat, ws_flat)

    @jax.jit
    def sel(bound):
        _, tt = tiled_matrix_topk(bound, 128)
        return jnp.sort(jnp.maximum(tt, 0), axis=1)

    _time("tile_topk", sel, lex_tile)
    ts = sel(lex_tile)

    _time("gather128",
          lambda tt: gather_tile_scores(q, docs, tt, None)[0], ts, rot=0)

    @jax.jit
    def bisect_scat(tt, idsf, wsf):
        tids = idsf // 128
        pos = jax.vmap(jnp.searchsorted)(tt, tids)
        pos_c = jnp.clip(pos, 0, 127)
        hit = jnp.take_along_axis(tt, pos_c, axis=1) == tids
        bufidx = jnp.where(hit, pos_c * 128 + idsf % 128, 128 * 128)
        rows = jnp.arange(B, dtype=jnp.int32)[:, None]
        return jnp.zeros((B, 128 * 128), jnp.float32).at[rows, bufidx].add(
            wsf, mode="drop")

    _time("bisect_scat", bisect_scat, ts, ids_flat, ws_flat, rot=1)

    @jax.jit
    def searchsorted_only(tt, idsf):
        return jax.vmap(jnp.searchsorted)(tt, idsf // 128).sum()

    _time("searchsorted", searchsorted_only, ts, ids_flat, rot=1)

    @jax.jit
    def bound_chain(lt, sm):
        smin = jnp.min(sm, axis=1)
        smax = jnp.max(sm, axis=1)
        ns = (sm - smin[:, None]) / jnp.maximum(
            (smax - smin)[:, None], 1e-12)
        L0 = jnp.maximum(jnp.max(lt, axis=1), 1e-12)
        return 0.7 * ns + 0.3 * lt / L0[:, None]

    sm_fake = jnp.asarray(
        rng.standard_normal((B, n_tiles)).astype(np.float32))
    _time("bound_chain", bound_chain, lex_tile, sm_fake, rot=1)

    from hybridsearch_tpu.ops.hybrid import hybrid_tile_topk

    full = (jnp.asarray(d_ids.astype(np.int32)), jnp.asarray(w))

    def serve(qq):
        return hybrid_tile_topk(qq, docs, imp, enc, 10, 0.7, 0.3, kt=128,
                                p_depth=PD, n_alive=n_docs,
                                full_postings=full)

    _time("full_tile", serve, q, iters=4)


def phase_super():
    """10M clustered serving + quality through the supertile exact-
    resident path (ops/supertile.py), probe rungs 2 and 4."""
    os.environ["HST_BENCH_SUPERHYB"] = "1"
    import importlib

    import benchmarks.bench_hybrid as bh

    importlib.reload(bh)
    n = int(os.environ.get("HST_BENCH_N", "10000000"))
    for sp, batch in (("4", 256), ("2", 256), ("2", 512), ("4", 512)):
        os.environ["HST_BENCH_SP"] = sp
        print(json.dumps({"s_probe": int(sp), **bh.run(n, batch=batch,
                                                       iters=6)}),
              flush=True)
    os.environ["HST_BENCH_SP"] = "2"
    print(json.dumps(bh.jaccard_vs_oracle(n, batch=32)), flush=True)


def phase_super_profile():
    """Stage attribution for the supertile path at 10M: tile-stats sweep,
    supertile bound chain, window gather, one-hot placement — each as its
    own program, rotated inputs, host-fetched reduction."""
    import importlib

    import benchmarks.bench_hybrid as bh

    importlib.reload(bh)
    from hybridsearch_tpu.ops.dense import (
        dense_tile_stats,
        gather_tile_scores,
    )
    from hybridsearch_tpu.ops.supertile import (
        build_super_postings,
        encode_super_queries,
        hybrid_supertile_topk,
        _bisect_runs,
    )

    n_docs, B = int(os.environ.get("HST_BENCH_N", "10000000")), 256
    align = __import__(
        "hybridsearch_tpu.ops.impact", fromlist=["default_align"]
    ).default_align()
    cache = f"/tmp/hst_hybridbench_v2_{n_docs}_a{align}_cl.npz"
    z = np.load(cache)
    topic_of, d_ids, w, df = z["topic_of"], z["d"], z["w"], z["df"]
    vocab = int(z["vocab"])
    t_full = np.repeat(np.arange(vocab, dtype=np.int64), df)
    sp = build_super_postings(t_full, d_ids.astype(np.int64), w, n_docs,
                              vocab)
    # padded-size generation (bench parity): the DMA scores kernel needs
    # N % chunk == 0, and a post-hoc pad would hold two corpus copies
    n_gen = -(-n_docs // 4096) * 4096
    topic_gen = topic_of
    if n_gen != n_docs:
        topic_gen = np.concatenate(
            [topic_of, np.zeros(n_gen - n_docs, topic_of.dtype)])
    docs, cent = bh.build_correlated_corpus(n_gen, topic_gen)
    term_lists, q_topics = bh.correlated_queries(B)
    enc = encode_super_queries(sp, term_lists)
    q = bh.query_vectors(q_topics, cent)
    jax.block_until_ready((sp.sup_max, docs))
    print(f"# wcap={enc.wcap} n_super={sp.n_super}", flush=True)

    @jax.jit
    def _red(out):
        return sum(jnp.sum(x.astype(jnp.float32))
                   for x in jax.tree_util.tree_leaves(out))

    def _time(label, fn, *args, iters=4, rot=0):
        # host-fetch a scalar reduction per iteration: block_until_ready
        # alone now resolves without execution on this tunnel (0.1 ms
        # readings for a 40 ms kernel, 2026-08-17)
        try:
            float(_red(fn(*args)))
            samples = []
            for i in range(iters):
                a = list(args)
                a[rot] = jnp.roll(args[rot], i + 1, axis=0)
                jax.block_until_ready(a[rot])
                t0 = time.perf_counter()
                float(_red(fn(*a)))
                samples.append((time.perf_counter() - t0) * 1e3)
            samples.sort()
            print(f"{label:14s} {samples[len(samples)//2]:8.1f} ms "
                  f"(min {samples[0]:.1f})", flush=True)
        except Exception as e:
            print(f"{label:14s} FAILED {type(e).__name__}: {e}", flush=True)

    from hybridsearch_tpu.ops.pallas_topk import pallas_tile_stats_t

    # the unique-block_n trick only busts dense_tile_stats' cache;
    # pallas_tile_stats_t is its own nested jit and reads
    # HST_TILE_STATS_SUB / HST_PALLAS_SEM at ITS trace time — without
    # this, the sub/sem rows silently re-measure the stale kernel
    _fresh = bh.clear_serving_caches

    jax.block_until_ready(jax.jit(lambda x: (x @ x.T).sum())(q))
    _time("tile_stats", lambda qq: dense_tile_stats(qq, docs, None), q)
    # block-size sensitivity: the pass-1 kernel measured ~3.5x off its
    # bandwidth bound at B=256 with the default 32 tiles/block
    for tpb in (64, 128):
        os.environ["HST_PALLAS_TPB"] = str(tpb)
        _fresh()
        _time(f"tile_stats{tpb}",
              lambda qq: dense_tile_stats(qq, docs, None,
                                          block_n=tpb * 128 * 64), q)
    os.environ.pop("HST_PALLAS_TPB", None)
    # batch-size sensitivity: the k=10 dense sweep hits ~145 TF/s at
    # B=512 vs ~47 TF/s here at B=256
    q512 = jnp.concatenate([q, q[::-1]], axis=0)
    _time("tile_stats512", lambda qq: dense_tile_stats(qq, docs, None),
          q512)
    # grid-dimension semantics: each step writes a disjoint output block,
    # so "parallel" is valid — lets Mosaic overlap step bookkeeping it
    # must serialize under the default "arbitrary" (the 2441-step grid
    # at tpb=32 makes per-step overhead the prime suspect for the
    # 110 ms vs ~10 ms roofline gap)
    os.environ["HST_PALLAS_SEM"] = "parallel"
    _fresh()
    _time("tile_stats_par",
          lambda qq: dense_tile_stats(qq, docs, None, block_n=262147), q)
    os.environ["HST_PALLAS_TPB"] = "128"
    _fresh()
    _time("tile_stats_par128",
          lambda qq: dense_tile_stats(qq, docs, None, block_n=262148), q)
    os.environ.pop("HST_PALLAS_TPB", None)
    os.environ.pop("HST_PALLAS_SEM", None)
    _fresh()
    # sub-chunked kernel body (VMEM headroom for double buffering)
    os.environ["HST_TILE_STATS_SUB"] = "1"
    _fresh()
    _time("tile_stats_sub",
          lambda qq: dense_tile_stats(qq, docs, None, block_n=262145), q)
    _time("tile_stats_sub512",
          lambda qq: dense_tile_stats(qq, docs, None, block_n=262146),
          q512)
    os.environ.pop("HST_TILE_STATS_SUB", None)
    _fresh()
    rng = np.random.default_rng(0)
    sup2 = jnp.asarray(np.sort(
        rng.integers(0, sp.n_super, (B, 2)).astype(np.int32), axis=1))
    tiles2 = (sup2[:, :, None] * 128 + jnp.arange(128, dtype=jnp.int32)[
        None, None, :]).reshape(B, 256)
    _time("gather256t", lambda tt: gather_tile_scores(q, docs, tt, None)[0],
          tiles2, rot=0)
    ids_flat = sp.ids_rows.reshape(-1)
    base2 = (sup2 * sp.super_docs).astype(jnp.int32)
    T = enc.term_ids.shape[1]
    pts = jnp.stack([jnp.broadcast_to(base2[:, None, :], (B, T, 2)),
                     jnp.broadcast_to(base2[:, None, :] + sp.super_docs,
                                      (B, T, 2))], axis=-1
                    ).reshape(B, T, 4)
    f_bis = jax.jit(lambda p, idf, st, ln: _bisect_runs(idf, st, ln,
                                                        p).sum())
    _time("bisect", lambda p: f_bis(p, ids_flat, enc.starts, enc.lens),
          pts, rot=0)

    # placement kernel alone at serving shapes (S=2, wcap windows)
    from hybridsearch_tpu.ops.pallas_supertile import (
        pallas_place_windows,
        pallas_super_scores,
    )

    TE = sum(-(-((wc // 128 + 1) * 128) // 1024) * 1024
             for wc in enc.wcaps)
    l_fake = jnp.asarray(
        rng.integers(-1, 2 * 16384, (512, TE)).astype(np.int32))
    w_fake = jnp.asarray(rng.random((512, TE)).astype(np.float32))

    @jax.jit
    def place_red(l, wv):
        return pallas_place_windows(l, wv, 128, 128, ech=1024).sum()

    _time("place_s2", place_red, l_fake, w_fake)

    @jax.jit
    def scores_red(qq, ss):
        return pallas_super_scores(qq, docs, ss, 16384, ch=1024).sum()

    q_bf = q.astype(docs.dtype)
    _time("dmascores_s2", lambda ss: scores_red(q_bf, ss), sup2, rot=0)

    # gather-fused placement (round 4, ops/pallas_supertile.py
    # pallas_place_fused) vs the two-step staging path at the SAME
    # serving shapes: real build, real encode, random probes
    from hybridsearch_tpu.ops.supertile import (
        _hybrid_super_impl,
        _place_windows,
        _place_windows_fused,
        _resident_windows,
    )

    wcaps = tuple(min(wc, sp.super_docs) for wc in enc.wcaps)

    @jax.jit
    def fused_red(ss):
        lex4, _ovf = _place_windows_fused(
            sp.sup_pos, sp.ids_rows, sp.ws_rows, enc.term_ids, ss,
            sp.super_docs, wcaps, 128)
        return lex4.sum()

    @jax.jit
    def twostep_red(ss):
        l_cat, w_cat, _ovf = _resident_windows(
            sp.sup_pos, sp.ids_rows, sp.ws_rows, enc.term_ids, ss,
            sp.super_docs, wcaps)
        return _place_windows(l_cat, w_cat, 128, use_pallas=True).sum()

    _time("winplace2step", twostep_red, sup2, rot=0)
    _time("winplacefused", fused_red, sup2, rot=0)

    def serve(qq):
        return hybrid_supertile_topk(qq, docs, sp, enc, 10, 0.7, 0.3,
                                     s_probe=2, n_alive=n_docs)

    _time("full_super", serve, q, iters=6)
    _time("full_super2", serve, q, iters=6)
    # env flag is read at trace time: drop the cached trace to A/B it
    os.environ["HST_PLACE_FUSED"] = "1"
    _hybrid_super_impl.clear_cache()
    _time("full_superfus", serve, q, iters=6)
    os.environ.pop("HST_PLACE_FUSED", None)
    _hybrid_super_impl.clear_cache()


def phase_super_ab():
    """Round-4 serving A/B at 10M through bench_hybrid.run: baseline vs
    gather-fused placement (HST_PLACE_FUSED) vs batch probe dedup
    (HST_SCORES_DEDUP) vs both, at SP4 B=256 then B=512. Env flags are
    read at trace time — the impl cache is dropped per variant."""
    os.environ["HST_BENCH_SUPERHYB"] = "1"
    import importlib

    import benchmarks.bench_hybrid as bh

    importlib.reload(bh)

    n = int(os.environ.get("HST_BENCH_N", "10000000"))
    os.environ["HST_BENCH_SP"] = "4"
    # one run() per batch: the internal ab_variants loop reuses the
    # corpus + super structures already on device (flip gates, drop the
    # impl cache, re-warm, re-measure) — a fresh run() per variant paid
    # the multi-minute 10M setup 8x. The saved setup buys the TPB
    # (tiles/block of the pass-1 stats sweep) lever in the same grid.
    ab = dict(bh.AB_VARIANTS)  # ONE grid, shared with bench.py's rider
    # ascending batches, the speculative big-batch row LAST: the stats
    # sweep's HBM term is batch-invariant, so if phase 11 shows it
    # bandwidth-bound, qps keeps scaling with batch — and a late OOM or
    # Mosaic failure can't cost the measured smaller-batch rows
    batches = tuple(int(b) for b in os.environ.get(
        "HST_AB_BATCHES", "256,512,1024").split(","))
    ab_iters = int(os.environ.get("HST_AB_ITERS", "6"))
    rows = []
    for batch in batches:
        bh.clear_serving_caches()
        try:
            res = bh.run(n, batch=batch, iters=ab_iters,
                         ab_variants=dict(ab))
        except Exception as e:
            # a wedge/Mosaic failure on one batch size must not kill
            # the other
            print(f"# b{batch} grid FAILED: {type(e).__name__}: {e}",
                  flush=True)
            continue
        base = {"variant": "base", "batch": batch, "env": {},
                "value": res.get("value"),
                "exact_pct": res.get("exact_pct")}
        rows.append(base)
        print(json.dumps({**base, "metric": res.get("metric")}),
              flush=True)
        for name, v in res.get("variants", {}).items():
            row = {"variant": name, "batch": batch, "env": ab[name],
                   "value": v.get("qps"), "exact_pct": v.get("exact_pct"),
                   **({"error": v["error"]} if "error" in v else {}),
                   **({"skipped": v["skipped"]} if "skipped" in v else {})}
            rows.append(row)
            print(json.dumps(row), flush=True)
        # promote incrementally (cumulative rows): a wedge or the phase
        # timeout on a later batch must not lose the record
        _promote_best_serving(rows, n)
    bh.clear_serving_caches()


def _promote_best_serving(rows, n_docs):
    """Persist the A/B winner so bench.py serves the promoted variant in
    the driver window even with nobody around to flip defaults. Quality
    gate: a candidate may not lose more than 0.5pp of certified-exact
    share vs the measured base rows."""
    scored = [r for r in rows if r.get("value")]
    if not scored:
        return
    # quality gate: within 0.5pp certified-exact of the measured base
    # rows; when every base row failed (wedge mid-grid), fall back to an
    # ABSOLUTE floor so a fast-but-quality-losing variant can't be
    # promoted with no reference to compare against
    base_exact = max((r.get("exact_pct") or 0.0) for r in scored
                     if r["variant"] == "base") if any(
        r["variant"] == "base" for r in scored) else 99.0
    ok = [r for r in scored
          if (r.get("exact_pct") or 0.0) >= base_exact - 0.5]
    if not ok:
        return
    best = max(ok, key=lambda r: r["value"])
    record = {"variant": best["variant"], "batch": best["batch"],
              "env": best["env"], "qps": best["value"],
              "exact_pct": best.get("exact_pct"), "n_docs": n_docs,
              "source": "hw_session phase 12",
              "stamp": time.strftime("%Y-%m-%d %H:%M:%S")}
    path = os.environ.get("HST_SERVING_BEST",
                          "/tmp/hst_serving_best.json")
    # atomic replace: bench.py and the harvester read this file while
    # the grid is still running — a torn write would drop the promotion
    # (and get mirrored into the round's committed evidence)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(record, f)
    os.replace(tmp, path)
    print(json.dumps({"promoted": record}), flush=True)


def phase_configs():
    """Chip rows for the BASELINE configs: the batched 100->20->5 funnel
    with the real (trained) cross-encoder + recompile audit
    (bench_funnel), then run_configs 2-5. Each runs as its OWN
    subprocess so this phase never holds the tunnel itself (single
    client at a time)."""
    import subprocess

    here = os.path.dirname(os.path.abspath(__file__))
    n = os.environ.get("HST_CONFIG_N", "100000")
    for cmd in ([sys.executable, os.path.join(here, "bench_funnel.py")],
                *([sys.executable, os.path.join(here, "run_configs.py"),
                   "--config", c, "--n-docs", n] for c in "2345")):
        rc = subprocess.call(cmd)
        print(f"# {os.path.basename(cmd[1])} {cmd[2:]} rc={rc}",
              flush=True)


PHASES = {"1": phase_rescore, "2": phase_hybrid, "3": phase_dense,
          "4": phase_ivf, "5": phase_profile, "6": phase_ivf10m,
          "7": phase_tile_hybrid, "8": phase_tile_jaccard,
          "9": phase_tile_profile, "10": phase_super,
          "11": phase_super_profile, "12": phase_super_ab,
          "13": phase_configs}


def main():
    want = sys.argv[1:] or ["1", "2"]
    if len(want) > 1:
        # one SUBPROCESS per phase, sequentially (still a single tunnel
        # client at a time): a failed in-process phase leaks device
        # buffers that OOM the next phase's 7.7 GB corpus even after
        # gc.collect()
        import subprocess

        for p in want:
            rc = subprocess.call(
                [sys.executable, os.path.abspath(__file__), p])
            print(f"# phase {p} subprocess rc={rc}", flush=True)
        return
    if want != ["13"]:
        # phase 13 only SPAWNS tunnel clients; initializing the backend
        # here would hold the single-client tunnel and starve them
        backend = jax.default_backend()
        print(f"# backend={backend}", flush=True)
        # HST_HW_ALLOW_CPU=1: CPU dry-run of a phase's control flow at
        # small HST_BENCH_N (with HST_SUPER_INTERPRET=1 the gated Pallas
        # variants execute too) — insurance that a recovery window never
        # burns on a phase-level wiring bug
        assert backend == "tpu" or os.environ.get(
            "HST_HW_ALLOW_CPU") == "1", (
            "tunnel not available — aborting session")
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
