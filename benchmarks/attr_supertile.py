"""Stage attribution for the supertile hybrid serving path (VERDICT r4
ask 3: "re-run stage attribution with memory headroom — the builder is
tuning blind").

Times each stage of ops/supertile._hybrid_super_impl as its OWN
on-device fori_loop program with a chained-checksum carry and a single
final scalar fetch — the round-5 dense-bench protocol. The old phase-11
harness timed stages with one host dispatch per iteration; per-dispatch
tunnel latency here is 50-60 ms and varies by day, which is larger than
several of the stages being attributed. On-device looping amortizes it
below 1% and cannot be elided (every iteration's output feeds the
fetched scalar) or hoisted (inputs roll each iteration).

Stages:
  stats   dense_tile_stats: full-corpus bf16 sweep -> per-tile maxima
  bounds  probe selection: supertile bound fusion + top_k(S) (host of
          step 2-3 in the impl, minus the sweep)
  scores  pallas_super_scores: fused DMA+dot resident semantic scores
  place   resident lexical CSR windows + one-hot placement
  fuse    fusion + candidate top-k + f32 rescore (derived: full - sum)
  full    the whole _hybrid_super_impl

Usage (own process, under /tmp/hst_bench_lock):
  HST_BENCH_SUPERHYB=1 python benchmarks/attr_supertile.py 10000000 1024

Prints one JSON line per (batch, s_probe) row.
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("HST_BENCH_SUPERHYB", "1")

import jax

if os.environ.get("JAX_PLATFORMS") == "cpu":
    # the axon plugin ignores the env var alone in this image — pin it
    jax.config.update("jax_platforms", "cpu")

# the 10M-doc supertile programs take minutes to compile; persist them
jax.config.update("jax_compilation_cache_dir", "/tmp/hst_jax_cache")

import jax.numpy as jnp
import numpy as np

from benchmarks import bench_hybrid as bh
from hybridsearch_tpu.ops.supertile import (
    SuperQueryEnc,
    _hybrid_super_impl,
    _place_windows_fused,
    _resident_windows,
    _place_windows,
    _use_fused_place,
    _use_pallas_place,
    _interpret_kernels,
    build_super_postings,
    encode_super_queries,
    load_super_postings,
    save_super_postings,
)

TOP_K = 10
BLOCK_N = 262144


def setup(n_docs: int, batch: int):
    """Corpus + supertile artifacts + encoded queries, via the same /tmp
    caches the driver bench uses (bench_hybrid.run lines 337-423)."""
    from hybridsearch_tpu.ops.impact import default_align

    align = default_align()
    cache = f"/tmp/hst_hybridbench_v2_{n_docs}_a{align}_cl.npz"
    if os.path.exists(cache):
        z = np.load(cache)
        topic_of, d_ids, w, df = z["topic_of"], z["d"], z["w"], z["df"]
        vocab = int(z["vocab"])
    else:
        topic_of, t_ids, d_ids, w, vocab, df = bh.synth_correlated(
            n_docs, cluster_order=True)
        d_ids = d_ids.astype(np.int32)
        topic_of = topic_of.astype(np.int16)
    n_gen = -(-n_docs // 4096) * 4096
    topic_gen = topic_of
    if n_gen != n_docs:
        topic_gen = np.concatenate(
            [topic_of, np.zeros(n_gen - n_docs, topic_of.dtype)])
    docs, cent = bh.build_correlated_corpus(n_gen, topic_gen)

    sp_cache = cache[:-4] + "_super"
    if os.path.isdir(sp_cache):
        sp = load_super_postings(sp_cache)
    else:
        t_full = np.repeat(np.arange(vocab, dtype=np.int64), df)
        sp = build_super_postings(t_full, d_ids.astype(np.int64), w,
                                  n_docs, vocab)
        save_super_postings(sp, sp_cache)
    term_lists, q_topics = bh.correlated_queries(batch)
    enc = encode_super_queries(sp, term_lists)
    q = bh.query_vectors(q_topics, cent)
    jax.block_until_ready(sp.sup_max)
    return q, docs, sp, enc


def timed(fn, args, iters: int) -> float:
    """ms per iteration of `fn` run as ONE on-device fori_loop program.
    fn(i, *args) -> f32 scalar contribution to the checksum carry."""

    @jax.jit
    def prog(n, *a):
        def body(i, acc):
            return acc + fn(i, *a)
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    float(prog(jnp.int32(1), *args))  # compile + warm (shared executable)
    t0 = time.perf_counter()
    float(prog(jnp.int32(iters), *args))
    return (time.perf_counter() - t0) / iters * 1e3


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    batches = [int(b) for b in (sys.argv[2].split(",") if len(sys.argv) > 2
                                else ["1024"])]
    probes = [int(s) for s in os.environ.get("HST_ATTR_SP", "2,4").split(",")]
    iters = int(os.environ.get("HST_ATTR_ITERS", "8"))
    assert jax.default_backend() in ("tpu", "cpu"), jax.default_backend()

    from hybridsearch_tpu.ops.dense import dense_tile_stats
    from hybridsearch_tpu.ops.pallas_supertile import pallas_super_scores

    for batch in batches:
        q, docs, sp, enc = setup(n_docs, batch)
        N = docs.shape[0]
        sd = sp.super_tiles * 128
        wcaps = tuple(min(w, sp.super_docs) for w in enc.wcaps)
        term_ids = enc.term_ids
        row: dict = {"n_docs": n_docs, "batch": batch, "sd": sd,
                     "backend": jax.default_backend(), "iters": iters}

        # -- stats sweep (probe-count independent) ------------------------
        def f_stats(i, q_, d_):
            qi = jnp.roll(q_, i + 1, axis=0)
            _ts, _mn, mx = dense_tile_stats(qi, d_, None, block_n=BLOCK_N)
            return jnp.sum(mx)

        row["stats_ms"] = round(timed(f_stats, (q, docs), iters), 2)
        print(json.dumps({"partial": True, **row}), flush=True)

        # -- probe-bound selection (steps 2-3 of the impl) -----------------
        # slex row gather + joint bound + top_k(S) over [B, n_super]
        n_super = sp.sup_max.shape[1]
        def f_bounds(i, t_, mx_, ts_):
            ti = jnp.roll(t_, i + 1, axis=0)
            slex = jnp.sum(jnp.take(mx_, ti, axis=0), axis=1)
            ssem = jnp.max(jnp.roll(ts_, i, axis=0), axis=2)
            l0 = jnp.max(slex, axis=1)
            bound0 = 0.7 * ssem + 0.3 * slex / jnp.maximum(l0[:, None],
                                                           1e-12)
            _v, top = jax.lax.top_k(bound0, max(probes))
            return jnp.sum(jnp.sort(top, axis=1).astype(jnp.float32))

        ts_fake = jnp.zeros((batch, n_super, sp.super_tiles), jnp.float32)
        row["bounds_ms"] = round(
            timed(f_bounds, (term_ids, sp.sup_max, ts_fake), iters), 2)
        print(json.dumps({"partial": True, **row}), flush=True)

        for S in probes:
            # fixed representative probe set from the real bound logic:
            # run the impl once and reuse its sup_s (shapes are what
            # matter for DMA/placement cost, not which tiles)
            out, sup_s = _hybrid_super_impl(
                q, docs, sp.sup_max, sp.sup_pos, sp.ids_rows, sp.ws_rows,
                term_ids, jnp.asarray(enc.complete),
                jnp.asarray(enc.full_touched < n_docs),
                jnp.float32(0.7), jnp.float32(0.3), None,
                k=TOP_K, s_probe=S, wcaps=wcaps, norm="minmax",
                block_n=BLOCK_N, super_tiles=sp.super_tiles)
            jax.block_until_ready(out.values)
            sup_s = jax.device_put(sup_s)

            # -- resident semantic scores (fused DMA+dot kernel) ----------
            use_pallas = (_use_pallas_place() and N % 1024 == 0
                          and q.shape[1] % 128 == 0 and sd % 1024 == 0)
            if use_pallas:
                def f_scores(i, q_, d_, s_):
                    qi = jnp.roll(q_, i + 1, axis=0)
                    q3 = qi.astype(d_.dtype) if d_.dtype == jnp.bfloat16 \
                        else qi
                    sv = pallas_super_scores(
                        q3, d_, jnp.roll(s_, i, axis=0), sd, ch=1024,
                        interpret=_interpret_kernels())
                    return jnp.sum(jnp.where(jnp.isfinite(sv), sv, 0.0))

                row[f"scores_ms_sp{S}"] = round(
                    timed(f_scores, (q, docs, sup_s), iters), 2)

            # -- resident lexical placement -------------------------------
            # CSR tables (sup_pos/ids_rows/ws_rows, corpus-sized) MUST be
            # traced arguments: closure-captured they lower as stablehlo
            # dense constants, and the multi-GB compile request breaks the
            # remote-compile tunnel (observed: Broken pipe at this exact
            # program, 2026-08-19).
            if _use_fused_place():
                def f_place(i, t_, s_, pos_, ids_, ws_):
                    lex4, _ovf = _place_windows_fused(
                        pos_, ids_, ws_,
                        jnp.roll(t_, i + 1, axis=0),
                        jnp.roll(s_, i, axis=0), sd, wcaps,
                        sp.super_tiles)
                    return jnp.sum(lex4)
            else:
                def f_place(i, t_, s_, pos_, ids_, ws_):
                    l_cat, w_cat, _ovf = _resident_windows(
                        pos_, ids_, ws_,
                        jnp.roll(t_, i + 1, axis=0),
                        jnp.roll(s_, i, axis=0), sd, wcaps)
                    lex4 = _place_windows(l_cat, w_cat, sp.super_tiles,
                                          use_pallas=_use_pallas_place())
                    return jnp.sum(lex4)

            row[f"place_ms_sp{S}"] = round(
                timed(f_place,
                      (term_ids, sup_s, sp.sup_pos, sp.ids_rows,
                       sp.ws_rows), iters), 2)

            # -- CSR window gather alone (splits place into gather+one-hot)
            if not _use_fused_place():
                def f_windows(i, t_, s_, pos_, ids_, ws_):
                    l_cat, w_cat, _ovf = _resident_windows(
                        pos_, ids_, ws_,
                        jnp.roll(t_, i + 1, axis=0),
                        jnp.roll(s_, i, axis=0), sd, wcaps)
                    return (jnp.sum(w_cat)
                            + jnp.sum(l_cat.astype(jnp.float32)) * 1e-9)

                row[f"windows_ms_sp{S}"] = round(
                    timed(f_windows,
                          (term_ids, sup_s, sp.sup_pos, sp.ids_rows,
                           sp.ws_rows), iters), 2)
                print(json.dumps({"partial": True, **row}), flush=True)

            # -- full path -------------------------------------------------
            def f_full(i, q_, d_, t_, mx_, pos_, ids_, ws_):
                qi = jnp.roll(q_, i + 1, axis=0)
                o, _ = _hybrid_super_impl(
                    qi, d_, mx_, pos_, ids_,
                    ws_, jnp.roll(t_, i + 1, axis=0),
                    jnp.asarray(enc.complete),
                    jnp.asarray(enc.full_touched < n_docs),
                    jnp.float32(0.7), jnp.float32(0.3), None,
                    k=TOP_K, s_probe=S, wcaps=wcaps, norm="minmax",
                    block_n=BLOCK_N, super_tiles=sp.super_tiles)
                return jnp.sum(jnp.where(jnp.isfinite(o.values),
                                         o.values, 0.0))

            full_ms = timed(f_full,
                            (q, docs, term_ids, sp.sup_max, sp.sup_pos,
                             sp.ids_rows, sp.ws_rows), iters)
            row[f"full_ms_sp{S}"] = round(full_ms, 2)
            known = (row["stats_ms"]
                     + row.get("bounds_ms", 0.0)
                     + row.get(f"scores_ms_sp{S}", 0.0)
                     + row[f"place_ms_sp{S}"])
            row[f"rest_ms_sp{S}"] = round(full_ms - known, 2)
            row[f"qps_sp{S}"] = round(batch / full_ms * 1e3, 1)
            print(json.dumps({"partial": True, **row}), flush=True)

        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
