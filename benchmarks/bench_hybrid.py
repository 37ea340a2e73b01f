"""Full hybrid benchmark at corpus scale on one chip.

Measures the engine's at-scale serving hot paths over the same synthetic
corpus/query generator:
  HST_BENCH_SUPERHYB=1 (bench.py default) — the supertile exact-resident
    hybrid (ops/supertile.py): one stats sweep, table-driven bounds,
    every probed-supertile resident scored exactly, per-query exactness
    certificate. The path Searcher.search_batch takes on clustered
    corpora >= 200k docs.
  HST_BENCH_TILEHYB=1 — the v1 tile-resident path (ops/hybrid.py
    hybrid_tile_topk).
  default-off both — the impact-pruned union path (hybrid_impact_topk):
    dense sweep + impact-run prefix candidates + sort-merge rescore +
    margin correction; serves unclustered layouts.
All are TPU-native equivalents of the reference's whole Searcher.search
(reference core.py:199-271: semantic + lexical arms, min-max normalize,
weighted fusion, top-k), which the round-1 headline bench only
half-covered (dense arm alone; VERDICT.md round-1 weak #1).

The lexical corpus is synthetic but structurally realistic: term document
frequencies follow a Zipf law over a 50k vocabulary, per-(term, doc)
weights are exponential like eager BM25 weights, and queries mix
mid-frequency informative terms (the post-stopword regime the reference's
extractor produces, reference extractor.py:6-31) with occasional
stopword-grade hot terms. Pruned-vs-exact top-10 quality (Jaccard) for
this generator is measured against a NumPy full-fusion oracle at a
host-feasible corpus size via --jaccard (and pinned by
tests/test_ops_impact.py at small N).

Run directly for a one-line JSON report, or via bench.py.
"""

from __future__ import annotations

import json
import os
import time
from typing import List, Tuple

import numpy as np

D = 384
TOP_K = 10
TARGET_QPS = 10_000.0
# (k_dense, c_per_term, p_depth) rung — env-overridable for sweeps. The
# default p_depth=1024 is deeper than searcher rung 0 (256): the margin
# correction makes hot-term scores exact either way, and --jaccard
# verifies quality at whatever rung is set.
KD = int(os.environ.get("HST_BENCH_KD", "512"))
CP = int(os.environ.get("HST_BENCH_CP", "64"))
PD = int(os.environ.get("HST_BENCH_PD", "1024"))
P_MAX = 4096
# topic count scales docs-per-topic: 1024 topics at 10M docs means ~9.8k
# docs/topic — overriding this lets a small corpus reproduce the large-
# corpus regime (same docs/topic, same per-term df) on the CPU backend
TOPICS = int(os.environ.get("HST_BENCH_TOPICS", "1024"))


def synth_postings(
    n_docs: int,
    vocab_size: int = 50_000,
    avg_postings_per_doc: int = 12,
    seed: int = 3,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """(term_ids, doc_ids, weights, df) in term-major doc-sorted order.

    df follows Zipf (df_r ~ 1/r, capped at n_docs/4). Doc ids within each
    term run are generated ALREADY sorted via cumsum of exponential gaps —
    O(P) vectorized with no global sort, which matters on this 1-core host.
    """
    rng = np.random.default_rng(seed)
    total = n_docs * avg_postings_per_doc
    ranks = np.arange(1, vocab_size + 1, dtype=np.float64)
    df = total * (1.0 / ranks) / np.log(vocab_size + 1)
    df = np.minimum(df, n_docs // 4).astype(np.int64)
    df = np.maximum(df, 1)
    nnz = int(df.sum())

    term_ids = np.repeat(np.arange(vocab_size, dtype=np.int64), df)
    # sorted-within-run doc ids: normalized cumsum of Exp(1) gaps per run
    gaps = rng.exponential(1.0, nnz).astype(np.float64) + 1e-9
    cum = np.cumsum(gaps)
    starts = np.concatenate([[0], np.cumsum(df)])[:-1]
    run_base = cum[starts] - gaps[starts]  # cumsum value before each run
    rel = cum - np.repeat(run_base, df)  # per-run ascending positions
    run_total = np.repeat(rel[np.cumsum(df) - 1], df)
    doc_ids = np.floor(rel / (run_total + 1e-9) * (n_docs - 1)).astype(np.int64)
    # IDF-scaled weights (reference bm25.py:81): common terms score small
    idf = np.log((n_docs - df + 0.5) / (df + 0.5) + 1.0).astype(np.float32)
    sat = (rng.exponential(0.6, nnz) + 0.4).astype(np.float32)
    weights = idf[term_ids] * np.minimum(sat, 2.5)
    return term_ids, doc_ids, weights, df


def synth_correlated(
    n_docs: int,
    n_topics: int = 1024,
    terms_per_topic: int = 32,
    topic_postings_per_doc: int = 6,
    bg_postings_per_doc: int = 6,
    bg_vocab: int = 16_384,
    seed: int = 3,
    cluster_order: bool = False,
):
    """Topic-clustered corpus where the dense and lexical arms CORRELATE —
    the structure real retrieval corpora have (and the reason hybrid
    fusion works at all). Mirrors run_configs.py's planted-topic design at
    corpus scale, fully vectorized.

    Returns (topic_of_doc, term_ids, doc_ids, weights, vocab_size, df).
    Vocabulary layout: [0, n_topics*terms_per_topic) are topic-owned terms;
    the rest are Zipf background terms (stopword-grade head included).
    """
    rng = np.random.default_rng(seed)
    topic_of = rng.integers(0, n_topics, n_docs)
    if cluster_order:
        # clustered storage layout (Indexer layout="clustered"): docs
        # ordered by semantic cluster, so each query's top docs share few
        # 128-doc tiles and the kd_tiles probe budget covers
        topic_of = np.sort(topic_of)
    # topic postings: each doc draws terms from its topic's block
    tp = topic_postings_per_doc
    t_topic = (topic_of[:, None] * terms_per_topic
               + rng.integers(0, terms_per_topic, (n_docs, tp))
               ).reshape(-1).astype(np.int64)
    d_topic = np.repeat(np.arange(n_docs, dtype=np.int64), tp)
    # background postings: Zipf over the background block
    bp = bg_postings_per_doc
    base = n_topics * terms_per_topic
    u = rng.random(n_docs * bp)
    ranks = np.minimum((bg_vocab ** u).astype(np.int64), bg_vocab - 1)
    t_bg = base + ranks
    d_bg = np.repeat(np.arange(n_docs, dtype=np.int64), bp)
    t = np.concatenate([t_topic, t_bg])
    d = np.concatenate([d_topic, d_bg])
    # dedup (term, doc) pairs, summing implied tf into a single weight
    key = t * n_docs + d
    key, uniq_idx = np.unique(key, return_index=True)
    t, d = t[uniq_idx], d[uniq_idx]
    vocab_size = base + bg_vocab
    df = np.bincount(t, minlength=vocab_size).astype(np.int64)
    # eager BM25 weights = IDF x tf-saturation: common terms carry small
    # weights (reference bm25.py:81 smoothed IDF), exactly why impact
    # pruning loses little mass on stopword-grade terms
    idf = np.log((n_docs - df + 0.5) / (df + 0.5) + 1.0).astype(np.float32)
    sat = (rng.exponential(0.6, len(t)) + 0.4).astype(np.float32)
    w = idf[t] * np.minimum(sat, 2.5)
    return topic_of, t, d, w, vocab_size, df


def correlated_queries(
    batch: int,
    n_topics: int = 1024,
    terms_per_topic: int = 32,
    bg_vocab: int = 16_384,
    seed: int = 11,
):
    """(term_lists, query_topic): 3-5 topic terms + 0-2 background terms."""
    rng = np.random.default_rng(seed)
    base = n_topics * terms_per_topic
    term_lists, q_topics = [], []
    for _ in range(batch):
        z = int(rng.integers(0, n_topics))
        k = int(rng.integers(3, 6))
        terms = (z * terms_per_topic
                 + rng.choice(terms_per_topic, k, replace=False)).tolist()
        for _ in range(int(rng.integers(0, 3))):
            u = rng.random()
            terms.append(int(base + min(int(bg_vocab ** u), bg_vocab - 1)))
        term_lists.append(terms)
        q_topics.append(z)
    return term_lists, np.asarray(q_topics)


def build_correlated_corpus(n_docs: int, topic_of: np.ndarray,
                            n_topics: int = 1024, seed: int = 0,
                            sigma: float = 0.08):
    """[n_docs, D] bf16 normalized doc vectors clustered by topic,
    generated on device chunk by chunk, plus the [n_topics, D] centroids.

    sigma is per-dimension noise; cos(doc, centroid) ~= 1/sqrt(1+sigma^2*D)
    — the default (sigma^2*D ~= 1) gives in-topic pair cosines ~0.5, the
    regime real sentence embeddings live in; defaults put queries near
    topic boundaries so approximate methods have a real recall curve."""
    import functools

    import jax
    import jax.numpy as jnp

    @functools.partial(jax.jit, static_argnames=("n", "chunk", "sig"))
    def _gen(key, z_all, n, chunk, sig):
        """Whole clustered corpus in ONE compiled program (one dispatch:
        the per-chunk Python loop paid ~11 s of tunnel round trip per
        chunk in this environment)."""
        ck, body_key = jax.random.split(key)
        cent = jax.random.normal(ck, (n_topics, D), dtype=jnp.float32)
        cent = cent / jnp.linalg.norm(cent, axis=-1, keepdims=True)

        def body(i, buf):
            sub = jax.random.fold_in(body_key, i)
            zc = jax.lax.dynamic_slice(z_all, (i * chunk,), (chunk,))
            x = cent[zc] + sig * jax.random.normal(
                sub, (chunk, D), dtype=jnp.float32)
            x = x / jnp.maximum(
                jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12)
            return jax.lax.dynamic_update_slice(
                buf, x.astype(jnp.bfloat16), (i * chunk, 0))

        nb = n // chunk
        return jax.lax.fori_loop(
            0, nb, body, jnp.zeros((n, D), jnp.bfloat16)), cent

    chunk = min(1_000_000, n_docs)
    nb = -(-n_docs // chunk)
    z_np = np.zeros(nb * chunk, np.int32)
    z_np[:n_docs] = topic_of.astype(np.int32)
    buf, cent = _gen(jax.random.PRNGKey(seed), jnp.asarray(z_np),
                     nb * chunk, chunk, float(sigma))
    if nb * chunk != n_docs:
        buf = buf[:n_docs]
    jax.block_until_ready(buf)
    return buf, cent


def query_vectors(q_topics: np.ndarray, cent, seed: int = 7,
                  sigma: float = 0.09):
    import jax
    import jax.numpy as jnp

    k = jax.random.PRNGKey(seed)
    z = jnp.asarray(q_topics.astype(np.int32))
    q = cent[z] + sigma * jax.random.normal(k, (len(q_topics), D),
                                            dtype=jnp.float32)
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def synth_queries(
    batch: int, df: np.ndarray, hot_frac: float = 0.2, seed: int = 11
) -> List[List[int]]:
    """Per-query term-id lists: 4-8 mid-frequency terms (df in [64, 65536]),
    plus one hot term (df > 65536) on `hot_frac` of queries."""
    rng = np.random.default_rng(seed)
    mid = np.flatnonzero((df >= 64) & (df <= 65_536))
    hot = np.flatnonzero(df > 65_536)
    out: List[List[int]] = []
    for i in range(batch):
        n_terms = int(rng.integers(4, 9))
        # log-uniform over the mid-frequency band (short-head skew, like
        # real query-term df distributions)
        pos = (np.exp(rng.uniform(0, np.log(len(mid)), n_terms)) - 1).astype(int)
        terms = mid[np.clip(pos, 0, len(mid) - 1)].tolist()
        if len(hot) and rng.random() < hot_frac:
            terms.append(int(hot[rng.integers(0, len(hot))]))
        out.append(terms)
    return out


# The gated serving-lever grid. ONE definition: hw_session phase 12's
# promotion record env is replayed verbatim by bench.py's consumer, so a
# lever added to only one of the two grids would silently diverge the
# evidence between the driver rider and the hardware queue.
AB_VARIANTS = {
    "fusedplace": {"HST_PLACE_FUSED": "1"},
    "dedup": {"HST_SCORES_DEDUP": "1"},
    "both": {"HST_PLACE_FUSED": "1", "HST_SCORES_DEDUP": "1"},
    # sweep pipelining lever: sub-chunked dot+reduce frees VMEM headroom
    # so Mosaic can double-buffer the doc-block DMA (the pass-1 stats
    # sweep is the serving path's dominant cost — ROADMAP lever 1).
    # Including it here (not just phase 11's attribution) lets phase 12
    # PROMOTE it into the served configuration when it wins end-to-end.
    "sub": {"HST_TILE_STATS_SUB": "1"},
    "tpb64": {"HST_PALLAS_TPB": "64"},
    "both_tpb64": {"HST_PLACE_FUSED": "1", "HST_SCORES_DEDUP": "1",
                   "HST_PALLAS_TPB": "64"},
    "all4": {"HST_PLACE_FUSED": "1", "HST_SCORES_DEDUP": "1",
             "HST_PALLAS_TPB": "64", "HST_TILE_STATS_SUB": "1"},
    # MXU group dot inside the dedup kernel for uniform 8-pair groups
    # (ops/pallas_supertile.py) — targets the resident pass's VPU
    # compute term, which scales linearly with batch size.
    "dedup_mxu": {"HST_SCORES_DEDUP": "1", "HST_DEDUP_MXU": "1"},
    "all5": {"HST_PLACE_FUSED": "1", "HST_SCORES_DEDUP": "1",
             "HST_PALLAS_TPB": "64", "HST_TILE_STATS_SUB": "1",
             "HST_DEDUP_MXU": "1"},
}


def clear_serving_caches() -> None:
    """Drop every jit cache on the supertile serving path whose trace
    bakes in an env gate. The outer program AND its nested jits: the
    gates (HST_PLACE_FUSED / HST_SCORES_DEDUP) are read when
    _hybrid_super_impl traces, while HST_PALLAS_TPB / HST_TILE_STATS_SUB
    / HST_PALLAS_SEM are read when dense_tile_stats /
    pallas_tile_stats_t trace — clearing only the outer cache silently
    reuses the inner kernel."""
    from hybridsearch_tpu.ops.dense import dense_tile_stats
    from hybridsearch_tpu.ops.pallas_supertile import (
        pallas_super_scores_dedup,
    )
    from hybridsearch_tpu.ops.pallas_topk import pallas_tile_stats_t
    from hybridsearch_tpu.ops.supertile import _hybrid_super_impl

    _hybrid_super_impl.clear_cache()
    dense_tile_stats.clear_cache()
    pallas_tile_stats_t.clear_cache()
    # HST_DEDUP_MXU is read when pallas_super_scores_dedup traces
    pallas_super_scores_dedup.clear_cache()


def run(n_docs: int, batch: int, iters: int,
        ab_variants: dict | None = None,
        deadline: float | None = None) -> dict:
    import jax
    import jax.numpy as jnp

    from hybridsearch_tpu.ops.hybrid import hybrid_impact_topk
    from hybridsearch_tpu.ops.impact import (
        build_impact_postings,
        encode_impact_queries,
    )

    # the host-side synth + impact build at 10M costs minutes; cache to
    # /tmp so repeated runs (and bench.py's alarm-bounded rider) are fast.
    # v2 format: term ids are NOT stored (starts_full = cumsum(df) suffices
    # for the doc-sorted CSR), doc ids are int32, topic_of is int16 —
    # roughly half the bytes of v1, which on this 1-core host halves the
    # dominant setup cost (np.load of the COO arrays).
    from hybridsearch_tpu.ops.impact import default_align

    align = default_align()
    cluster = os.environ.get("HST_BENCH_CLUSTER", "1") != "0"
    # the tile budget pays off when clusters are larger than k_dense
    # (top-K' concentrates in the query topic's contiguous tiles) — at
    # small corpora the dense candidate tail spreads over generic tiles
    # and coverage cannot close
    default_kt = "128" if cluster and n_docs >= 1_000_000 else "0"
    kd_tiles = int(os.environ.get("HST_BENCH_KD_TILES", default_kt)) or None
    cache = (f"/tmp/hst_hybridbench_v2_{n_docs}_a{align}"
             + ("_cl" if cluster else "") + ".npz")
    t0 = time.time()
    tilehyb = os.environ.get("HST_BENCH_TILEHYB") == "1"
    superhyb = os.environ.get("HST_BENCH_SUPERHYB") == "1"
    if os.path.exists(cache):
        z = np.load(cache)
        topic_of, d_ids, w, df = z["topic_of"], z["d"], z["w"], z["df"]
        vocab = int(z["vocab"])
        from hybridsearch_tpu.ops.impact import ImpactPostings

        # the supertile path never touches the impact tier — keep its
        # ~1 GB of device arrays off the chip (the 10M corpus + super
        # structures need the headroom)
        imp = None if superhyb else ImpactPostings(
            doc_ids=jnp.asarray(z["imp_ids"]),
            weights=jnp.asarray(z["imp_ws"]),
            n_docs=n_docs, p_max=P_MAX, starts_host=z["imp_starts"],
            lengths_host=z["imp_lens"], slack_host=z["imp_slack"],
            weights_host=z["imp_wh"], df_host=z["df"].astype(np.int64),
            align=align,
        )
    else:
        topic_of, t_ids, d_ids, w, vocab, df = synth_correlated(
            n_docs, cluster_order=cluster)
        imp = build_impact_postings(t_ids, d_ids, w, n_docs, vocab,
                                    p_max=P_MAX, align=align)
        d_ids = d_ids.astype(np.int32)
        topic_of = topic_of.astype(np.int16)
        np.savez(cache, topic_of=topic_of, d=d_ids, w=w, df=df,
                 vocab=vocab, imp_ids=np.asarray(imp.doc_ids),
                 imp_ws=np.asarray(imp.weights),
                 imp_starts=imp.starts_host, imp_lens=imp.lengths_host,
                 imp_slack=imp.slack_host, imp_wh=imp.weights_host)
        if superhyb:
            imp = None
    # zero-postings ghost rows pad the corpus to a 4096 multiple for the
    # supertile path: the fused DMA scores kernel needs N % chunk == 0
    # (engine capacity rounding guarantees it; the bench corpus is
    # exactly n_docs). Generated at padded size — a post-hoc jnp.pad
    # would transiently hold TWO 7.7 GB corpus copies and OOM the chip.
    n_gen = -(-n_docs // 4096) * 4096 if superhyb else n_docs
    topic_gen = topic_of
    if n_gen != n_docs:
        topic_gen = np.concatenate(
            [topic_of, np.zeros(n_gen - n_docs, topic_of.dtype)])
    docs, cent = build_correlated_corpus(n_gen, topic_gen)
    if imp is not None:
        jax.block_until_ready(imp.weights)
    build_s = time.time() - t0
    # full doc-sorted CSR (generator emits term-major doc-sorted COO) for
    # the hot-term margin correction
    starts_full = np.concatenate([[0], np.cumsum(df)])[:-1]
    full = None if superhyb else (jnp.asarray(d_ids.astype(np.int32)),
                                  jnp.asarray(w))

    term_lists, q_topics = correlated_queries(batch)
    enc = None if superhyb else encode_impact_queries(
        imp, term_lists, p_depth=PD,
        full_starts=starts_full, full_lengths=df)
    q = query_vectors(q_topics, cent)

    KT = int(os.environ.get("HST_BENCH_KT", "128"))
    if superhyb:
        # scatter-free exact-resident supertile path (ops/supertile.py)
        from hybridsearch_tpu.ops.supertile import (
            build_super_postings,
            encode_super_queries,
            hybrid_supertile_topk,
            load_super_postings,
            save_super_postings,
        )

        t1 = time.time()
        sp_cache = cache[:-4] + "_super"
        sp_cached = os.path.isdir(sp_cache)
        if sp_cached:
            # persisted artifacts: mmap .npy -> device upload, no host
            # rebuild (the 10M build is ~1 GB of reduceats + copies)
            sp = load_super_postings(sp_cache)
        else:
            t_full = np.repeat(np.arange(vocab, dtype=np.int64), df)
            sp = build_super_postings(t_full, d_ids.astype(np.int64), w,
                                      n_docs, vocab)
            save_super_postings(sp, sp_cache)
        enc_s = encode_super_queries(sp, term_lists)
        jax.block_until_ready(sp.sup_max)
        super_s = time.time() - t1
        print(f"# super structures ready in {super_s:.1f}s "
              f"(cached={sp_cached})", flush=True)
        SP = int(os.environ.get("HST_BENCH_SP", "2"))

        def serve_once(qq):
            return hybrid_supertile_topk(qq, docs, sp, enc_s, TOP_K, 0.7,
                                         0.3, s_probe=SP, n_alive=n_docs)

        def serve_warm(qq):
            return hybrid_supertile_topk(qq, docs, sp, enc_s, TOP_K + 1,
                                         0.7, 0.3, s_probe=SP,
                                         n_alive=n_docs)
    elif tilehyb:
        from hybridsearch_tpu.ops.hybrid import hybrid_tile_topk

        def serve_once(qq):
            return hybrid_tile_topk(qq, docs, imp, enc, TOP_K, 0.7, 0.3,
                                    kt=KT, p_depth=PD, n_alive=n_docs,
                                    full_postings=full)

        def serve_warm(qq):
            return hybrid_tile_topk(qq, docs, imp, enc, TOP_K + 1, 0.7,
                                    0.3, kt=KT, p_depth=PD,
                                    n_alive=n_docs, full_postings=full)
    else:
        def serve_once(qq):
            return hybrid_impact_topk(
                qq, docs, imp, enc, TOP_K, 0.7, 0.3,
                k_dense=KD, c_per_term=CP, p_depth=PD, n_alive=n_docs,
                full_postings=full, kd_tiles=kd_tiles,
            )

        def serve_warm(qq):
            return hybrid_impact_topk(
                qq, docs, imp, enc, TOP_K + 1, 0.7, 0.3,
                k_dense=KD, c_per_term=CP, p_depth=PD, n_alive=n_docs,
                full_postings=full, kd_tiles=kd_tiles,
            )

    # Throwaway FIRST compile: the first hybrid executable compiled in a
    # process persistently runs ~3x slower on this environment's tunnel
    # (observed across processes: first-compiled config ~440 ms/batch
    # forever, later-compiled configs 125-205 ms at identical settings —
    # allocation-order effect). Compile-and-run a k+1 variant first so the
    # measured executable is not the first.
    warm = serve_warm(q)
    jax.block_until_ready(warm.values)

    res = serve_once(q)  # warmup/compile
    jax.block_until_ready(res.values)
    # exactness from MATCHED (query, encoding) pairs: the rolled
    # throughput iterations below permute q against a fixed enc, so
    # their exact flags measure a mismatch artifact, not the engine
    exact = np.asarray(jax.device_get(res.exact))
    # throughput: pipeline the batches (block once at the end), but rotate
    # queries each iteration — the device tunnel caches identical
    # dispatches, which would otherwise report fantasy QPS. Two measured
    # loops, second reported: the first loop's pass through all buffers
    # can include placement warm-up effects on this tunnel (round-2: a
    # full second run measured ~2x the first); both numbers are emitted.
    # an on-device checksum chained across iterations forces EVERY
    # dispatch to execute (the tunnel has elided un-fetched dispatches —
    # block_until_ready alone resolved without execution, 2026-08-17)
    _acc = jax.jit(lambda a, v: a + jnp.sum(v))

    def _host_measure_loops(tag: int) -> list:
        out = []
        for loop in range(2):
            acc = jnp.float32(0)
            t0l = time.perf_counter()
            for i in range(iters):
                res_l = serve_once(
                    jnp.roll(q, tag * 100 + loop * iters + i + 1, axis=0))
                acc = _acc(acc, res_l.values)
            float(acc)
            dt = time.perf_counter() - t0l
            out.append(batch * iters / dt)
        return out

    def _ondev_prog():
        """The whole measurement loop as ONE device program (round-5 dense
        protocol, bench.py measure()): a fori_loop over rolled inputs with
        a chained-checksum carry and a single final scalar fetch. The host
        loop above pays this environment's 50-60 ms per-dispatch tunnel
        latency every iteration — at B=1024 that overhead alone is ~40% of
        the measured time and varies by day (the 6,615-vs-18,922 dense
        swing, VERDICT r4). Rebuilt per A/B variant: the impl reads its
        env gates at trace time."""
        from hybridsearch_tpu.ops.supertile import _hybrid_super_impl

        wcaps = tuple(min(w_, sp.super_docs) for w_ in enc_s.wcaps)
        complete = jnp.asarray(enc_s.complete)
        lmz = jnp.asarray(enc_s.full_touched < n_docs)

        # corpus-sized operands (docs + CSR tables) MUST be traced
        # arguments: closure captures lower as stablehlo dense constants
        # and the multi-GB remote-compile request draws HTTP 413 /
        # Broken pipe from the tunnel (same fix as bench.py's dense
        # measure and attr_supertile, 2026-08-19)
        @jax.jit
        def prog(n, base, qq, tt, docs_, mx_, pos_, ids_, ws_):
            def body(i, acc):
                o, _ = _hybrid_super_impl(
                    jnp.roll(qq, base + i + 1, axis=0), docs_, mx_,
                    pos_, ids_, ws_,
                    jnp.roll(tt, base + i + 1, axis=0), complete, lmz,
                    jnp.float32(0.7), jnp.float32(0.3), None,
                    k=TOP_K, s_probe=SP, wcaps=wcaps, norm="minmax",
                    block_n=262144, super_tiles=sp.super_tiles)
                return acc + jnp.sum(jnp.where(jnp.isfinite(o.values),
                                               o.values, jnp.float32(0)))
            return jax.lax.fori_loop(0, n, body, jnp.float32(0))

        def run_prog(n, base):
            return prog(jnp.int32(n), jnp.int32(base), q, enc_s.term_ids,
                        docs, sp.sup_max, sp.sup_pos, sp.ids_rows,
                        sp.ws_rows)

        return run_prog

    if superhyb:
        prog = _ondev_prog()

        def _measure_loops(tag: int) -> list:
            nonlocal prog
            if tag:  # A/B variant: env gates changed — retrace
                prog = _ondev_prog()
            float(prog(1, tag * 100))  # compile + warm
            out = []
            for loop in range(2):
                t0l = time.perf_counter()
                float(prog(iters, tag * 100 + loop * iters))
                dt = time.perf_counter() - t0l
                out.append(batch * iters / dt)
            return out
    else:
        _measure_loops = _host_measure_loops

    ladder_info: dict = {}
    if superhyb and os.environ.get("HST_BENCH_LADDER", "0") == "1":
        # measure the ACTUAL serving path (retrieval/searcher.py
        # supertile_ladder): one rung-invariant prefix, then compacted
        # escalation of the uncertified tail — host round trips and the
        # per-rung exact fetch included. The fixed-SP loops above answer
        # "what does one rung cost"; this answers "what does serving a
        # batch cost at full certification effort".
        from hybridsearch_tpu.retrieval.searcher import supertile_ladder

        def _roll_enc(off):
            return enc_s._replace(
                term_ids=jnp.roll(enc_s.term_ids, off, axis=0),
                starts=jnp.roll(enc_s.starts, off, axis=0),
                lens=jnp.roll(enc_s.lens, off, axis=0),
                complete=np.roll(enc_s.complete, off, axis=0),
                full_touched=np.roll(enc_s.full_touched, off, axis=0),
            )

        def _ladder_measure_loops(tag: int) -> list:
            out = []
            for loop in range(2):
                rungs_tot = 0
                exact_acc = 0.0
                t0l = time.perf_counter()
                for i in range(iters):
                    off = tag * 100 + loop * iters + i + 1
                    st_l, rungs = supertile_ladder(
                        jnp.roll(q, off, axis=0), docs, sp,
                        _roll_enc(off), TOP_K, 0.7, 0.3,
                        n_alive=n_docs, valid_n=n_docs)
                    rungs_tot += rungs
                    exact_acc += float(st_l.exact.mean())
                dt = time.perf_counter() - t0l
                out.append(batch * iters / dt)
                ladder_info["ladder_rungs_mean"] = round(
                    rungs_tot / iters, 2)
                ladder_info["ladder_exact_pct"] = round(
                    100.0 * exact_acc / iters, 2)
            return out

        _measure_loops = _ladder_measure_loops

    qps_loops = _measure_loops(0)
    qps = qps_loops[-1]

    # optional in-session A/B of the gated serving variants: reuses the
    # corpus + super structures already on device, flips the env gates,
    # drops the impl cache so the gates re-trace, re-warms, re-measures.
    # Used by bench.py's autonomous rider (and hw_session phase 12 runs
    # the same grid across processes).
    variants: dict = {}
    if superhyb and ab_variants:
        _drop_impl_caches = clear_serving_caches

        for vi, (name, env) in enumerate(ab_variants.items(), start=1):
            if deadline is not None and time.time() > deadline:
                variants[name] = {"skipped": "deadline"}
                continue
            try:
                for k_, v_ in env.items():
                    os.environ[k_] = v_
                _drop_impl_caches()
                wv = serve_warm(q)
                jax.block_until_ready(wv.values)
                rv = serve_once(q)
                jax.block_until_ready(rv.values)
                v_exact = np.asarray(jax.device_get(rv.exact))
                v_loops = _measure_loops(vi)
                variants[name] = {
                    "qps": round(v_loops[-1], 2),
                    "qps_loop1": round(v_loops[0], 2),
                    "exact_pct": round(100.0 * float(v_exact.mean()), 2),
                }
            except BaseException as e:  # noqa: BLE001 — alarm/Mosaic fail
                variants[name] = {"error": f"{type(e).__name__}: {e}"}
            finally:
                for k_ in env:
                    os.environ.pop(k_, None)
        _drop_impl_caches()

    return {
        **({"variants": variants} if variants else {}),
        **ladder_info,
        "metric": (f"hybrid_impact_qps@{n_docs}docs_{D}d_k{TOP_K}_b{batch}"
                   + ("_super" if superhyb else "")
                   + ("_tile" if tilehyb and not superhyb else "")
                   + ("_clustered" if cluster else "")),
        "value": round(qps, 2),
        "unit": "qps/chip",
        "vs_baseline": round(qps / TARGET_QPS, 4),
        "exact_pct": round(100.0 * float(exact.mean()), 2),
        "impact_build_s": round(build_s, 1),
        "super_setup_s": round(super_s, 1) if superhyb else None,
        "qps_loop1": round(qps_loops[0], 2),
    }


def prebuild(n_docs: int) -> dict:
    """Build + persist the HOST-side bench artifacts — the v2 COO npz
    and the supertile directory — without touching the device, so the
    driver's bench window loads and measures instead of rebuilding
    (VERDICT r3 missing #3). Safe to run on the CPU backend while the
    tunnel is down; run() finds the caches and skips every build step."""
    from hybridsearch_tpu.ops.impact import default_align

    align = default_align()
    cache = f"/tmp/hst_hybridbench_v2_{n_docs}_a{align}_cl.npz"
    t0 = time.time()
    if os.path.exists(cache):
        z = np.load(cache)
        topic_of, d_ids, w, df = z["topic_of"], z["d"], z["w"], z["df"]
        vocab = int(z["vocab"])
    else:
        from hybridsearch_tpu.ops.impact import build_impact_postings

        topic_of, t_ids, d_ids, w, vocab, df = synth_correlated(
            n_docs, cluster_order=True)
        imp = build_impact_postings(t_ids, d_ids, w, n_docs, vocab,
                                    p_max=P_MAX, align=align)
        d_ids = d_ids.astype(np.int32)
        topic_of = topic_of.astype(np.int16)
        np.savez(cache, topic_of=topic_of, d=d_ids, w=w, df=df,
                 vocab=vocab, imp_ids=np.asarray(imp.doc_ids),
                 imp_ws=np.asarray(imp.weights),
                 imp_starts=imp.starts_host, imp_lens=imp.lengths_host,
                 imp_slack=imp.slack_host, imp_wh=imp.weights_host)
        del imp
    coo_s = time.time() - t0
    from hybridsearch_tpu.ops.supertile import (
        build_super_postings,
        save_super_postings,
    )

    t1 = time.time()
    sp_cache = cache[:-4] + "_super"
    if not os.path.isdir(sp_cache):
        t_full = np.repeat(np.arange(vocab, dtype=np.int64), df)
        sp = build_super_postings(t_full, d_ids.astype(np.int64), w,
                                  n_docs, vocab)
        save_super_postings(sp, sp_cache)
    return {"n_docs": n_docs, "coo_s": round(coo_s, 1),
            "super_s": round(time.time() - t1, 1),
            "cache": cache, "super_dir": sp_cache}


def jaccard_vs_oracle(n_docs: int = 200_000, batch: int = 32) -> dict:
    """Top-10 Jaccard of the impact hybrid vs a NumPy full-fusion oracle
    at a host-feasible corpus size, same generator as the QPS run."""
    import jax
    import jax.numpy as jnp

    from bench import build_corpus
    from hybridsearch_tpu.ops.hybrid import hybrid_impact_topk
    from hybridsearch_tpu.ops.impact import (
        build_impact_postings,
        encode_impact_queries,
    )

    cluster = os.environ.get("HST_BENCH_CLUSTER", "1") != "0"
    # the tile budget pays off when clusters are larger than k_dense
    # (top-K' concentrates in the query topic's contiguous tiles) — at
    # small corpora the dense candidate tail spreads over generic tiles
    # and coverage cannot close
    default_kt = "128" if cluster and n_docs >= 1_000_000 else "0"
    kd_tiles = int(os.environ.get("HST_BENCH_KD_TILES", default_kt)) or None
    topic_of, t_ids, d_ids, w, vocab, df = synth_correlated(
        n_docs, n_topics=TOPICS, cluster_order=cluster)
    docs, cent = build_correlated_corpus(n_docs, topic_of, n_topics=TOPICS)
    imp = build_impact_postings(t_ids, d_ids, w, n_docs, vocab,
                                p_max=P_MAX)
    starts_full = np.concatenate([[0], np.cumsum(df)])[:-1]
    full = (jnp.asarray(d_ids.astype(np.int32)), jnp.asarray(w))
    term_lists, q_topics = correlated_queries(batch, n_topics=TOPICS)
    enc = encode_impact_queries(imp, term_lists, p_depth=PD,
                                full_starts=starts_full, full_lengths=df)
    q = query_vectors(q_topics, cent)
    if os.environ.get("HST_BENCH_SUPERHYB") == "1":
        from hybridsearch_tpu.ops.supertile import (
            build_super_postings,
            encode_super_queries,
            hybrid_supertile_topk,
        )

        t_full = np.repeat(np.arange(vocab, dtype=np.int64), df)
        sp = build_super_postings(t_full, d_ids.astype(np.int64), w,
                                  n_docs, vocab)
        enc_s = encode_super_queries(sp, term_lists)
        res, probes_dev = hybrid_supertile_topk(
            q, docs, sp, enc_s, TOP_K, 0.7, 0.3,
            s_probe=int(os.environ.get("HST_BENCH_SP", "2")),
            n_alive=n_docs, return_probes=True)
        probes = np.asarray(jax.device_get(probes_dev))
        super_docs = sp.super_docs
    elif os.environ.get("HST_BENCH_TILEHYB") == "1":
        from hybridsearch_tpu.ops.hybrid import hybrid_tile_topk

        res = hybrid_tile_topk(q, docs, imp, enc, TOP_K, 0.7, 0.3,
                               kt=int(os.environ.get("HST_BENCH_KT", "128")),
                               p_depth=PD, n_alive=n_docs,
                               full_postings=full)
    else:
        res = hybrid_impact_topk(q, docs, imp, enc, TOP_K, 0.7, 0.3,
                                 k_dense=KD, c_per_term=CP, p_depth=PD,
                                 n_alive=n_docs, full_postings=full,
                                 kd_tiles=kd_tiles)
    got_ids = np.asarray(jax.device_get(res.indices))
    exact_flags = np.asarray(jax.device_get(res.exact))

    # oracle semantic scores on device (same bf16 operands, f32
    # accumulate — identical numerics to both engine arms); docs stay in
    # their storage dtype: an astype(f32) copy of a 10M-doc corpus is
    # 15.4 GB and OOMs the chip next to the 7.7 GB original
    qo = q.astype(docs.dtype) if docs.dtype == jnp.bfloat16 else q
    sem_all = np.asarray(jax.device_get(
        jnp.einsum("nd,bd->bn", docs, qo,
                   preferred_element_type=jnp.float32))).astype(np.float64)
    starts = np.concatenate([[0], np.cumsum(df)])
    superhyb = os.environ.get("HST_BENCH_SUPERHYB") == "1"
    # disagreement attribution (VERDICT r3 weak #3): split every
    # oracle-vs-engine top-10 difference into {near-tie within the
    # accumulation-order noise floor, oracle doc outside the probed
    # supertiles, other}. TIE_EPS matches the kernel's certificate
    # epsilon: both arms consume the SAME bf16 operands, so residual
    # disagreement is f32 accumulation-order noise, not bf16 rounding.
    TIE_EPS = 1e-4
    jac = []
    n_tie = n_unprobed = n_other = 0
    jac_tie_adj = []
    for b in range(batch):
        sem = sem_all[b]
        lex = np.zeros(n_docs)
        for t in term_lists[b]:
            s0, l0 = starts[t], df[t]
            np.add.at(lex, d_ids[s0:s0 + l0], w[s0:s0 + l0])
        ns = (sem - sem.min()) / max(sem.max() - sem.min(), 1e-12)
        nl = lex / max(lex.max(), 1e-12)
        fused = 0.7 * ns + 0.3 * nl
        order_f = np.argsort(-fused)
        top = set(order_f[:TOP_K].tolist())
        got = set(int(x) for x in got_ids[b][:TOP_K] if x >= 0)
        jac.append(len(top & got) / max(len(top | got), 1))
        kth_val = fused[order_f[TOP_K - 1]]
        # tie-adjusted membership: any doc within TIE_EPS of the k-th
        # oracle score is an acceptable member of the top-k set
        relaxed_ok = sum(1 for g in got if fused[g] >= kth_val - TIE_EPS)
        jac_tie_adj.append(relaxed_ok / max(TOP_K, 1))
        if superhyb:
            probed_set = set(probes[b].tolist())
            for m in top - got:
                if (m // super_docs) not in probed_set:
                    n_unprobed += 1
                elif fused[m] <= kth_val + TIE_EPS:
                    n_tie += 1
                else:
                    n_other += 1
    # soundness audit: certified rows must be oracle-perfect
    cert_jac = [j for j, e in zip(jac, exact_flags) if e]
    return {
        "metric": (f"hybrid_impact_jaccard@{n_docs}docs"
                   + (f"_t{TOPICS}" if TOPICS != 1024 else "")
                   + ("_super"
                      if os.environ.get("HST_BENCH_SUPERHYB") == "1"
                      else "_tile"
                      if os.environ.get("HST_BENCH_TILEHYB") == "1"
                      else "")
                   + ("_clustered" if cluster else "")),
        "value": round(float(np.mean(jac)), 4),
        "unit": "jaccard@10 vs exact fusion oracle",
        "vs_baseline": round(float(np.mean(jac)) / 0.99, 4),
        "certified_exact_pct": round(100.0 * float(exact_flags.mean()), 2),
        "certified_jaccard": round(float(np.mean(cert_jac)), 4)
        if cert_jac else None,
        # tie-adjusted: fraction of engine picks whose f64 oracle score
        # reaches the k-th boundary minus the numerics noise floor — 1.0
        # means every deficit is an equal-score order swap
        "jaccard_tie_adjusted": round(float(np.mean(jac_tie_adj)), 4),
        **({"disagree_near_tie": n_tie, "disagree_unprobed": n_unprobed,
            "disagree_other": n_other} if superhyb else {}),
    }


def main() -> None:
    import sys

    import jax

    if os.environ.get("JAX_PLATFORMS") == "cpu":
        # the axon plugin registers regardless of the env var in this
        # image — pin the platform or a "CPU" run lands on the TPU and,
        # the tunnel being single-client, kills whatever else is measuring
        jax.config.update("jax_platforms", "cpu")

    if "--jaccard" in sys.argv:
        n_docs = int(os.environ.get("HST_BENCH_N", "200000"))
        if jax.default_backend() == "cpu":
            n_docs = min(n_docs, 50_000)
        print(json.dumps(jaccard_vs_oracle(n_docs)))
        return
    n_docs = int(os.environ.get("HST_BENCH_N", "10000000"))
    batch = int(os.environ.get("HST_BENCH_BATCH", "256"))
    if jax.default_backend() == "cpu":
        n_docs = min(n_docs, 200_000)
    iters = int(os.environ.get("HST_BENCH_ITERS", "8"))
    print(json.dumps(run(n_docs, batch, iters)))


if __name__ == "__main__":
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    main()
