"""The five BASELINE.json benchmark configs, runnable end-to-end.

BEIR SciFact / MS MARCO are not downloadable in this environment (zero
egress), so each config runs against a deterministic synthetic corpus with
planted relevance structure (topic clusters + shared keyphrases), measuring
the same things the configs specify: recall@10 Jaccard vs the NumPy oracle,
per-config latency, and QPS. Swap `synthetic_corpus` for a BEIR loader when
datasets are on disk.

Usage: python -m benchmarks.run_configs [--n-docs 5000] [--config N]
Prints one JSON object per config.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from typing import Dict, List, Tuple

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

TOPICS = [
    ("machine learning", ["model", "training", "data", "gradient", "neural"]),
    ("cooking", ["recipe", "pasta", "boil", "salt", "flavor"]),
    ("finance", ["stock", "market", "portfolio", "equity", "dividend"]),
    ("gardening", ["flower", "soil", "bloom", "spring", "seed"]),
    ("sports", ["basketball", "training", "agility", "endurance", "court"]),
    ("astronomy", ["telescope", "galaxy", "orbit", "stellar", "nebula"]),
]

_FILLER = ("the quick system runs with many parts and moves through the "
           "long day while several things happen around it").split()


def synthetic_corpus(n_docs: int, seed: int = 0) -> Tuple[List[str], List[int]]:
    """Deterministic corpus of topic-clustered documents; returns
    (docs, topic_of_doc)."""
    rng = np.random.default_rng(seed)
    docs, topics = [], []
    for i in range(n_docs):
        t = int(rng.integers(len(TOPICS)))
        name, words = TOPICS[t]
        k = rng.integers(3, 6)
        chosen = list(rng.choice(words, size=k, replace=True))
        filler = list(rng.choice(_FILLER, size=rng.integers(5, 15), replace=True))
        body = chosen + filler
        rng.shuffle(body)
        docs.append(f"{name} document {i}: " + " ".join(map(str, body)))
        topics.append(t)
    return docs, topics


def queries_for(topics_wanted: List[int], n: int, seed: int = 1) -> List[Tuple[str, int]]:
    rng = np.random.default_rng(seed)
    out = []
    for i in range(n):
        t = topics_wanted[i % len(topics_wanted)]
        name, words = TOPICS[t]
        sel = list(rng.choice(words, size=2, replace=False))
        out.append((f"{name} {' '.join(map(str, sel))}", t))
    return out


def _timed_queries(search_fn, queries, warmup: int = 2) -> Dict[str, float]:
    for q, _t in queries[:warmup]:
        search_fn(q)
    lats = []
    t0 = time.perf_counter()
    for q, _t in queries:
        s = time.perf_counter()
        search_fn(q)
        lats.append(time.perf_counter() - s)
    wall = time.perf_counter() - t0
    lats_ms = np.asarray(lats) * 1e3
    return {
        "qps": len(queries) / wall,
        "p50_ms": float(np.percentile(lats_ms, 50)),
        "p99_ms": float(np.percentile(lats_ms, 99)),
    }


def _encoder_info(encoder) -> Dict:
    """Weights provenance for a config row: pretrained is True when the
    encoder serves real learned weights (an HF checkpoint, or the
    in-repo contrastively trained one — scripts/train_encoder.py)."""
    return {
        "encoder": type(encoder).__name__,
        "pretrained": bool(getattr(encoder, "pretrained", False)),
        "weights_origin": getattr(encoder, "weights_origin", "hashing"),
    }


def config_1_demo(n_docs: int) -> Dict:
    """main.py demo: basic pipeline, bundled demo docs, top_k=5."""
    from hybridsearch_tpu.demo import SAMPLE_DOCS
    from hybridsearch_tpu.pipelines import create_pipeline

    p = create_pipeline("basic")
    p.index(SAMPLE_DOCS)
    out = p.search("machine learning and AI", top_k=5)
    ids = {r[2] for r in out.results}
    return {"config": "1_basic_demo", "docs": len(SAMPLE_DOCS),
            "ml_docs_surfaced": bool(ids & {1, 3, 6, 8, 10}),
            "results": len(out.results),
            **_encoder_info(p.indexer.encoder)}


def config_2_bm25(n_docs: int) -> Dict:
    """bm25 pipeline (k1=1.5, b=0.75) pure keyword search."""
    from hybridsearch_tpu.pipelines import create_pipeline

    docs, topics = synthetic_corpus(n_docs)
    p = create_pipeline("bm25", k1=1.5, b=0.75)
    p.index(docs)
    qs = queries_for(list(range(len(TOPICS))), 30)
    hits = []
    for q, t in qs:
        out = p.search(q, top_k=10)
        rel = sum(1 for _s, _c, i in out.results if topics[i] == t)
        hits.append(rel / max(len(out.results), 1))
    perf = _timed_queries(lambda q: p.search(q, top_k=10), qs)
    # batched lexical scoring (the serving mode; per-query sync timing is
    # dispatch-RTT-dominated in this environment). BM25Pipeline is
    # lexical-only (no dense index), so the batched path is the BM25
    # kernel itself + host top-k. Distinct queries: caches exist upstream
    batch_qs = [q for q, _ in queries_for(list(range(len(TOPICS))), 120,
                                          seed=9)]

    def bm25_batch(queries):
        scores = p.indexer.bm25.batch_scores(queries)
        return np.argsort(-scores, axis=1)[:, :10]

    bm25_batch(batch_qs)  # warm/compile
    t0 = time.perf_counter()
    out = bm25_batch(batch_qs)
    assert out.shape[0] == len(batch_qs)
    batch_qps = len(batch_qs) / (time.perf_counter() - t0)
    return {"config": "2_bm25_pure", "docs": n_docs,
            "topic_precision@10": round(float(np.mean(hits)), 4),
            "batch_qps": round(batch_qps, 2), **perf}


def config_3_hybrid(n_docs: int) -> Dict:
    """hybrid_bm25: 0.6 semantic + 0.4 BM25, top_k=10 + oracle parity."""
    from hybridsearch_tpu.evaluation.harness import recall_parity
    from hybridsearch_tpu.retrieval.searcher import Searcher

    docs, _topics = synthetic_corpus(n_docs)
    s = Searcher(use_query_memory=False)
    s.indexer.index_documents(docs)
    qs = queries_for(list(range(len(TOPICS))), 20)
    parity = recall_parity(s, [q for q, _ in qs], k=10,
                           semantic_weight=0.6, lexical_weight=0.4)
    perf = _timed_queries(
        lambda q: s.search(q, top_k=10, semantic_weight=0.6,
                           lexical_weight=0.4, log=False), qs)
    batch_qs = [q for q, _ in queries_for(list(range(len(TOPICS))), 120,
                                          seed=9)]
    s.search_batch(batch_qs, top_k=10, semantic_weight=0.6,
                   lexical_weight=0.4, log=False)  # warm/compile
    t0 = time.perf_counter()
    s.search_batch(batch_qs, top_k=10, semantic_weight=0.6,
                   lexical_weight=0.4, log=False)
    batch_qps = len(batch_qs) / (time.perf_counter() - t0)
    return {"config": "3_hybrid_bm25_0.6_0.4", "docs": n_docs,
            "jaccard_vs_oracle": round(parity["mean_jaccard"], 4),
            "batch_qps": round(batch_qps, 2), **perf,
            **_encoder_info(s.indexer.encoder)}


def config_4_multistage(n_docs: int) -> Dict:
    """multi_stage 100 -> 20 -> 5 with the cross-encoder."""
    from hybridsearch_tpu.models.bert import BertConfig
    from hybridsearch_tpu.models.minilm import MiniLMCrossEncoder
    from hybridsearch_tpu.pipelines import create_pipeline
    from hybridsearch_tpu.retrieval.reranker import CrossEncoderReranker

    docs, topics = synthetic_corpus(min(n_docs, 2000))
    from hybridsearch_tpu.models.minilm import find_checkpoint

    ce_ckpt = find_checkpoint("ms-marco-MiniLM-L-6-v2")
    if ce_ckpt:
        # the in-repo trained reranker (scripts/train_cross_encoder.py)
        ce = MiniLMCrossEncoder(checkpoint=ce_ckpt)
    else:
        cfg = BertConfig(vocab_size=4096, hidden_dim=128, num_layers=2,
                         num_heads=4, mlp_dim=256)
        ce = MiniLMCrossEncoder(cfg=cfg, dim=128, max_seq_len=64)
    rr = CrossEncoderReranker(model=ce)
    p = create_pipeline("multi_stage", reranker=rr, stage1_k=100,
                        stage2_k=20, final_k=5)
    p.index(docs)
    qs = queries_for(list(range(len(TOPICS))), 12)
    perf = _timed_queries(lambda q: p.search(q), qs)
    out = p.search(qs[0][0])
    # post-rerank relevance: fraction of final-5 docs in the query topic
    hits = tot = 0
    for q, t in qs:
        for _s, _c, did in p.search(q).results:
            hits += int(topics[did] == t)
            tot += 1
    return {"config": "4_multistage_100_20_5", "docs": len(docs),
            "topic_precision@5": round(hits / max(tot, 1), 4),
            "funnel": [out.metadata["stage1_k"], out.metadata["stage2_k"],
                       len(out.results)], **perf,
            "ce_pretrained": bool(getattr(ce, "pretrained", False)),
            "ce_weights_origin": getattr(ce, "weights_origin", "random"),
            **_encoder_info(p.indexer.encoder)}


def config_5_diversity_cache_batch(n_docs: int) -> Dict:
    """diversity (MMR 0.5) + semantic cache + batch search."""
    from hybridsearch_tpu.api.app import EngineState, build_router
    from hybridsearch_tpu.pipelines import create_pipeline

    docs, _topics = synthetic_corpus(n_docs)
    p = create_pipeline("diversity", lambda_param=0.5)
    p.index(docs)
    qs = queries_for(list(range(len(TOPICS))), 12)
    perf = _timed_queries(lambda q: p.search(q, top_k=10), qs)
    # semantic cache hit path through the API
    state = EngineState(use_semantic_cache=True)
    router = build_router(state)
    router.dispatch("POST", "/index", {"documents": docs[:500]})
    router.dispatch("POST", "/search", {"query": qs[0][0], "top_k": 5})
    _code, second, _h = router.dispatch("POST", "/search",
                                        {"query": qs[0][0], "top_k": 5})
    # batched search
    batch_qs = [q for q, _ in qs]
    t0 = time.perf_counter()
    p.searcher.search_batch(batch_qs, top_k=10, log=False)
    batch_s = time.perf_counter() - t0
    # batched DIVERSITY (one mmr_select_batch program for all queries;
    # warm at the SAME batch shape to exclude compile, like the other
    # batch rows)
    p.search_batch(batch_qs, top_k=10)
    t0 = time.perf_counter()
    p.search_batch(batch_qs, top_k=10)
    div_batch_s = time.perf_counter() - t0
    state.close()
    return {"config": "5_diversity_cache_batch", "docs": n_docs,
            "cache_hit_on_repeat": bool(second.get("cached")),
            "batch_qps": round(len(batch_qs) / batch_s, 2),
            "div_batch_qps": round(len(batch_qs) / div_batch_s, 2), **perf,
            **_encoder_info(p.indexer.encoder)}


CONFIGS = {1: config_1_demo, 2: config_2_bm25, 3: config_3_hybrid,
           4: config_4_multistage, 5: config_5_diversity_cache_batch}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-docs", type=int, default=5000)
    ap.add_argument("--config", type=int, default=0, help="0 = all")
    args = ap.parse_args()
    if os.environ.get("JAX_PLATFORMS") == "cpu":
        # the axon TPU plugin wins over the env var; force via config
        # (a CPU run otherwise hangs on a wedged tunnel)
        import jax

        jax.config.update("jax_platforms", "cpu")
    chosen = [args.config] if args.config else sorted(CONFIGS)
    for c in chosen:
        result = CONFIGS[c](args.n_docs)
        print(json.dumps(result))


if __name__ == "__main__":
    main()
