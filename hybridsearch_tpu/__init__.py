"""hybridsearch_tpu — a TPU-native hybrid search framework.

A ground-up JAX/XLA/Pallas re-design of the capability surface of the
reference hybrid search engine (dense semantic + BM25 lexical retrieval,
weighted fusion, 8 pipelines, cross-encoder rerank funnel, MMR diversity,
RAG/HyDE/agentic search, semantic caching, autocomplete, dedup, metadata
filtering, jobs, watcher, evaluation, REST API, CLI).

Architecture (TPU-first, not a port):
  ops/        — XLA/Pallas kernels: fused matmul+top-k dense retrieval,
                CSR BM25 scoring, fusion, MMR, LSH projection
  models/     — Flax MiniLM-class bi-/cross-encoder + offline hashing encoder
  parallel/   — device mesh, shardings, collective top-k merge
  index/      — device-resident sharded dense & sparse indexes + manifests
  retrieval/  — Searcher (hybrid query path), query memory, funnel
  pipelines/  — the 8 named pipelines + create_pipeline factory
  text/       — tokenizer/extractor/chunkers (+ native C++ textops)
  store/      — sqlite host store (docs/metadata/feedback/history)
  services/   — semantic cache, autocomplete, dedup, language, metadata
                filter, jobs, watcher, auth
  evaluation/ — metrics, NumPy parity oracle, harness
  api/        — REST routes (stdlib httpd + optional FastAPI), CLI
  training/   — contrastive fine-tuning step (pjit/mesh sharded)

Reference behavior parity is cited per-module as /root/reference file:line.
"""

__version__ = "0.1.0"

from hybridsearch_tpu.config import EngineConfig  # noqa: F401

# Mirrors the reference's universal result tuple (score, content, doc_id)
# (reference: pipelines.py:21).
SearchResult = tuple  # (score: float, content: str, doc_id: int)


def _lazy(name):
    import importlib

    return importlib.import_module(name)


def __getattr__(name):
    # Lazy top-level exports so `import hybridsearch_tpu` stays light and
    # optional deps (fastapi, watchdog) never break import.
    lazy_map = {
        "Searcher": ("hybridsearch_tpu.retrieval.searcher", "Searcher"),
        "Indexer": ("hybridsearch_tpu.index.builder", "Indexer"),
        "BM25": ("hybridsearch_tpu.index.sparse_index", "BM25"),
        "create_pipeline": ("hybridsearch_tpu.pipelines", "create_pipeline"),
        "QueryMemory": ("hybridsearch_tpu.retrieval.query_memory", "QueryMemory"),
    }
    if name in lazy_map:
        mod, attr = lazy_map[name]
        return getattr(_lazy(mod), attr)
    raise AttributeError(f"module 'hybridsearch_tpu' has no attribute {name!r}")
