"""Randomized interpret-mode sweep of the gated supertile serving levers.

The hardware A/B (hw_session phase 12) flips HST_PLACE_FUSED /
HST_SCORES_DEDUP on a scarce tunnel window; a correctness bug in a gated
variant would burn that window on rows the quality gate then rejects.
This sweep runs the EXACT gated compositions end-to-end through the
searcher across randomized shapes (corpus size, embedding dim, topic
count, batch size, query overlap) with every Pallas kernel in interpret
mode, asserting id-exact parity against the ungated XLA path.

Run:  python scripts/sweep_levers_interpret.py [n_trials] [seed]
"""

from __future__ import annotations

import os
import sys
import time

os.environ.setdefault("HST_ENCODER", "hashing")
os.environ.setdefault("HST_CKPT_DISCOVERY", "0")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

# CPU only: this sweep must never dial the device tunnel (single client
# at a time; the env-var spelling is ignored by the plugin — pin via
# config before backend init, docs/KERNELS.md)
jax.config.update("jax_platforms", "cpu")


GATES = (
    {"HST_PLACE_FUSED": "1"},
    {"HST_SCORES_DEDUP": "1"},
    {"HST_PLACE_FUSED": "1", "HST_SCORES_DEDUP": "1"},
)


def one_trial(trial: int, rng: np.random.Generator) -> None:
    from hybridsearch_tpu.config import EngineConfig
    from hybridsearch_tpu.models.encoder import HashingEncoder
    from hybridsearch_tpu.ops.supertile import _hybrid_super_impl
    from hybridsearch_tpu.retrieval import searcher as searcher_mod
    from hybridsearch_tpu.retrieval.searcher import Searcher

    dim = int(rng.choice([128, 256, 384]))
    n_docs = int(rng.integers(8_000, 36_000))
    n_topics = int(rng.choice([8, 12, 20]))
    batch = int(rng.choice([4, 7, 8, 12, 16]))
    top_k = int(rng.choice([5, 10]))
    vocab = [f"w{i}" for i in range(int(rng.integers(200, 500)))]
    topics = [" ".join(f"z{z}t{j}" for j in range(6))
              for z in range(n_topics)]
    texts = [f"{topics[i % n_topics]} "
             + " ".join(rng.choice(vocab, size=6)) for i in range(n_docs)]
    # query mix: heavy topic overlap (dedup run-lengths), including a
    # block of IDENTICAL queries (maximal-run edge) and singletons
    hot = int(rng.integers(0, n_topics))
    queries = [f"z{hot}t1 z{hot}t3 {vocab[0]}"] * max(2, batch // 3)
    while len(queries) < batch:
        z = int(rng.integers(0, n_topics))
        queries.append(f"z{z}t0 z{z}t4 {vocab[int(rng.integers(0, len(vocab)))]}")
    queries = queries[:batch]

    cfg = EngineConfig()
    cfg.index.layout = "clustered"
    cfg.index.dim = dim
    s = Searcher(encoder=HashingEncoder(dim=dim), use_query_memory=False,
                 config=cfg)
    s.indexer.index_documents(texts)

    searcher_mod.SPARSE_HYBRID_MIN_DOCS = 100
    os.environ["HST_TILE_HYBRID"] = "0"
    base = s.search_batch(queries, top_k=top_k, log=False)

    for gates in GATES:
        os.environ["HST_SUPER_INTERPRET"] = "1"
        for k_, v in gates.items():
            os.environ[k_] = v
        _hybrid_super_impl.clear_cache()
        try:
            got = s.search_batch(queries, top_k=top_k, log=False)
        finally:
            for k_ in gates:
                os.environ.pop(k_, None)
            os.environ.pop("HST_SUPER_INTERPRET", None)
            _hybrid_super_impl.clear_cache()
        for qi, (a, b) in enumerate(zip(base, got)):
            ids_a = [i for _v, _c, i in a]
            ids_b = [i for _v, _c, i in b]
            assert ids_a == ids_b, (
                f"trial {trial} gates={gates} q{qi}: {ids_a} != {ids_b} "
                f"(dim={dim} n={n_docs} topics={n_topics} b={batch})")
            np.testing.assert_allclose(
                [v for v, _c, _i in a], [v for v, _c, _i in b],
                rtol=1e-4, atol=1e-5,
                err_msg=f"trial {trial} gates={gates} q{qi}")
    print(f"trial {trial}: OK dim={dim} n={n_docs} topics={n_topics} "
          f"b={batch} k={top_k}", flush=True)


def main() -> None:
    n_trials = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 0
    t0 = time.time()
    for t in range(n_trials):
        one_trial(t, np.random.default_rng(seed + t))
    print(f"all {n_trials} trials passed in {time.time() - t0:.0f}s")


if __name__ == "__main__":
    main()
