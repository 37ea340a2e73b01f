"""HTTP load generator for the live API server (full product path).

The kernel benches (bench.py, bench_hybrid.py) measure the device
programs; this measures what a CLIENT sees — HTTP parse, auth, caches,
searcher, JSON — against the stdlib ThreadingHTTPServer the framework
serves with (hybridsearch_tpu/api/httpd.py), the counterpart of driving
the reference's uvicorn app with an external load tool.

Open-loop arrivals (the honest way to measure serving latency: arrival
times are scheduled up front at the offered rate, so a slow server
accumulates queueing delay instead of silently throttling the offered
load, the failure closed-loop measurement hides). Queries are unique per
request (rotating topic/term mix) so exact-key and semantic caches serve
only their true hit share instead of a degenerate 100%.

Usage:
  python benchmarks/loadgen.py --docs 5000 --qps 50 --duration 20
  python benchmarks/loadgen.py --closed --workers 8   # throughput probe

One JSON line on stdout:
  {"offered_qps": ..., "achieved_qps": ..., "p50_ms": ..., "p95_ms": ...,
   "p99_ms": ..., "errors": 0, "n": ...}
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import threading
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("JAX_PLATFORMS") == "cpu":
    # the tunnel plugin wins over the env var; pin via config BEFORE
    # backend init or the import below dials the (possibly wedged)
    # device tunnel (docs/KERNELS.md)
    jax.config.update("jax_platforms", "cpu")

import numpy as np


def synth_docs(n: int, n_topics: int = 16, seed: int = 0) -> list:
    rng = np.random.default_rng(seed)
    vocab = [f"w{i}" for i in range(400)]
    topics = [" ".join(f"z{z}t{j}" for j in range(6)) for z in range(n_topics)]
    return [f"{topics[i % n_topics]} " + " ".join(rng.choice(vocab, size=8))
            for i in range(n)]


def make_queries(n: int, n_topics: int = 16, seed: int = 1) -> list:
    rng = np.random.default_rng(seed)
    out = []
    for i in range(n):
        z = int(rng.integers(0, n_topics))
        out.append(f"z{z}t{int(rng.integers(0, 6))} w{int(rng.integers(0, 400))} q{i}")
    return out


def run_load(base: str, queries: list, arrivals: list | None,
             workers: int, top_k: int = 5) -> dict:
    """Drive POST /search. arrivals=None -> closed loop (workers fire
    back-to-back); else each request waits for its scheduled offset."""
    lat_ms: list = []
    errors = [0]
    lock = threading.Lock()
    next_i = [0]
    t_start = time.perf_counter()

    def worker():
        while True:
            with lock:
                i = next_i[0]
                if i >= len(queries):
                    return
                next_i[0] += 1
            if arrivals is not None:
                delay = t_start + arrivals[i] - time.perf_counter()
                if delay > 0:
                    time.sleep(delay)
            body = json.dumps({"query": queries[i], "top_k": top_k}).encode()
            req = urllib.request.Request(
                base + "/search", data=body,
                headers={"Content-Type": "application/json"})
            t0 = time.perf_counter()
            try:
                with urllib.request.urlopen(req, timeout=30) as r:
                    r.read()
                ms = (time.perf_counter() - t0) * 1e3
                with lock:
                    lat_ms.append(ms)
            except Exception:
                with lock:
                    errors[0] += 1

    threads = [threading.Thread(target=worker) for _ in range(workers)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t_start
    lats = np.asarray(sorted(lat_ms)) if lat_ms else np.asarray([0.0])
    return {
        "n": len(lat_ms),
        "errors": errors[0],
        "achieved_qps": round(len(lat_ms) / wall, 2),
        "p50_ms": round(float(np.percentile(lats, 50)), 2),
        "p95_ms": round(float(np.percentile(lats, 95)), 2),
        "p99_ms": round(float(np.percentile(lats, 99)), 2),
        "max_ms": round(float(lats[-1]), 2),
    }


def main(argv: list | None = None) -> dict:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=5000)
    ap.add_argument("--qps", type=float, default=50.0,
                    help="offered arrival rate (open loop)")
    ap.add_argument("--duration", type=float, default=20.0)
    ap.add_argument("--workers", type=int, default=8)
    ap.add_argument("--top-k", type=int, default=5)
    ap.add_argument("--closed", action="store_true",
                    help="closed loop: workers fire back-to-back "
                         "(throughput probe, not latency)")
    ap.add_argument("--encoder", default="hashing",
                    choices=["hashing", "auto"],
                    help="auto resolves the trained checkpoint")
    ap.add_argument("--no-batching", action="store_true",
                    help="disable cross-request dynamic batching (A/B "
                         "the serving-layer coalescing)")
    ap.add_argument("--layout", default="source",
                    choices=["source", "clustered"],
                    help="index layout (clustered engages the supertile "
                         "serving ladder at >=200k docs)")
    args = ap.parse_args(argv)

    if args.encoder == "hashing":
        os.environ.setdefault("HST_ENCODER", "hashing")
        os.environ.setdefault("HST_CKPT_DISCOVERY", "0")
    from hybridsearch_tpu.api.app import EngineState
    from hybridsearch_tpu.api.httpd import APIServer
    from hybridsearch_tpu.models.encoder import HashingEncoder, default_encoder

    enc = (HashingEncoder(dim=128) if args.encoder == "hashing"
           else default_encoder())
    from hybridsearch_tpu.config import EngineConfig

    cfg = EngineConfig()
    if args.no_batching:
        cfg.serving.dynamic_batching = False
    # layout decides the >=200k-doc query path: "clustered" serves the
    # supertile ladder (the documented at-scale configuration, all the
    # round-5 serving work), "source" the impact-pruned union ladder
    cfg.index.layout = args.layout
    state = EngineState(encoder=enc, config=cfg)
    state.indexer.index_documents(synth_docs(args.docs))

    n_req = (max(1, int(args.qps * args.duration))
             if not args.closed else int(args.workers * args.duration * 4))
    queries = make_queries(n_req)
    arrivals = None
    if not args.closed:
        # deterministic uniform arrivals at the offered rate (an
        # exponential process adds variance a 20 s window can't average)
        arrivals = [i / args.qps for i in range(n_req)]

    # deterministic warmup FIRST: compile every batcher pad bucket with
    # queries from the live distribution (HTTP-driven warmup is emergent —
    # a bucket first formed inside the measured window stalls its batch on
    # a compile; chip loadgen measured 20.7 s p99 from exactly this)
    t_w = time.perf_counter()
    n_warm = state.warmup(make_queries(64, seed=11), top_k=args.top_k)
    warm_s = round(time.perf_counter() - t_w, 1)

    with APIServer(state, host="127.0.0.1", port=0) as server:
        base = f"http://127.0.0.1:{server.port}"
        # HTTP-level warm pass (router, caches, batcher thread)
        run_load(base, make_queries(max(4, 2 * args.workers), seed=9),
                 None, workers=args.workers, top_k=args.top_k)
        res = run_load(base, queries, arrivals, args.workers,
                       top_k=args.top_k)
    res["warmup_dispatches"] = n_warm
    res["warmup_s"] = warm_s
    line = {
        "metric": f"http_search_latency@{args.docs}docs",
        "offered_qps": None if args.closed else args.qps,
        "mode": "closed" if args.closed else "open",
        "encoder": type(enc).__name__,
        "layout": args.layout, "dynamic_batching": not args.no_batching,
        **res,
    }
    if state.batcher is not None:
        line["batch_dispatches"] = state.batcher.dispatches
        line["batch_max_size"] = state.batcher.max_seen_batch
    print(json.dumps(line))
    return line


if __name__ == "__main__":
    main()
