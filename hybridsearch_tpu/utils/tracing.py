"""Tracing and per-stage query-path metrics.

The reference has no tracing (SURVEY §5.1 — OpenTelemetry is roadmap-only;
all that exists is perf_counter timing in the evaluator). Here:

  - StageTimer: lock-protected rolling latency/QPS counters per named stage
    (encode, dense, sparse, fuse, rerank), surfaced through /stats;
  - trace_span: context manager recording into a StageTimer and, when a
    profiling session is active, emitting a jax.profiler TraceAnnotation so
    stages show up on the TPU timeline;
  - QueryTracer.profile: wraps jax.profiler.trace for one-call capture of a
    device trace directory viewable in TensorBoard/XProf.
"""

from __future__ import annotations

import contextlib
import threading
import time
from collections import deque
from typing import Dict, Iterator, Optional

import numpy as np


class StageTimer:
    """Rolling per-stage latency stats (window of the last `window` samples)."""

    def __init__(self, window: int = 1024) -> None:
        self.window = window
        self._samples: Dict[str, deque] = {}
        self._counts: Dict[str, int] = {}
        self._lock = threading.Lock()
        self._started = time.time()

    def record(self, stage: str, seconds: float) -> None:
        with self._lock:
            dq = self._samples.setdefault(stage, deque(maxlen=self.window))
            dq.append(seconds)
            self._counts[stage] = self._counts.get(stage, 0) + 1

    def stats(self) -> Dict[str, Dict[str, float]]:
        with self._lock:
            out: Dict[str, Dict[str, float]] = {}
            elapsed = max(time.time() - self._started, 1e-9)
            for stage, dq in self._samples.items():
                arr = np.asarray(dq, dtype=np.float64) * 1e3
                out[stage] = {
                    "count": self._counts[stage],
                    "p50_ms": float(np.percentile(arr, 50)),
                    "p95_ms": float(np.percentile(arr, 95)),
                    "p99_ms": float(np.percentile(arr, 99)),
                    "mean_ms": float(arr.mean()),
                    "rate_per_s": self._counts[stage] / elapsed,
                }
            return out


GLOBAL_TIMER = StageTimer()


class Counters:
    """Named monotonic counters surfaced through /metrics (e.g. the
    exact->approximate semantic-arm downgrade counter)."""

    def __init__(self) -> None:
        self._lock = threading.Lock()
        self._counts: Dict[str, int] = {}

    def inc(self, name: str, by: int = 1) -> int:
        with self._lock:
            self._counts[name] = self._counts.get(name, 0) + by
            return self._counts[name]

    def get(self, name: str) -> int:
        with self._lock:
            return self._counts.get(name, 0)

    def all(self) -> Dict[str, int]:
        with self._lock:
            return dict(self._counts)


GLOBAL_COUNTERS = Counters()


@contextlib.contextmanager
def trace_span(stage: str, timer: Optional[StageTimer] = None) -> Iterator[None]:
    """Time a stage and annotate the device trace when profiling."""
    timer = timer or GLOBAL_TIMER
    ann = None
    try:
        import jax.profiler

        ann = jax.profiler.TraceAnnotation(stage)
        ann.__enter__()
    except Exception:
        ann = None
    t0 = time.perf_counter()
    try:
        yield
    finally:
        timer.record(stage, time.perf_counter() - t0)
        if ann is not None:
            try:
                ann.__exit__(None, None, None)
            except Exception:
                pass


class QueryTracer:
    """One-call device profiling (jax.profiler.trace -> TensorBoard dir)."""

    def __init__(self, log_dir: str = "/tmp/hst_trace") -> None:
        self.log_dir = log_dir

    @contextlib.contextmanager
    def profile(self) -> Iterator[str]:
        import jax.profiler

        jax.profiler.start_trace(self.log_dir)
        try:
            yield self.log_dir
        finally:
            jax.profiler.stop_trace()
