"""Semantic query cache with LSH candidate lookup.

Parity with the reference semantic cache (reference semantic_cache.py:42-424):
random-hyperplane LSH (10 tables x 8 bits) over query embeddings, cache hit
when cosine >= 0.95, pluggable in-memory (LRU+TTL) / Redis backends,
hit/miss statistics.

TPU-native difference: hashing a query is ONE [tables*bits, D] matmul + a
sign-bit pack on device (ops/lsh.py) instead of the reference's per-table
Python loops (semantic_cache.py:75-79); the final cosine confirmation over
LSH candidates is a single batched device dot.

Unlike the reference — which instantiates this cache but never consults it
in /search (reference api.py:117 vs :272) — the API layer here actually
wires it into the query path.
"""

from __future__ import annotations

import threading
import time
from collections import OrderedDict
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from hybridsearch_tpu.ops.lsh import lsh_planes, lsh_signatures


class CacheBackend:
    """Storage interface (reference semantic_cache.py:157-178)."""

    def get(self, key: str) -> Optional[Any]:
        raise NotImplementedError

    def set(self, key: str, value: Any, ttl: Optional[float] = None) -> None:
        raise NotImplementedError

    def delete(self, key: str) -> None:
        raise NotImplementedError

    def clear(self) -> None:
        raise NotImplementedError

    def __len__(self) -> int:
        raise NotImplementedError


class InMemoryBackend(CacheBackend):
    """LRU + TTL (reference semantic_cache.py:181-226)."""

    def __init__(self, max_entries: int = 10000) -> None:
        self.max_entries = max_entries
        self._store: "OrderedDict[str, Tuple[Any, Optional[float]]]" = OrderedDict()
        self._lock = threading.Lock()

    def get(self, key: str) -> Optional[Any]:
        with self._lock:
            item = self._store.get(key)
            if item is None:
                return None
            value, expires = item
            if expires is not None and time.time() > expires:
                del self._store[key]
                return None
            self._store.move_to_end(key)
            return value

    def set(self, key: str, value: Any, ttl: Optional[float] = None) -> None:
        with self._lock:
            expires = time.time() + ttl if ttl else None
            self._store[key] = (value, expires)
            self._store.move_to_end(key)
            while len(self._store) > self.max_entries:
                self._store.popitem(last=False)

    def delete(self, key: str) -> None:
        with self._lock:
            self._store.pop(key, None)

    def clear(self) -> None:
        with self._lock:
            self._store.clear()

    def __len__(self) -> int:
        with self._lock:
            return len(self._store)


class RedisBackend(CacheBackend):
    """Redis-backed storage (reference semantic_cache.py:228-270); optional
    dependency, used when a client is supplied."""

    def __init__(self, client, prefix: str = "hst:semcache:") -> None:
        import pickle

        self._pickle = pickle
        self.client = client
        self.prefix = prefix

    def get(self, key: str) -> Optional[Any]:
        raw = self.client.get(self.prefix + key)
        return self._pickle.loads(raw) if raw is not None else None

    def set(self, key: str, value: Any, ttl: Optional[float] = None) -> None:
        raw = self._pickle.dumps(value)
        if ttl:
            self.client.setex(self.prefix + key, int(ttl), raw)
        else:
            self.client.set(self.prefix + key, raw)

    def delete(self, key: str) -> None:
        self.client.delete(self.prefix + key)

    def clear(self) -> None:
        for k in self.client.scan_iter(self.prefix + "*"):
            self.client.delete(k)

    def __len__(self) -> int:
        return sum(1 for _ in self.client.scan_iter(self.prefix + "*"))


class SemanticCache:
    """LSH-candidate + cosine-confirm query result cache
    (reference semantic_cache.py:272-424)."""

    def __init__(
        self,
        similarity_threshold: float = 0.95,
        ttl_seconds: float = 3600.0,
        n_tables: int = 10,
        n_bits: int = 8,
        dim: int = 384,
        max_entries: int = 10000,
        backend: Optional[CacheBackend] = None,
        seed: int = 13,
    ) -> None:
        self.similarity_threshold = similarity_threshold
        self.ttl = ttl_seconds
        self.n_tables = n_tables
        self.n_bits = n_bits
        self.dim = dim
        self.backend = backend or InMemoryBackend(max_entries)
        self.planes = lsh_planes(jax.random.PRNGKey(seed), n_tables, n_bits, dim)
        # LSH buckets: (table, signature) -> list of entry keys
        self._buckets: Dict[Tuple[int, int], List[str]] = {}
        self._vectors: Dict[str, np.ndarray] = {}
        self._lock = threading.Lock()
        self.hits = 0
        self.misses = 0

    # -- hashing -----------------------------------------------------------

    def _signatures(self, vec: np.ndarray) -> np.ndarray:
        sig = lsh_signatures(self.planes, jnp.asarray(vec[None, :]),
                             self.n_tables, self.n_bits)
        return np.asarray(sig)[0]

    # -- api ----------------------------------------------------------------

    def get(self, query_vec: np.ndarray) -> Optional[Any]:
        """Return the cached value of the most similar cached query with
        cosine >= threshold, else None."""
        vec = np.asarray(query_vec, dtype=np.float32).reshape(-1)
        vec = vec / max(float(np.linalg.norm(vec)), 1e-12)
        sigs = self._signatures(vec)
        with self._lock:
            cand_keys: List[str] = []
            seen = set()
            for t, s in enumerate(sigs):
                for key in self._buckets.get((t, int(s)), ()):
                    if key not in seen:
                        seen.add(key)
                        cand_keys.append(key)
            cand_vecs = [self._vectors[k] for k in cand_keys if k in self._vectors]
            cand_keys = [k for k in cand_keys if k in self._vectors]
        if not cand_keys:
            self.misses += 1
            return None
        mat = np.stack(cand_vecs)  # already normalized
        sims = mat @ vec
        best = int(np.argmax(sims))
        if sims[best] < self.similarity_threshold:
            self.misses += 1
            return None
        value = self.backend.get(cand_keys[best])
        if value is None:  # expired
            self.misses += 1
            return None
        self.hits += 1
        return value

    def set(self, query_vec: np.ndarray, value: Any,
            key: Optional[str] = None) -> str:
        vec = np.asarray(query_vec, dtype=np.float32).reshape(-1)
        vec = vec / max(float(np.linalg.norm(vec)), 1e-12)
        key = key or f"q{len(self._vectors)}_{time.time_ns()}"
        sigs = self._signatures(vec)
        with self._lock:
            self._vectors[key] = vec
            for t, s in enumerate(sigs):
                self._buckets.setdefault((t, int(s)), []).append(key)
        self.backend.set(key, value, ttl=self.ttl)
        return key

    def invalidate(self) -> int:
        """Clear everything (reference semantic_cache.py:389-410)."""
        with self._lock:
            n = len(self._vectors)
            self._vectors.clear()
            self._buckets.clear()
        self.backend.clear()
        return n

    def stats(self) -> Dict[str, Any]:
        """Hit/miss statistics (reference semantic_cache.py:412-424)."""
        total = self.hits + self.misses
        return {
            "hits": self.hits,
            "misses": self.misses,
            "hit_rate": self.hits / total if total else 0.0,
            "entries": len(self._vectors),
            "threshold": self.similarity_threshold,
        }
