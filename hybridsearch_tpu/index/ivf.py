"""IVF (inverted-file) approximate dense index — TPU-native.

The reference wraps a FAISS *flat* index and aspires to "distributed FAISS
IVF with replicas" (reference indexer.py:35 comment, README.md:396 roadmap)
without implementing it. This is that index, built for the MXU:

  - coarse quantizer: k-means centroids trained on device (k-means++-style
    seeding + Lloyd iterations, all matmuls under jit);
  - storage: documents PERMUTED into cluster order so every cluster's
    members are one contiguous row range — a probe is a dynamic_slice, not
    a gather. Oversized clusters are split into fixed-capacity chunks that
    share the parent centroid, so every probe has the same static shape
    (no recompiles, no skew blowups);
  - query: score centroids (one small matmul), take top-nprobe chunks,
    slice + score their rows (static-width matmuls), exact top-k within
    the probed set.

Trade recall for speed with nprobe; recall vs the exact kernel is measured
in tests (recall@10 > 0.9 at 12.5% probe on clustered data).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from hybridsearch_tpu.ops.dense import l2_normalize


@functools.partial(jax.jit, static_argnames=("n_clusters", "iters"))
def kmeans_fit(vectors: jax.Array, n_clusters: int, seed: int = 0,
               iters: int = 10) -> jax.Array:
    """Spherical k-means on device: random init from data points, Lloyd
    iterations as matmuls (assignment = argmax cosine), empty clusters
    re-seeded from the data."""
    n, d = vectors.shape
    v = l2_normalize(vectors.astype(jnp.float32))
    key = jax.random.PRNGKey(seed)
    idx = jax.random.choice(key, n, (n_clusters,), replace=False)
    centroids = v[idx]

    def step(c, key):
        sims = jnp.dot(v, c.T, preferred_element_type=jnp.float32)  # [n, C]
        assign = jnp.argmax(sims, axis=1)
        one_hot = jax.nn.one_hot(assign, n_clusters, dtype=jnp.float32)
        sums = jnp.dot(one_hot.T, v, preferred_element_type=jnp.float32)
        counts = jnp.sum(one_hot, axis=0)[:, None]
        new_c = sums / jnp.maximum(counts, 1.0)
        # re-seed empties from random data points
        rnd = v[jax.random.randint(key, (n_clusters,), 0, n)]
        new_c = jnp.where(counts > 0, new_c, rnd)
        norm = jnp.linalg.norm(new_c, axis=1, keepdims=True)
        return new_c / jnp.maximum(norm, 1e-12), None

    keys = jax.random.split(key, iters)
    centroids, _ = jax.lax.scan(step, centroids, keys)
    return centroids


@functools.partial(jax.jit, static_argnames=("k", "nprobe", "chunk_cap"))
def _ivf_search(
    queries: jax.Array,
    centroids_per_chunk: jax.Array,  # [n_chunks, D]
    docs_perm: jax.Array,  # [N_pad, D] cluster-ordered
    chunk_starts: jax.Array,  # [n_chunks] int32 row offsets
    chunk_lens: jax.Array,  # [n_chunks] int32
    perm_to_orig: jax.Array,  # [N_pad] int32
    k: int,
    nprobe: int,
    chunk_cap: int,
) -> Tuple[jax.Array, jax.Array]:
    q = l2_normalize(queries.astype(jnp.float32))
    B = q.shape[0]
    c_scores = jnp.dot(q, centroids_per_chunk.T,
                       preferred_element_type=jnp.float32)  # [B, n_chunks]
    _, probe = jax.lax.top_k(c_scores, nprobe)  # [B, nprobe]

    iota = jax.lax.broadcasted_iota(jnp.int32, (1, chunk_cap), 1)[0]

    def per_query(qv, probes):
        def score_chunk(_, chunk_id):
            start = chunk_starts[chunk_id]
            length = chunk_lens[chunk_id]
            rows = jax.lax.dynamic_slice(
                docs_perm, (start, 0), (chunk_cap, docs_perm.shape[1])
            )
            s = jnp.dot(rows.astype(jnp.float32), qv,
                        preferred_element_type=jnp.float32)  # [chunk_cap]
            valid = iota < length
            s = jnp.where(valid, s, -jnp.inf)
            ridx = start + iota
            return None, (s, ridx)

        _, (scores, ridx) = jax.lax.scan(score_chunk, None, probes)
        flat_s = scores.reshape(-1)
        flat_i = ridx.reshape(-1)
        vals, sel = jax.lax.top_k(flat_s, k)
        rows = flat_i[sel]
        orig = jnp.where(jnp.isfinite(vals), perm_to_orig[rows], -1)
        return vals, orig

    return jax.vmap(per_query)(q, probe)


class IVFIndex:
    """Approximate inner-product index over L2-normalized embeddings."""

    def __init__(
        self,
        dim: int = 384,
        n_clusters: int = 0,  # 0 = sqrt(N) at build time
        nprobe: int = 8,
        chunk_cap: int = 0,  # 0 = 4 * N / n_clusters
        seed: int = 0,
    ) -> None:
        self.dim = dim
        self.n_clusters = n_clusters
        self.nprobe = nprobe
        self.chunk_cap = chunk_cap
        self.seed = seed
        self.n_docs = 0
        self._built = False

    def build(self, vectors: np.ndarray, kmeans_iters: int = 10) -> "IVFIndex":
        v = np.asarray(vectors, dtype=np.float32)
        n = len(v)
        self.n_docs = n
        C = self.n_clusters or max(1, int(np.sqrt(n)))
        C = min(C, n)
        cap = self.chunk_cap or max(8, (4 * n) // C)
        v_dev = jnp.asarray(v)
        centroids = kmeans_fit(v_dev, C, seed=self.seed, iters=kmeans_iters)
        v_norm = np.asarray(l2_normalize(v_dev.astype(jnp.float32)))
        assign = np.asarray(
            jnp.argmax(jnp.dot(jnp.asarray(v_norm), centroids.T), axis=1)
        )
        # permute docs into cluster order; split big clusters into chunks
        order = np.argsort(assign, kind="stable")
        sorted_assign = assign[order]
        chunk_starts, chunk_lens, chunk_centroid = [], [], []
        centroids_np = np.asarray(centroids)
        pos = 0
        while pos < n:
            c = sorted_assign[pos]
            end = pos
            while end < n and sorted_assign[end] == c and end - pos < cap:
                end += 1
            chunk_starts.append(pos)
            chunk_lens.append(end - pos)
            chunk_centroid.append(centroids_np[c])
            pos = end
        pad = cap  # so the last chunk's slice never reads out of bounds
        docs_perm = np.zeros((n + pad, v.shape[1]), dtype=np.float32)
        docs_perm[:n] = v_norm[order]
        perm_to_orig = np.full(n + pad, -1, dtype=np.int32)
        perm_to_orig[:n] = order
        self._centroids = jnp.asarray(np.stack(chunk_centroid))
        self._docs_perm = jnp.asarray(docs_perm)
        self._chunk_starts = jnp.asarray(np.asarray(chunk_starts, np.int32))
        self._chunk_lens = jnp.asarray(np.asarray(chunk_lens, np.int32))
        self._perm_to_orig = jnp.asarray(perm_to_orig)
        self._cap = cap
        self._built = True
        return self

    def search(self, queries: np.ndarray, k: int,
               nprobe: Optional[int] = None) -> Tuple[np.ndarray, np.ndarray]:
        if not self._built:
            raise RuntimeError("IVFIndex.search before build()")
        npr = min(nprobe or self.nprobe, self._centroids.shape[0])
        k_eff = min(k, self.n_docs)
        vals, idxs = _ivf_search(
            jnp.asarray(np.asarray(queries, np.float32)),
            self._centroids, self._docs_perm, self._chunk_starts,
            self._chunk_lens, self._perm_to_orig,
            k_eff, npr, self._cap,
        )
        return np.asarray(vals), np.asarray(idxs)
