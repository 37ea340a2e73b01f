"""Device-resident dense (semantic) index.

The TPU-native replacement for the FAISS IndexFlatIP wrapper (reference
indexer.py:20-67): a flat exact index IS a matmul, so the "index" is a
mesh-sharded, capacity-padded [capacity, D] embedding matrix in HBM plus a
tombstone bias vector. Search runs the streaming fused matmul+top-k kernel
(ops/dense.py) per shard with a collective candidate merge
(parallel/collectives.py).

Fixes two reference flaws by design:
  - incremental adds update the live index (the reference's add_documents
    never updates FAISS, indexer.py:317-360);
  - the index persists to shard files + manifest and reloads without
    re-embedding (the reference re-embeds the whole corpus at every start,
    api.py:131-135).
Mutations build a new snapshot reference and swap atomically — readers
always see a consistent (docs, bias, n) triple (fixes the reference's
unlocked global mutation race, SURVEY §5.2).
"""

from __future__ import annotations

import functools
import json
import os
import threading
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from hybridsearch_tpu.ops.dense import l2_normalize, scan_dense_topk, tiled_dense_topk
from hybridsearch_tpu.parallel import collectives, mesh as mesh_lib

NEG_INF_F32 = float("-inf")


class _Snapshot:
    """Immutable view of the index state; swapped atomically on mutation."""

    __slots__ = ("docs", "bias", "n", "capacity")

    def __init__(self, docs: jax.Array, bias: jax.Array, n: int, capacity: int):
        self.docs = docs  # [capacity, D] float32, L2-normalized rows
        self.bias = bias  # [capacity] float32, 0 alive / -inf deleted
        self.n = n  # high-water mark of assigned rows
        self.capacity = capacity


class DenseIndex:
    """Exact inner-product index over L2-normalized embeddings."""

    def __init__(
        self,
        dim: int = 384,
        mesh: Optional[jax.sharding.Mesh] = None,
        block_n: int = 4096,
        capacity_round: int = 4096,
    ) -> None:
        self.dim = dim
        self.mesh = mesh
        self.block_n = block_n
        self.capacity_round = capacity_round
        # extra zero rows kept beyond n in every snapshot: a clustered
        # build sets this to the IVF chunk width so IVFIndex.from_layout
        # can slice chunks off the SHARED buffer without dynamic_slice
        # ever clamping (index/builder.py)
        self.reserve_rows = 0
        self._lock = threading.Lock()  # writers only; readers are lock-free
        self._snap = self._make_snapshot(np.zeros((0, dim), np.float32), None, 0)
        self.deleted_count = 0

    # -- properties ---------------------------------------------------------

    @property
    def n_docs(self) -> int:
        return self._snap.n

    @property
    def capacity(self) -> int:
        return self._snap.capacity

    def __len__(self) -> int:
        return self._snap.n - self.deleted_count

    # -- construction helpers ------------------------------------------------

    def _n_shards(self) -> int:
        return self.mesh.shape[mesh_lib.DATA_AXIS] if self.mesh is not None else 1

    def _round_capacity(self, n: int) -> int:
        shards = self._n_shards()
        per = -(-max(n + self.reserve_rows, 1) // shards)
        per = ((per + self.capacity_round - 1) // self.capacity_round) * self.capacity_round
        return per * shards

    def _place(self, host: np.ndarray, kind: str = "docs") -> jax.Array:
        if self.mesh is None:
            return jnp.asarray(host)
        from jax.sharding import NamedSharding, PartitionSpec as P

        spec = P(mesh_lib.DATA_AXIS, None) if host.ndim == 2 else P(mesh_lib.DATA_AXIS)
        return jax.device_put(host, NamedSharding(self.mesh, spec))

    def _make_snapshot(
        self, vectors: np.ndarray, bias: Optional[np.ndarray], n: int
    ) -> _Snapshot:
        cap = self._round_capacity(max(n, 1))
        docs_host = np.zeros((cap, self.dim), dtype=np.float32)
        docs_host[:n] = vectors[:n]
        # capacity-padding rows carry -inf bias so their zero vectors
        # (score 0) can never displace true docs with negative scores from
        # top-k slots; add() flips the bias to 0 as rows are assigned.
        bias_host = np.full((cap,), NEG_INF_F32, dtype=np.float32)
        bias_host[:n] = 0.0
        if bias is not None:
            bias_host[:n] = bias[:n]
        return _Snapshot(self._place(docs_host), self._place(bias_host), n, cap)

    # -- mutation (copy-on-write + atomic swap) ------------------------------

    def build(self, vectors: np.ndarray) -> "DenseIndex":
        """(Re)build from [N, D] raw embeddings. One host->device transfer;
        L2 normalization runs on device with buffer donation (zero rows —
        capacity padding — stay zero under the eps guard)."""
        v = np.asarray(vectors, dtype=np.float32)
        if v.ndim != 2 or v.shape[1] != self.dim:
            raise ValueError(f"expected [N, {self.dim}] vectors, got {v.shape}")
        n = len(v)
        cap = self._round_capacity(max(n, 1))
        host = np.zeros((cap, self.dim), dtype=np.float32)
        host[:n] = v
        docs = _normalize_rows(self._place(host))
        bias_host = np.full((cap,), NEG_INF_F32, dtype=np.float32)
        bias_host[:n] = 0.0
        with self._lock:
            self._snap = _Snapshot(docs, self._place(bias_host), n, cap)
            self.deleted_count = 0
        return self

    def add(self, vectors: np.ndarray) -> np.ndarray:
        """Append embeddings; returns their assigned row ids. Grows capacity
        by snapshot rebuild when full; otherwise in-place row update under
        donation (no reallocation)."""
        v = np.asarray(vectors, dtype=np.float32)
        if v.size == 0:
            return np.zeros((0,), dtype=np.int64)
        v = np.asarray(jax.device_get(l2_normalize(jnp.asarray(v))))
        with self._lock:
            snap = self._snap
            n_new = snap.n + len(v)
            ids = np.arange(snap.n, n_new, dtype=np.int64)
            if n_new <= snap.capacity:
                docs = _update_rows(snap.docs, jnp.asarray(v), snap.n)
                bias = _update_bias(snap.bias, jnp.zeros(len(v), jnp.float32),
                                    snap.n)
                self._snap = _Snapshot(docs, bias, n_new, snap.capacity)
            else:
                # grow ON DEVICE: allocate the bigger buffer and splice the
                # old rows + new rows in, never pulling the corpus to host
                new_cap = self._round_capacity(n_new)
                docs = _grow_rows(snap.docs, jnp.asarray(v), snap.n, new_cap,
                                  self.dim, self.mesh is not None)
                if self.mesh is not None:
                    docs = jax.device_put(
                        docs,
                        _sharding2(self.mesh),
                    )
                bias = _grow_bias(snap.bias, snap.n, len(v), new_cap)
                if self.mesh is not None:
                    bias = jax.device_put(bias, _sharding1(self.mesh))
                self._snap = _Snapshot(docs, bias, n_new, new_cap)
            return ids

    def delete(self, row_ids) -> None:
        """Tombstone rows (score bias -> -inf); compact() reclaims space."""
        ids = np.asarray(row_ids, dtype=np.int64)
        with self._lock:
            snap = self._snap
            bias_host = np.array(jax.device_get(snap.bias))
            newly = (bias_host[ids] == 0).sum()
            bias_host[ids] = NEG_INF_F32
            self._snap = _Snapshot(snap.docs, self._place(bias_host), snap.n,
                                   snap.capacity)
            self.deleted_count += int(newly)

    def compact(self) -> np.ndarray:
        """Drop tombstoned rows; returns old_row -> new_row mapping (-1 for
        deleted)."""
        with self._lock:
            snap = self._snap
            docs = np.array(jax.device_get(snap.docs[: snap.n]))
            bias = np.array(jax.device_get(snap.bias[: snap.n]))
            alive = bias == 0
            mapping = np.full(snap.n, -1, dtype=np.int64)
            mapping[alive] = np.arange(int(alive.sum()))
            self._snap = self._make_snapshot(docs[alive], None, int(alive.sum()))
            self.deleted_count = 0
            return mapping

    # -- search ---------------------------------------------------------------

    def search(
        self, queries, k: int, extra_bias: Optional[jax.Array] = None
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Top-k search. queries: [B, D] raw embeddings (normalized here).
        extra_bias: optional [n_docs] additive bias (metadata pre-filter).
        Returns (values [B, k'], indices [B, k']) as NumPy, k' = min(k, n)."""
        snap = self._snap
        if snap.n == 0:
            B = np.asarray(queries).shape[0]
            return np.zeros((B, 0), np.float32), np.zeros((B, 0), np.int32)
        q = l2_normalize(jnp.asarray(np.asarray(queries, dtype=np.float32)))
        k_eff = min(k, snap.n)
        bias = snap.bias
        if extra_bias is not None:
            eb = jnp.zeros((snap.capacity,), jnp.float32)
            eb = eb.at[: len(extra_bias)].set(jnp.asarray(extra_bias, jnp.float32))
            bias = bias + self._place(np.asarray(jax.device_get(eb)))
        if self.mesh is not None:
            vals, idxs = collectives.sharded_dense_topk(
                self.mesh, q, snap.docs, k_eff, block_n=self.block_n,
                valid_n=snap.n, bias_sharded=bias,
            )
        elif snap.capacity >= 65536 and k_eff <= 512:
            vals, idxs = tiled_dense_topk(
                q, snap.docs, k_eff, block_n=max(self.block_n, 65536),
                bias=bias,
            )
            valid = (idxs >= 0) & (idxs < snap.n)
            vals = jnp.where(valid, vals, -jnp.inf)
            idxs = jnp.where(valid, idxs, -1)
        else:
            vals, idxs = scan_dense_topk(
                q, snap.docs, k_eff, block_n=min(self.block_n, snap.capacity),
                bias=bias,
            )
            # mask padding rows beyond n
            valid = (idxs >= 0) & (idxs < snap.n)
            vals = jnp.where(valid, vals, -jnp.inf)
            idxs = jnp.where(valid, idxs, -1)
        return np.asarray(jax.device_get(vals)), np.asarray(jax.device_get(idxs))

    def get_vectors(self, row_ids) -> np.ndarray:
        """Gather embeddings for given rows (for MMR / rerank stages)."""
        snap = self._snap
        ids = jnp.asarray(np.asarray(row_ids, dtype=np.int32))
        out = jnp.take(snap.docs, jnp.clip(ids, 0, snap.capacity - 1), axis=0)
        return np.asarray(jax.device_get(out))

    # -- persistence (fixes reference's no-embedding-persistence, SURVEY §5.4)

    def save(self, path: str) -> None:
        """Write shard file(s) + manifest. Layout:
        path/manifest.json, path/shard_00000.npy (one file per mesh shard)."""
        os.makedirs(path, exist_ok=True)
        snap = self._snap
        docs = np.array(jax.device_get(snap.docs[: snap.n]))
        bias = np.array(jax.device_get(snap.bias[: snap.n]))
        shards = self._n_shards()
        per = -(-snap.n // shards) if snap.n else 0
        manifest = {
            "kind": "dense",
            "dim": self.dim,
            "n_docs": snap.n,
            "n_shards": shards,
            "rows_per_shard": per,
            "dtype": "float32",
            "normalized": True,
        }
        for s in range(shards):
            np.save(os.path.join(path, f"shard_{s:05d}.npy"),
                    docs[s * per : (s + 1) * per])
        np.save(os.path.join(path, "bias.npy"), bias)
        with open(os.path.join(path, "manifest.json"), "w") as f:
            json.dump(manifest, f, indent=2)

    @classmethod
    def load(
        cls,
        path: str,
        mesh: Optional[jax.sharding.Mesh] = None,
        block_n: int = 4096,
    ) -> "DenseIndex":
        with open(os.path.join(path, "manifest.json")) as f:
            manifest = json.load(f)
        shards = [
            np.load(os.path.join(path, f"shard_{s:05d}.npy"), mmap_mode="r")
            for s in range(manifest["n_shards"])
        ]
        docs = np.concatenate([np.asarray(s) for s in shards], axis=0) if shards else \
            np.zeros((0, manifest["dim"]), np.float32)
        bias_path = os.path.join(path, "bias.npy")
        bias = np.load(bias_path) if os.path.exists(bias_path) else None
        idx = cls(dim=manifest["dim"], mesh=mesh, block_n=block_n)
        with idx._lock:
            idx._snap = idx._make_snapshot(docs, bias, manifest["n_docs"])
            idx.deleted_count = int((bias == NEG_INF_F32).sum()) if bias is not None else 0
        return idx


@jax.jit
def _update_rows(docs: jax.Array, new_rows: jax.Array, start) -> jax.Array:
    return jax.lax.dynamic_update_slice(docs, new_rows, (start, 0))


@jax.jit
def _update_bias(bias: jax.Array, zeros: jax.Array, start) -> jax.Array:
    return jax.lax.dynamic_update_slice(bias, zeros, (start,))


@functools.partial(jax.jit, donate_argnums=(0,))
def _normalize_rows(docs: jax.Array) -> jax.Array:
    return l2_normalize(docs)


@functools.partial(jax.jit, static_argnames=("new_cap", "dim", "sharded"))
def _grow_rows(old_docs, new_rows, old_n, new_cap: int, dim: int,
               sharded: bool):
    out = jnp.zeros((new_cap, dim), dtype=old_docs.dtype)
    out = jax.lax.dynamic_update_slice(out, old_docs, (0, 0))
    return jax.lax.dynamic_update_slice(out, new_rows, (old_n, 0))


@functools.partial(jax.jit, static_argnames=("n_new", "new_cap"))
def _grow_bias(old_bias, old_n, n_new: int, new_cap: int):
    out = jnp.full((new_cap,), jnp.float32(-jnp.inf))
    out = jax.lax.dynamic_update_slice(out, old_bias, (0,))
    return jax.lax.dynamic_update_slice(
        out, jnp.zeros((n_new,), jnp.float32), (old_n,)
    )


def _sharding1(mesh):
    from jax.sharding import NamedSharding, PartitionSpec as P

    return NamedSharding(mesh, P(mesh_lib.DATA_AXIS))


def _sharding2(mesh):
    from jax.sharding import NamedSharding, PartitionSpec as P

    return NamedSharding(mesh, P(mesh_lib.DATA_AXIS, None))
