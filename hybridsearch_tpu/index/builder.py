"""Indexer: document ingest -> host store + device indexes.

Capability parity with the reference Indexer (reference indexer.py:70-373):
context manager over a DB path, destructive full reindex, incremental add,
batched embedding, full reload. Design differences (TPU-first fixes):

  - embeddings persist as device-index shard files + manifest and reload
    without re-embedding (the reference re-embeds the whole corpus at every
    process start, api.py:131-135, cli.py:33);
  - incremental adds update BOTH the dense index and the BM25 postings (the
    reference's add_documents leaves its FAISS index stale,
    indexer.py:317-360);
  - the embed path is a batched device encode, padded to bucketed batch
    shapes to avoid XLA recompiles.
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from hybridsearch_tpu.config import EngineConfig
from hybridsearch_tpu.index.dense_index import DenseIndex
from hybridsearch_tpu.index.sparse_index import BM25, BM25Plus
from hybridsearch_tpu.store.docstore import DocStore
from hybridsearch_tpu.text.extractor import extract_tokens, preprocess_text


class Indexer:
    """Builds and maintains the dense + sparse indexes and the host store."""

    def __init__(
        self,
        db_path: str = ":memory:",
        encoder=None,
        mesh=None,
        config: Optional[EngineConfig] = None,
    ) -> None:
        self.config = config or EngineConfig()
        self.db_path = db_path
        self.store = DocStore(db_path)
        self.mesh = mesh
        self._encoder = encoder
        if encoder is not None and getattr(encoder, "dim", None):
            # the embedding dim is dictated by the encoder
            self.config.index.dim = encoder.dim
        bm25_cls = BM25Plus if self.config.bm25.variant == "bm25plus" else BM25
        self.bm25 = bm25_cls(
            k1=self.config.bm25.k1, b=self.config.bm25.b,
            delta=self.config.bm25.delta, mesh=mesh,
        )
        self.dense = DenseIndex(
            dim=self.config.index.dim,
            mesh=mesh,
            block_n=self.config.index.block_n,
            capacity_round=self.config.index.capacity_round,
        )
        self.ivf = None  # built on demand when config.index.ann == "ivf"
        self.contents: List[str] = []
        self.doc_ids: List[int] = []

    # -- lifecycle -------------------------------------------------------------

    def __enter__(self) -> "Indexer":
        return self

    def __exit__(self, *exc) -> None:
        self.close()

    def close(self) -> None:
        self.store.close()

    @property
    def encoder(self):
        if self._encoder is None:
            from hybridsearch_tpu.models.encoder import default_encoder

            self._encoder = default_encoder(dim=self.config.index.dim)
        return self._encoder

    # -- embedding ---------------------------------------------------------------

    def embed(self, texts: Sequence[str], batch_size: int = 2048) -> np.ndarray:
        """Batched encode (reference indexer.py:229-243). 2048-doc device
        batches: the encode dispatch has a fixed per-call cost (host
        round trip + pad-bucket fill), and a 200k-doc build at 512 paid
        it 390x — the gather-mean program itself is far from any memory
        limit at 2048."""
        out = []
        for i in range(0, len(texts), batch_size):
            out.append(self.encoder.encode(list(texts[i : i + batch_size])))
        return (
            np.concatenate(out, axis=0)
            if out
            else np.zeros((0, self.config.index.dim), np.float32)
        )

    # -- indexing ----------------------------------------------------------------

    def index_documents(
        self,
        documents: Sequence[str],
        paths: Optional[Sequence[Optional[str]]] = None,
        metas: Optional[Sequence[Optional[Dict]]] = None,
    ) -> Dict[str, int]:
        """Destructive full reindex (reference indexer.py:245-315).

        `metas` (per-document metadata dicts, extension over the
        reference's Document model api.py:26-29) is permuted alongside
        the corpus under the clustered layout, so doc_id->metadata stays
        consistent for the /search/filtered device pre-filter."""
        tmark = time.perf_counter()
        timings: Dict[str, float] = {}

        def _mark(stage: str) -> None:
            nonlocal tmark
            now = time.perf_counter()
            timings[stage] = round(timings.get(stage, 0.0) + now - tmark, 3)
            tmark = now

        docs = [preprocess_text(d) for d in documents]
        _mark("preprocess_s")
        paths = list(paths) if paths is not None else None
        metas = list(metas) if metas is not None else None
        vectors = None
        cluster_cent = cluster_assign = None
        if self.config.index.layout == "clustered" and len(docs) > 256:
            # semantic layout clustering: embed first, order the corpus by
            # k-means cluster so semantically-similar docs share 128-doc
            # tiles. Doc ids are assigned AFTER the permutation, so every
            # component (store, dense, BM25, metadata) sees one consistent
            # ordering. Payoff: tile-max selection concentrates (the
            # probe_tiles budget in ops/dense.py covers with ~8x fewer
            # tile gathers) and per-tile certificates tighten.
            vectors = self.embed(docs)
            _mark("embed_s")
            want_ivf = self._want_ivf(len(docs))
            # ONE k-means serves both the layout and (when IVF is on)
            # the coarse quantizer — the IVF cluster count pins k so the
            # quantizer granularity matches the config.
            perm, cluster_cent, cluster_assign = _cluster_permutation(
                vectors,
                k=self.config.index.ivf_clusters if want_ivf else 0,
            )
            _mark("cluster_s")
            vectors = vectors[perm]
            docs = [docs[i] for i in perm]
            if paths is not None:
                paths = [paths[i] for i in perm]
            if metas is not None:
                metas = [metas[i] for i in perm]
            if want_ivf and self.mesh is None:
                # reserve IVF slice overhang INSIDE the dense capacity so
                # the IVF chunk slices never clamp on the shared buffer
                C = len(cluster_cent)
                self.dense.reserve_rows = (
                    self.config.index.ivf_chunk_cap
                    or max(8, (4 * len(docs)) // max(C, 1)))
        # bulk BM25 tokenization: one native C call for the whole corpus
        # (token hashes, no Python token strings — the <=100 us/doc path);
        # falls back to Python extract_tokens without the library
        hash_data = token_lists = None
        try:
            from hybridsearch_tpu.text.extractor import STOP_HASHES
            from hybridsearch_tpu.text.native import token_hashes_docs

            hashes, counts = token_hashes_docs(docs, STOP_HASHES)
            hash_data = (hashes, counts)
            tok_counts = [int(c) for c in counts]
        except ImportError:
            token_lists = [extract_tokens(d) for d in docs]
            tok_counts = [len(t) for t in token_lists]
        _mark("tokenize_s")
        ids = self.store.replace_documents(docs, paths, tok_counts)
        if metas is not None:
            for did, m in zip(ids, metas):
                if m:
                    self.store.set_metadata(did, m)
        _mark("store_s")
        if vectors is None:
            vectors = self.embed(docs)
            _mark("embed_s")
        self.dense.build(vectors)
        _mark("dense_build_s")
        if self._want_ivf(len(vectors)):
            from hybridsearch_tpu.index.ivf import IVFIndex

            ivf = IVFIndex(
                dim=self.config.index.dim,
                n_clusters=self.config.index.ivf_clusters,
                nprobe=self.config.index.ivf_nprobe,
                chunk_cap=self.config.index.ivf_chunk_cap,
            )
            if cluster_cent is not None and self.mesh is None:
                # unified layout: the corpus is already cluster-ordered
                # and the dense snapshot already holds it normalized on
                # device — adopt that buffer (zero copies) and the one
                # k-means' centroids instead of re-fitting + re-uploading
                ivf.from_layout(self.dense._snap.docs, len(docs),
                                cluster_cent, cluster_assign)
            else:
                ivf.build(vectors)
            self.ivf = ivf
        _mark("ivf_s")
        self._align_bm25_shards()
        if hash_data is not None:
            self.bm25.fit_coo_from_hashes(*hash_data)
        else:
            self.bm25.fit_tokens(token_lists)
        _mark("bm25_s")
        self.contents = list(docs)
        self.doc_ids = ids
        return {"indexed": len(docs), "dim": self.config.index.dim,
                "timings_s": timings}

    def add_documents(
        self,
        documents: Sequence[str],
        paths: Optional[Sequence[Optional[str]]] = None,
        metas: Optional[Sequence[Optional[Dict]]] = None,
    ) -> List[int]:
        """Incremental add keeping dense AND sparse indexes live (fixes
        reference indexer.py:317-360's stale-FAISS inconsistency). BM25
        global stats (df, avg_len) change on add, so all eager weights are
        recomputed — vectorized over the cached COO (BM25.add_tokens),
        with only the NEW documents tokenized."""
        if not documents:
            return []
        docs = [preprocess_text(d) for d in documents]
        token_lists = [extract_tokens(d) for d in docs]
        ids = self.store.add_documents(docs, paths, [len(t) for t in token_lists])
        if metas is not None:
            for did, m in zip(ids, metas):
                if m:
                    self.store.set_metadata(did, m)
        vectors = self.embed(docs)
        self.dense.add(vectors)
        self.contents.extend(docs)
        self.doc_ids.extend(ids)
        self._align_bm25_shards()
        if (self.bm25._state.tf_cache is not None
                and self.bm25.n_docs == len(self.contents) - len(docs)):
            # O(new tokens) incremental path: extend the COO cache,
            # recompute eager weights vectorized
            self.bm25.add_tokens(token_lists)
        else:
            # no cache (state restored from disk) or counts diverged:
            # refit from the full corpus
            self.bm25.fit_tokens(
                [extract_tokens(c) for c in self.contents[: -len(docs)]]
                + token_lists
            )
        return ids

    def delete_documents(self, doc_ids: Sequence[int]) -> int:
        """Tombstone docs consistently across the dense index, the BM25
        postings, and the host store (DELETE /documents/{id}): deleted docs
        stop surfacing from every retrieval path immediately; compaction /
        the next full reindex reclaims space."""
        ids = [int(i) for i in doc_ids]
        self.dense.delete(ids)
        self.bm25.delete(ids)
        self.store.delete_documents(ids)
        return len(ids)

    def _want_ivf(self, n: int) -> bool:
        """The exact<->IVF policy. "flat" and "ivf" are explicit; "auto"
        builds the IVF coarse quantizer only above the measured crossover:
        the streaming exact kernel beats IVF up through at least 1M docs
        on one chip (benchmarks/bench_ivf.py round-2 sweep), so IVF earns
        its recall loss only at multi-million scale. Override the
        crossover with HST_IVF_AUTO_MIN_DOCS."""
        import os

        mode = self.config.index.ann
        if mode == "ivf":
            return n > 0
        if mode == "auto":
            return n >= int(os.environ.get("HST_IVF_AUTO_MIN_DOCS",
                                           "4000000"))
        return False

    def _align_bm25_shards(self) -> None:
        """Partition BM25 postings by the dense index's rows-per-shard so
        hybrid fusion runs shard-locally (parallel/collectives.py)."""
        if self.mesh is not None:
            from hybridsearch_tpu.parallel.mesh import DATA_AXIS

            shards = self.mesh.shape[DATA_AXIS]
            self.bm25.docs_per_shard = self.dense.capacity // shards

    def reload(self) -> int:
        """Rebuild in-memory state from the host store (re-embedding only if
        no persisted dense index is available)."""
        ids, contents = self.store.get_contents()
        self.contents = contents
        self.doc_ids = ids
        if contents:
            if self.dense.n_docs != len(contents):
                self.dense.build(self.embed(contents))
            self._align_bm25_shards()
            self.bm25.fit(contents)
            deleted = self.store.deleted_ids()
            if deleted:  # re-apply persisted tombstones to both arms
                self.dense.delete(deleted)
                self.bm25.delete(deleted)
        return len(contents)

    # -- persistence ---------------------------------------------------------------

    def save(self, directory: str) -> None:
        """Persist dense shards + engine manifest; docs/metadata live in the
        sqlite store at db_path (SURVEY §5.4 fix)."""
        os.makedirs(directory, exist_ok=True)
        self.dense.save(os.path.join(directory, "dense"))
        if self.bm25.postings is not None:
            self.bm25.save(os.path.join(directory, "bm25.npz"))
        manifest = {
            "engine": "hybridsearch_tpu",
            "encoder": getattr(self.encoder, "name", "unknown"),
            "dim": self.config.index.dim,
            "n_docs": len(self.contents),
            "db_path": self.db_path,
            "config": json.loads(self.config.to_json()),
        }
        with open(os.path.join(directory, "engine_manifest.json"), "w") as f:
            json.dump(manifest, f, indent=2)

    @classmethod
    def load(
        cls, directory: str, encoder=None, mesh=None, db_path: Optional[str] = None
    ) -> "Indexer":
        with open(os.path.join(directory, "engine_manifest.json")) as f:
            manifest = json.load(f)
        config = EngineConfig.from_dict(manifest.get("config", {}))
        idx = cls(
            db_path=db_path or manifest.get("db_path", ":memory:"),
            encoder=encoder,
            mesh=mesh,
            config=config,
        )
        idx.dense = DenseIndex.load(
            os.path.join(directory, "dense"), mesh=mesh,
            block_n=config.index.block_n,
        )
        ids, contents = idx.store.get_contents()
        idx.contents = contents
        idx.doc_ids = ids
        bm25_path = os.path.join(directory, "bm25.npz")
        if os.path.exists(bm25_path):
            idx.bm25.load(bm25_path)  # no tokenize+refit on reload
        elif contents:
            idx.bm25.fit(contents)
        deleted = idx.store.deleted_ids()
        if deleted:  # dense tombstones persist via bias.npy; BM25's do not
            idx.bm25.delete(deleted)
        return idx

    # -- export / import (reference cli.py:129-159) -----------------------------

    def export_json(self, path: str) -> None:
        import jax

        vecs = self.dense.get_vectors(list(range(self.dense.n_docs)))
        data = {
            "documents": self.contents,
            "doc_ids": self.doc_ids,
            "vectors": np.asarray(vecs).tolist(),
        }
        with open(path, "w") as f:
            json.dump(data, f)

    def import_json(self, path: str) -> int:
        with open(path) as f:
            data = json.load(f)
        docs = data["documents"]
        self.store.replace_documents(docs)
        vecs = np.asarray(data.get("vectors", []), dtype=np.float32)
        if len(vecs) == len(docs) and len(docs):
            self.dense.build(vecs)
        elif docs:
            self.dense.build(self.embed(docs))
        self.bm25.fit(docs)
        self.contents = list(docs)
        self.doc_ids = list(range(len(docs)))
        return len(docs)


def _cluster_permutation(
    vectors: np.ndarray, seed: int = 0, k: int = 0
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(perm, centroids, sorted_assign) ordering docs by spherical
    k-means cluster (device k-means from index/ivf.py; sqrt(N) clusters
    unless `k` pins it). Stable within clusters so equal-cluster docs
    keep source order. The centroids/assignment are returned so ONE
    k-means serves both the supertile layout and the IVF coarse
    quantizer (IVFIndex.from_layout) — the reference runs FAISS
    training separately from any layout decision."""
    import jax

    from hybridsearch_tpu.index.ivf import kmeans_assign, kmeans_fit

    import jax.numpy as jnp

    n = len(vectors)
    k = k or max(2, int(np.sqrt(n)))
    # Keep the corpus in its storage dtype; kmeans_fit/kmeans_assign
    # normalize per 16k-row block internally. An eager l2_normalize +
    # [N, k] similarity matrix here is ~126 GB at 10M docs (ADVICE r3).
    v = jnp.asarray(np.asarray(vectors))
    cent = kmeans_fit(v, k, seed=seed)
    assign = np.asarray(jax.device_get(kmeans_assign(v, cent)))
    perm = np.argsort(assign, kind="stable")
    return perm, np.asarray(cent), assign[perm]
