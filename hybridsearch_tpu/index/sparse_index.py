"""BM25 sparse (lexical) index.

API parity with the reference's BM25/BM25Plus (reference bm25.py:16-179:
fit / score / score_batch / search), re-designed for TPU: instead of
per-query Python dict loops, all (term, doc) contributions are eager-scored
at fit time (BM25S-style) into device-resident term-major CSR postings, and
a query is a padded term-id vector scored by ops/bm25.py's scatter-add
kernel. Per-query cost is O(sum of posting lengths) device work with no
host round-trips after query tokenization.
"""

from __future__ import annotations

from typing import List, NamedTuple, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from hybridsearch_tpu.ops import bm25 as bm25_ops
from hybridsearch_tpu.text.extractor import Vocabulary, extract_tokens

# Queries are padded to a small set of fixed widths to avoid XLA recompiles.
_QUERY_WIDTHS = (8, 16, 32, 64, 128)


class _BM25State(NamedTuple):
    """Immutable fitted state, published atomically so concurrent readers
    never see a vocab from one fit and postings from another (the atomic-
    snapshot-swap discipline used across the framework, SURVEY §5.2)."""

    vocab: Vocabulary
    postings: Optional[bm25_ops.BM25Postings]
    sharded: Optional[bm25_ops.ShardedBM25Postings]
    n_docs: int
    # host copy of per-term posting-run lengths (max local run when sharded)
    # used to bucket query terms by slice width (ops/bm25.py LENGTH_BUCKETS)
    term_runs: Optional[np.ndarray] = None
    # host COO tf cache (term_ids, doc_ids, counts, doc_lens) enabling
    # incremental add_tokens: new docs extend the triples and eager
    # weights recompute vectorized, with no re-tokenization of the old
    # corpus. With a delta segment pending, this covers the EPOCH (main)
    # corpus only; _DeltaSeg.tf holds the rest.
    tf_cache: Optional[tuple] = None
    # epoch-frozen global stats (df [V] int64, avg_len float, len_sum
    # float) captured at the last full publish — the incremental-add
    # fast path scores new docs under these instead of recomputing every
    # weight (adds were O(nnz); now O(delta) with bounded staleness)
    frozen: Optional[tuple] = None
    # pending delta segment (docs added since the epoch), scored
    # side-by-side with the main postings and folded in by compact()
    delta_seg: Optional["_DeltaSeg"] = None


class _DeltaSeg(NamedTuple):
    """Docs added since the last full weight recompute (the epoch).

    `tf` is the delta's own (term asc, doc asc)-sorted COO with GLOBAL
    doc ids; `postings` is a small CSR over just these docs (n_docs =
    global total so scatter shapes line up with the full corpus), whose
    weights were computed under the epoch-frozen stats. Old docs never
    appear here, so score(doc) = main arm + delta arm with exactly one
    arm nonzero per doc."""

    tf: tuple  # (t, d, c, doc_lens) — global doc ids, (term, doc)-sorted
    postings: bm25_ops.BM25Postings


class BM25:
    """Okapi BM25 with the reference's smoothed IDF (bm25.py:81)."""

    def save(self, path: str) -> None:
        """Persist eager postings + vocab so load() skips tokenize+refit."""
        import os

        state = self._compacted_state()
        if state.postings is None:
            raise ValueError("sharded or unfitted BM25 cannot be saved yet")
        os.makedirs(os.path.dirname(os.path.abspath(path)) or ".",
                    exist_ok=True)
        po = state.postings
        from hybridsearch_tpu.text.extractor import HashVocabulary

        if isinstance(state.vocab, HashVocabulary):
            vocab_field = {"vocab_hashes": np.asarray(state.vocab.id_to_hash,
                                                      dtype=np.uint64)}
        else:
            vocab_field = {"vocab": np.asarray(state.vocab.id_to_token,
                                               dtype=object)}
        np.savez_compressed(
            path,
            indptr=np.asarray(po.indptr),
            doc_ids=np.asarray(po.doc_ids),
            weights=np.asarray(po.weights),
            n_docs=po.n_docs,
            max_postings=po.max_postings,
            params=np.asarray([self.k1, self.b, self.delta]),
            variant=self.variant,
            **vocab_field,
        )

    def load(self, path: str) -> "BM25":
        data = np.load(path, allow_pickle=True)
        if "vocab_hashes" in data:
            from hybridsearch_tpu.text.extractor import HashVocabulary

            vocab = HashVocabulary.from_hashes(data["vocab_hashes"].tolist())
        else:
            vocab = Vocabulary()
            for tok in data["vocab"].tolist():
                vocab.add(str(tok))
        import jax.numpy as jnp

        indptr = data["indptr"].astype(np.int64)
        postings = bm25_ops.BM25Postings(
            indptr=jnp.asarray(indptr.astype(np.int32)),
            doc_ids=jnp.asarray(data["doc_ids"]),
            weights=jnp.asarray(data["weights"]),
            n_docs=int(data["n_docs"]),
            max_postings=int(data["max_postings"]),
            vocab_size=len(vocab),
            starts_host=indptr[:-1],
            lengths_host=indptr[1:] - indptr[:-1],
        )
        self.k1, self.b, self.delta = [float(x) for x in data["params"]]
        self._state = _BM25State(vocab, postings, None, postings.n_docs, None)
        return self

    variant = "bm25"

    def __init__(self, k1: float = 1.5, b: float = 0.75, delta: float = 1.0,
                 mesh=None) -> None:
        self.k1 = k1
        self.b = b
        self.delta = delta
        self.mesh = mesh
        # When set (by the Indexer), shard partitioning aligns with the
        # dense index's rows-per-shard so hybrid fusion runs shard-locally.
        self.docs_per_shard: Optional[int] = None
        self._state = _BM25State(Vocabulary(), None, None, 0, None)
        # Deleted doc ids, masked out of search() results (paired with the
        # dense index's tombstone bias so DELETE /documents/{id} is
        # consistent across BOTH arms; compaction/refit clears them).
        self._tombstones: set = set()

    # state accessors (read the snapshot once per operation for consistency)

    @property
    def vocab(self) -> Vocabulary:
        return self._state.vocab

    @property
    def postings(self):
        return self._state.postings

    @property
    def sharded(self):
        return self._state.sharded

    @property
    def n_docs(self) -> int:
        return self._state.n_docs

    # -- fit -------------------------------------------------------------

    def fit(self, corpus: Sequence[str]) -> "BM25":
        """Tokenize corpus, compute eager (term, doc) weights, upload CSR
        postings to device (reference fit: bm25.py:45-81)."""
        tokenized = [extract_tokens(t) for t in corpus]
        return self.fit_tokens(tokenized)

    @staticmethod
    def _encode_coo(tokenized, vocab, doc_base: int):
        """Vectorized (term, doc, count) COO for a batch of token lists.

        vocab ids need one dict op per token (new-token discovery is
        inherently sequential), but the per-doc tf aggregation is ONE
        vectorized unique over (doc, term) keys instead of per-doc dicts —
        measured ~2x on the 10M-doc bulk-index host path."""
        n_new = len(tokenized)
        doc_lens = np.array([len(t) for t in tokenized], dtype=np.float64)
        add = vocab.add
        flat_ids = np.fromiter(
            (add(t) for toks in tokenized for t in toks),
            dtype=np.int64,
            count=int(doc_lens.sum()),
        )
        doc_of = np.repeat(
            np.arange(doc_base, doc_base + n_new, dtype=np.int64),
            doc_lens.astype(np.int64),
        )
        V = max(len(vocab), 1)
        uniq, c_arr = np.unique(doc_of * V + flat_ids, return_counts=True)
        return uniq % V, uniq // V, c_arr.astype(np.float64), doc_lens

    def _publish_from_coo(self, vocab, t_arr, d_arr, c_arr, doc_lens,
                          presorted: bool = False):
        """Recompute eager weights over the full COO and atomically publish
        a new state (single-device or sharded).

        The COO is brought into (term asc, doc asc) order HERE — once per
        fit — and the tf cache stores it sorted, so incremental add_tokens
        can MERGE new triples in O(nnz) instead of re-lexsorting the whole
        corpus (at 10M docs that lexsort cost ~30 s per add)."""
        n_docs = len(doc_lens)
        if not presorted and len(t_arr):
            order = np.lexsort((d_arr, t_arr))
            t_arr, d_arr, c_arr = t_arr[order], d_arr[order], c_arr[order]
        df = np.zeros(len(vocab), dtype=np.int64)
        np.add.at(df, t_arr, 1)
        len_sum = float(doc_lens.sum())
        avg_len = max(len_sum / n_docs if n_docs else 1.0, 1e-9)
        weights = bm25_ops.compute_eager_weights(
            t_arr, d_arr, c_arr, doc_lens, n_docs, len(vocab),
            k1=self.k1, b=self.b, variant=self.variant, delta=self.delta,
            df=df, avg_len=avg_len,
        )
        tf_cache = (t_arr, d_arr, c_arr, doc_lens)
        frozen = (df, avg_len, len_sum)
        if self.mesh is not None and n_docs:
            from hybridsearch_tpu.parallel.mesh import DATA_AXIS

            n_shards = self.mesh.shape[DATA_AXIS]
            sharded = bm25_ops.build_sharded_postings(
                t_arr, d_arr, weights, n_docs, len(vocab),
                n_shards=n_shards, mesh=self.mesh,
                docs_per_shard=self.docs_per_shard,
            )
            # per-term max local run across shards (slice-width bucketing)
            runs = np.zeros(len(vocab) + 1, dtype=np.int64)
            per = sharded.docs_per_shard
            shard_of = d_arr // per
            for sidx in range(n_shards):
                local = np.bincount(t_arr[shard_of == sidx],
                                    minlength=len(vocab) + 1)
                np.maximum(runs, local, out=runs)
            new_state = _BM25State(vocab, None, sharded, n_docs, runs,
                                   tf_cache=tf_cache, frozen=frozen)
        else:
            postings = bm25_ops.build_postings_arrays(
                t_arr, d_arr.astype(np.int32), weights, n_docs, len(vocab),
                presorted=True,
            )
            runs = np.bincount(t_arr, minlength=len(vocab) + 1)
            new_state = _BM25State(vocab, postings, None, n_docs, runs,
                                   tf_cache=tf_cache, frozen=frozen)
        self._state = new_state  # atomic publish

    def fit_tokens(self, tokenized: Sequence[Sequence[str]]) -> "BM25":
        vocab = Vocabulary()
        t_arr, d_arr, c_arr, doc_lens = self._encode_coo(tokenized, vocab, 0)
        self._publish_from_coo(vocab, t_arr, d_arr, c_arr, doc_lens)
        self._tombstones = set()  # a refit defines a fresh corpus
        return self

    def fit_hashes(self, texts: Sequence[str]) -> "BM25":
        """Bulk fit via the native batch tokenizer+hasher: one C call per
        corpus, term identity = stable 64-bit token hash, tf aggregation
        one vectorized unique — no per-token Python, no token strings
        (the <=100 us/doc bulk-index path). Queries keep working through
        HashVocabulary's string-facing encode. Raises ImportError when the
        native library is unavailable (callers fall back to fit)."""
        from hybridsearch_tpu.text.extractor import STOP_HASHES
        from hybridsearch_tpu.text.native import token_hashes_docs

        hashes, counts = token_hashes_docs(list(texts), STOP_HASHES)
        return self.fit_coo_from_hashes(hashes, counts)

    def fit_coo_from_hashes(self, hashes: np.ndarray,
                            counts: np.ndarray) -> "BM25":
        """Publish a fitted state from pre-computed per-doc token hashes
        (contiguous `hashes`, per-doc `counts`)."""
        from hybridsearch_tpu.text.extractor import HashVocabulary

        doc_lens = counts.astype(np.float64)
        doc_of = np.repeat(np.arange(len(counts), dtype=np.int64),
                           counts.astype(np.int64))
        uniq_hashes, term_of = np.unique(hashes, return_inverse=True)
        vocab = HashVocabulary.from_hashes(uniq_hashes)
        V = max(len(vocab), 1)
        key = doc_of * V + term_of
        uniq, c_arr = np.unique(key, return_counts=True)
        self._publish_from_coo(vocab, uniq % V, uniq // V,
                               c_arr.astype(np.float64), doc_lens)
        self._tombstones = set()
        return self

    # Delta-segment drift bounds: the epoch-frozen stats serve until the
    # delta grows past 1% of the epoch corpus (or 64 docs for tiny
    # corpora) or avg_len drifts 1% — then the next add folds everything
    # into a full recompute. Staleness is therefore bounded: every main
    # weight is at most one threshold-trip away from its exact value.
    DELTA_MAX_FRAC = 0.01
    DELTA_MIN_DOCS = 64
    AVG_LEN_DRIFT = 0.01

    def add_tokens(self, tokenized: Sequence[Sequence[str]]) -> "BM25":
        """Incremental add: O(new tokens) host work. New docs join a small
        DELTA segment scored side-by-side with the epoch postings, with
        weights computed under the epoch-frozen global stats (df,
        avg_len) — the O(nnz) full-corpus weight recompute (176 ms per
        1-doc add at 300k docs, VERDICT r3 weak #6) only runs when the
        drift bounds trip or an at-scale consumer compacts. The old
        corpus is never re-tokenized (the reference's add_documents
        leaves its FAISS index stale, reference indexer.py:317-360; here
        BOTH indexes stay live). Requires a fitted state with a tf
        cache; raises otherwise."""
        state = self._state
        if state.tf_cache is None:
            raise ValueError(
                "add_tokens needs the COO cache from fit_tokens "
                "(states restored via load() must refit to add)"
            )
        # copy-on-write vocab: concurrent readers of the OLD snapshot must
        # never see term ids beyond their postings' vocab_size
        vocab = state.vocab.copy()
        t1, d1, c1, l1 = self._encode_coo(tokenized, vocab, state.n_docs)
        order = np.lexsort((d1, t1))
        t1, d1, c1 = t1[order], d1[order], c1[order]
        if (
            self.mesh is None
            and state.sharded is None
            and state.postings is not None
            and state.frozen is not None
        ):
            if self._publish_delta(state, vocab, t1, d1, c1, l1):
                return self
        # Full path (first fit lacked frozen stats, mesh mode, or the
        # drift bounds tripped): fold any pending delta plus the new
        # docs into the cached COO and republish with fresh stats.
        # O(new + nnz) sorted merge: the cached COO is (term, doc)-sorted
        # (publish invariant) and every new doc id exceeds every old one,
        # so sorting just the NEW triples and inserting each at its term
        # run's end preserves the global order — no corpus-wide lexsort
        t0, d0, c0, l0 = state.tf_cache
        if state.delta_seg is not None:
            dt, dd, dc, dl = state.delta_seg.tf
            # delta doc ids all precede the new docs' ids, so a lexsort
            # of the SMALL combined set keeps the merge invariant
            t1 = np.concatenate([dt, t1])
            d1 = np.concatenate([dd, d1])
            c1 = np.concatenate([dc, c1])
            l1 = np.concatenate([dl, l1])
            order = np.lexsort((d1, t1))
            t1, d1, c1 = t1[order], d1[order], c1[order]
        pos = np.searchsorted(t0, t1, side="right")
        self._publish_from_coo(
            vocab,
            np.insert(t0, pos, t1),
            np.insert(d0, pos, d1),
            np.insert(c0, pos, c1),
            np.concatenate([l0, l1]),
            presorted=True,
        )
        return self

    def _publish_delta(self, state, vocab, t1, d1, c1, l1) -> bool:
        """Try the O(delta) add: merge the new (term, doc)-sorted triples
        into the pending delta segment, weight them under the epoch-
        frozen stats, and publish. Returns False when a drift bound
        trips (caller then does the full recompute)."""
        df_e, avg_e, len_sum_e = state.frozen
        n_epoch = state.postings.n_docs
        if state.delta_seg is not None:
            dt, dd, dc, dl = state.delta_seg.tf
            pos = np.searchsorted(dt, t1, side="right")
            dt = np.insert(dt, pos, t1)
            dd = np.insert(dd, pos, d1)
            dc = np.insert(dc, pos, c1)
            dl = np.concatenate([dl, l1])
        else:
            dt, dd, dc, dl = t1, d1, c1, l1
        n_delta = len(dl)
        avg_now = (len_sum_e + float(dl.sum())) / max(n_epoch + n_delta, 1)
        if (
            n_delta > max(self.DELTA_MIN_DOCS,
                          int(n_epoch * self.DELTA_MAX_FRAC))
            or abs(avg_now - avg_e) > self.AVG_LEN_DRIFT * max(avg_e, 1e-9)
        ):
            return False
        v_new = len(vocab)
        df_eff = np.zeros(v_new, dtype=np.int64)
        df_eff[: len(df_e)] = df_e
        if v_new > len(df_e):  # epoch df is 0 for brand-new terms: use
            new_terms = dt[dt >= len(df_e)]  # the delta's own df instead
            np.add.at(df_eff, new_terms, 1)
        # weights under the FROZEN stats: doc ids remapped to delta-local
        # space for the doc_lens gather; idf from (df_eff, n_epoch)
        w = bm25_ops.compute_eager_weights(
            dt, dd - n_epoch, dc, dl, n_epoch, v_new,
            k1=self.k1, b=self.b, variant=self.variant, delta=self.delta,
            df=df_eff, avg_len=avg_e,
        )
        total = n_epoch + n_delta
        po_d = bm25_ops.build_postings_arrays(
            dt, dd.astype(np.int32), w, total, v_new, presorted=True,
        )
        self._state = _BM25State(  # atomic publish
            vocab, state.postings, None, total, state.term_runs,
            tf_cache=state.tf_cache, frozen=state.frozen,
            delta_seg=_DeltaSeg(tf=(dt, dd, dc, dl), postings=po_d),
        )
        return True

    def compact(self) -> "BM25":
        """Fold the pending delta segment into the main postings with a
        full stats recompute. At-scale consumers (impact/supertile
        builders, save, the hybrid searcher) call this on entry so their
        structures always cover the whole corpus exactly."""
        state = self._state
        if state.delta_seg is None:
            return self
        t0, d0, c0, l0 = state.tf_cache
        dt, dd, dc, dl = state.delta_seg.tf
        pos = np.searchsorted(t0, dt, side="right")
        self._publish_from_coo(
            state.vocab,
            np.insert(t0, pos, dt),
            np.insert(d0, pos, dd),
            np.insert(c0, pos, dc),
            np.concatenate([l0, dl]),
            presorted=True,
        )
        return self

    def _compacted_state(self, state: Optional[_BM25State] = None):
        """Snapshot with no pending delta (compacting first if needed)."""
        state = state if state is not None else self._state
        if state.delta_seg is not None:
            self.compact()
            state = self._state
        return state

    # -- deletion ------------------------------------------------------------

    def delete(self, doc_ids: Sequence[int]) -> None:
        """Tombstone docs: they stop surfacing from search(). Postings and
        global stats (df, avg_len) are untouched until the next fit — the
        same reclaim-on-compact contract as DenseIndex.delete."""
        tombs = set(self._tombstones)
        tombs.update(int(i) for i in doc_ids)
        self._tombstones = tombs  # atomic publish (replace, never mutate)

    # -- query encoding ----------------------------------------------------

    def encode_queries_bucketed(
        self, queries: Sequence[str], state: Optional[_BM25State] = None
    ):
        """Encode queries into per-bucket posting-run pieces
        (ops/bm25.py encode_run_pieces[_sharded]): stable compile shapes,
        long runs split, one hot term never widens other terms' slices."""
        state = state or self._state
        term_id_lists = [state.vocab.encode(extract_tokens(q)) for q in queries]
        if state.sharded is not None:
            sh = state.sharded
            return bm25_ops.encode_run_pieces_sharded(
                sh.starts_host, sh.lengths_host, term_id_lists,
                sh.max_postings,
            )
        if state.postings is not None:
            po = state.postings
            if state.delta_seg is not None:
                # terms born in the delta have no epoch run — their
                # contributions come from the delta postings
                term_id_lists = [[t for t in ids if t < po.vocab_size]
                                 for ids in term_id_lists]
            return bm25_ops.encode_run_pieces(
                po.starts_host, po.lengths_host, term_id_lists,
                po.max_postings,
            )
        return []

    # -- impact-pruned tier (ops/impact.py) --------------------------------

    def impact_postings(self, p_max: int = 4096, state=None):
        """Lazily build (and cache per fitted state) the impact-ordered
        pruned tier used by the at-scale hybrid (ops/hybrid.py
        hybrid_impact_topk). Rebuilt automatically after a refit.

        Pass `state` to build against an already-captured snapshot (the
        copy-on-write discipline: one snapshot per operation). A pending
        delta segment compacts first: at-scale structures always cover
        the whole corpus exactly."""
        state = self._compacted_state(state)
        if state.postings is None:
            return None
        cached = getattr(self, "_impact_cache", None)
        if cached is not None and cached[0] is state and cached[1] >= p_max:
            return cached[2]
        from hybridsearch_tpu.ops.impact import (
            build_impact_postings,
            default_align,
        )

        po = state.postings
        nnz = int(po.indptr[-1]) if po.indptr.shape[0] else 0
        doc_ids = np.asarray(po.doc_ids[:nnz])
        weights = np.asarray(po.weights[:nnz])
        term_ids = np.repeat(
            np.arange(po.vocab_size, dtype=np.int64),
            np.asarray(state.term_runs[: po.vocab_size])
            if state.term_runs is not None
            else np.diff(np.asarray(po.indptr)),
        )
        imp = build_impact_postings(
            term_ids, doc_ids, weights, po.n_docs, po.vocab_size,
            p_max=p_max, align=default_align(),
        )
        self._impact_cache = (state, p_max, imp)  # atomic publish
        return imp

    def super_postings(self, state=None, super_tiles: int = 128):
        """Lazily build (and cache per fitted state) the supertile lexical
        structures for the scatter-free exact-resident hybrid
        (ops/supertile.py hybrid_supertile_topk): the dense per-term
        supertile-maximum table plus the full doc-sorted CSR reshaped to
        gather-friendly rows. Rebuilt automatically after a refit; a
        pending delta segment compacts first."""
        state = self._compacted_state(state)
        if state.postings is None:
            return None
        cached = getattr(self, "_super_cache", None)
        if cached is not None and cached[0] is state:
            return cached[1]
        from hybridsearch_tpu.ops.supertile import build_super_postings

        po = state.postings
        nnz = int(po.indptr[-1]) if po.indptr.shape[0] else 0
        term_ids = np.repeat(
            np.arange(po.vocab_size, dtype=np.int64),
            np.asarray(state.term_runs[: po.vocab_size])
            if state.term_runs is not None
            else np.diff(np.asarray(po.indptr)),
        )
        sp = build_super_postings(
            term_ids, np.asarray(po.doc_ids[:nnz]),
            np.asarray(po.weights[:nnz]), po.n_docs, po.vocab_size,
            super_tiles=super_tiles,
        )
        self._super_cache = (state, sp)  # atomic publish
        return sp

    def super_postings_sharded(self, state=None, super_tiles: int = 128):
        """Per-shard supertile structures (+ mesh-placed device arrays)
        for the collective supertile path (parallel/collectives.py
        sharded_supertile_topk). Returns (ShardedSuperPostings, placed)
        or None without a sharded fit. Cached per state snapshot."""
        state = self._compacted_state(state)
        sh = state.sharded
        if sh is None or state.tf_cache is None or self.mesh is None:
            return None
        cached = getattr(self, "_super_shard_cache", None)
        if cached is not None and cached[0] is state:
            return cached[1]
        import jax
        from jax.sharding import NamedSharding, PartitionSpec as P

        from hybridsearch_tpu.ops import bm25 as bm25_ops
        from hybridsearch_tpu.ops.supertile import (
            build_super_postings_sharded,
        )
        from hybridsearch_tpu.parallel.mesh import DATA_AXIS

        t_arr, d_arr, c_arr, doc_lens = state.tf_cache  # sorted at publish
        w = bm25_ops.compute_eager_weights(
            t_arr, d_arr, c_arr, doc_lens, state.n_docs, len(state.vocab),
            k1=self.k1, b=self.b, variant=self.variant, delta=self.delta,
        )
        n_shards = self.mesh.shape[DATA_AXIS]
        ssp = build_super_postings_sharded(
            t_arr, d_arr, w, state.n_docs, len(state.vocab),
            docs_per_shard=sh.docs_per_shard, n_shards=n_shards,
            super_tiles=super_tiles,
        )
        spec = NamedSharding(self.mesh, P(DATA_AXIS, None, None))
        placed = tuple(jax.device_put(a, spec) for a in (
            ssp.sup_max, ssp.sup_pos, ssp.ids_rows, ssp.ws_rows))
        out = (ssp, placed)
        self._super_shard_cache = (state, out)  # atomic publish
        return out

    def encode_queries_super(self, queries: Sequence[str]):
        """(SuperPostings, SuperQueryEnc) for hybrid_supertile_topk — one
        state snapshot for both (copy-on-write discipline, ADVICE r2)."""
        from hybridsearch_tpu.ops.supertile import encode_super_queries

        state = self._state
        sp = self.super_postings(state=state)
        if sp is None:
            return None, None
        term_id_lists = [state.vocab.encode(extract_tokens(q))
                         for q in queries]
        return sp, encode_super_queries(sp, term_id_lists)

    def encode_queries_impact(self, queries: Sequence[str], p_depth: int,
                              p_max: int = 4096):
        """(ImpactPostings, ImpactQueryEnc) for hybrid_impact_topk. The
        enc carries hot descriptors into the FULL postings so the margin
        correction can make truncated-term candidate scores exact.

        Everything — vocab, impact tier, hot descriptors, and the
        enc.full_postings arrays the hot descriptors index into — derives
        from ONE state snapshot captured at entry, so a concurrent
        add_tokens/refit can never pair a new vocab with old postings
        (term-id overflow) or new hot starts with old CSR arrays (wrong
        bisection scores)."""
        from hybridsearch_tpu.ops.impact import encode_impact_queries

        state = self._state
        imp = self.impact_postings(p_max=p_max, state=state)
        if imp is None:
            return None, None
        po = state.postings
        term_id_lists = [state.vocab.encode(extract_tokens(q))
                         for q in queries]
        enc = encode_impact_queries(
            imp, term_id_lists, p_depth=p_depth,
            full_starts=po.starts_host, full_lengths=po.lengths_host,
        )
        return imp, enc._replace(full_postings=(po.doc_ids, po.weights))

    def encode_queries_sparse(
        self, queries: Sequence[str], state: Optional[_BM25State] = None
    ):
        """(groups, hot) for the sparse-correction hybrid (ops/hybrid.py):
        run pieces with hot terms EXCLUDED, plus the hot-term arrays
        (tile-bound table rows + run starts/lengths for bisection) from
        encode_hot_terms. hot is None when no query touches a hot term."""
        state = self._compacted_state(state)
        if state.postings is None:
            return [], None
        po = state.postings
        term_id_lists = [state.vocab.encode(extract_tokens(q)) for q in queries]
        hot = bm25_ops.encode_hot_terms(po, term_id_lists)
        exclude = None
        if hot is not None:
            exclude = set(np.flatnonzero(po.hot_rows_of >= 0).tolist())
        groups = bm25_ops.encode_run_pieces(
            po.starts_host, po.lengths_host, term_id_lists,
            po.max_postings, exclude=exclude,
        )
        return groups, hot

    def _encode_queries(self, queries: Sequence[str]) -> jnp.ndarray:
        """Token-id encode + pad to a bucketed width (pad id = vocab_size,
        an empty posting run)."""
        id_lists = [
            self.vocab.encode(extract_tokens(q)) or [] for q in queries
        ]
        longest = max((len(x) for x in id_lists), default=1)
        width = next((w for w in _QUERY_WIDTHS if w >= longest), None)
        if width is None:  # very long query: truncate to the widest bucket
            width = _QUERY_WIDTHS[-1]
            id_lists = [x[:width] for x in id_lists]
        pad = len(self.vocab)
        out = np.full((len(queries), width), pad, dtype=np.int32)
        for i, ids in enumerate(id_lists):
            out[i, : len(ids)] = ids
        return jnp.asarray(out)

    # -- scoring -------------------------------------------------------------

    def score_all(self, query: str) -> np.ndarray:
        """Dense [n_docs] score vector for one query."""
        if self.n_docs == 0 or (self.postings is None and self.sharded is None):
            return np.zeros((0,), dtype=np.float32)
        return self.batch_scores([query])[0]

    def score(self, query: str, doc_idx: int) -> float:
        """Single (query, doc) score (reference bm25.py:83-112)."""
        return float(self.score_all(query)[doc_idx])

    def score_batch(self, query: str, doc_indices: Sequence[int]) -> List[float]:
        """Scores for a candidate subset (reference bm25.py:114-127)."""
        full = self.score_all(query)
        return [float(full[i]) for i in doc_indices]

    def candidate_scores(self, query: str, candidates: np.ndarray) -> np.ndarray:
        """[C] scores at candidate doc ids (funnel stage 2); -1 ids -> 0.
        Exact: gathered from full scoring."""
        if self.n_docs == 0:
            return np.zeros(len(candidates), dtype=np.float32)
        state = self._state
        if state.postings is not None:
            groups = self.encode_queries_bucketed([query], state)
            import jax.numpy as jnp

            cand = jnp.asarray(np.asarray(candidates, np.int32)[None, :])
            out = np.zeros(len(candidates), dtype=np.float32)
            if groups:
                out = out + np.asarray(bm25_ops.bm25_candidate_scores_runs(
                    state.postings, groups, cand))[0]
            if state.delta_seg is not None:
                groups_d = self._delta_groups([query], state)
                if groups_d:
                    out = out + np.asarray(
                        bm25_ops.bm25_candidate_scores_runs(
                            state.delta_seg.postings, groups_d, cand))[0]
            return out.astype(np.float32)
        full = self.score_all(query)
        cand = np.asarray(candidates)
        safe = np.clip(cand, 0, self.n_docs - 1)
        out = full[safe]
        return np.where(cand >= 0, out, 0.0).astype(np.float32)

    def search(self, query: str, top_k: int = 10) -> List[Tuple[int, float]]:
        """Top-k (doc_idx, score), excluding zero scores like the reference
        search (bm25.py:129-158 only returns docs with positive scores)."""
        if self.n_docs == 0:
            return []
        tombs = self._tombstones
        k = min(top_k + len(tombs), self.n_docs)
        state = self._state
        if state.sharded is not None:
            groups = self.encode_queries_bucketed([query], state)
            if not groups:
                return []
            vals, idxs = bm25_ops.sharded_bm25_topk(self.mesh, state.sharded,
                                                    groups, k)
            vals, idxs = np.asarray(vals)[0], np.asarray(idxs)[0]
            return [(int(i), float(v)) for v, i in zip(vals, idxs)
                    if i >= 0 and v > 0.0 and int(i) not in tombs][:top_k]
        scores = self.score_all(query)
        if scores.size == 0:
            return []
        idx = np.argsort(-scores, kind="stable")[:k]
        return [(int(i), float(scores[i])) for i in idx
                if scores[i] > 0.0 and int(i) not in tombs][:top_k]

    def batch_scores(self, queries: Sequence[str]) -> np.ndarray:
        """[B, n_docs] scores for a query batch — the batched device path the
        reference lacks (its /search/batch is a Python loop, api.py:420-447).

        With a pending delta segment, main and delta postings are scored
        separately and summed: a doc lives in exactly one segment, so the
        sum IS its score (under the epoch-frozen stats)."""
        if self.n_docs == 0 or (self.postings is None and self.sharded is None):
            return np.zeros((len(queries), 0), dtype=np.float32)
        state = self._state
        groups = self.encode_queries_bucketed(list(queries), state)
        if state.sharded is not None:
            if not groups:
                return np.zeros((len(queries), state.n_docs),
                                dtype=np.float32)
            full = bm25_ops.sharded_bm25_scores(self.mesh, state.sharded,
                                                groups)
            return np.asarray(full)[:, : state.n_docs]
        B = len(queries)
        if groups:
            main = np.asarray(
                bm25_ops.bm25_scores_bucketed(state.postings, groups,
                                              batch=B)
            )
        else:
            main = np.zeros((B, state.postings.n_docs), dtype=np.float32)
        seg = state.delta_seg
        if seg is None:
            return main
        out = np.zeros((B, state.n_docs), dtype=np.float32)
        out[:, : main.shape[1]] = main[:, : state.n_docs]
        groups_d = self._delta_groups(queries, state)
        if groups_d:
            out += np.asarray(
                bm25_ops.bm25_scores_bucketed(seg.postings, groups_d,
                                              batch=B)
            )[:, : state.n_docs]
        return out

    def _delta_groups(self, queries: Sequence[str], state: _BM25State):
        """Run-piece groups against the delta segment's postings."""
        seg = state.delta_seg
        po = seg.postings
        term_id_lists = [state.vocab.encode(extract_tokens(q))
                         for q in queries]
        return bm25_ops.encode_run_pieces(
            po.starts_host, po.lengths_host, term_id_lists, po.max_postings,
        )


class BM25Plus(BM25):
    """BM25+ — adds delta inside the per-term sum for matching docs
    (reference bm25.py:160-179)."""

    variant = "bm25plus"
