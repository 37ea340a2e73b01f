"""BM25 sparse scoring kernels.

TPU-native replacement for the reference's pure-Python dict-loop BM25
(reference bm25.py:83-127, O(docs × query-terms) dict lookups per query).

Design (BM25S-style eager scoring, see PAPERS.md):
  At index build time, the full BM25 contribution of every (term, doc) pair
  is precomputed:
      w(t, d) = idf(t) * tf * (k1 + 1) / (tf + k1 * (1 - b + b * len_d / avg_len))
  with the reference's smoothed idf(t) = log((N - df + 0.5) / (df + 0.5) + 1)
  (reference bm25.py:76-81, formula bm25.py:107-110). Query scoring is then
  just a sum of per-term posting rows — no per-query tf math.

  The postings live device-resident in term-major CSR:
      indptr  [V+1] int32
      doc_ids [nnz_padded] int32  (padded tail = N, dropped by scatter)
      weights [nnz_padded] float32
  A query is a fixed-width vector of term ids [T_max] (pad = V). Scoring
  scans query terms, dynamic-slices each posting run (static max length,
  masked), and scatter-adds into a dense [N] score vector on device.

BM25+ adds `delta` inside the per-term sum for docs containing the term
(reference bm25.py:160-179): folded into w(t, d) at build time.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class BM25Postings(NamedTuple):
    """Device-resident eager-scored postings (term-major CSR)."""

    indptr: jax.Array  # [V+1] int32 — start offset of each term's run
    doc_ids: jax.Array  # [nnz + P_max] int32 — padded tail = n_docs
    weights: jax.Array  # [nnz + P_max] float32 — padded tail = 0
    n_docs: int  # static
    max_postings: int  # static: longest posting run (slice width)
    vocab_size: int  # static


def build_postings_arrays(
    term_ids: np.ndarray,
    doc_ids: np.ndarray,
    weights: np.ndarray,
    n_docs: int,
    vocab_size: int,
) -> BM25Postings:
    """Host-side CSR build from COO (term, doc, weight) triples.

    The arrays are padded by max_postings so a dynamic_slice of static width
    starting at any indptr[t] never reads out of bounds.
    """
    order = np.argsort(term_ids, kind="stable")
    t = term_ids[order].astype(np.int64)
    d = doc_ids[order].astype(np.int32)
    w = weights[order].astype(np.float32)
    indptr = np.zeros(vocab_size + 1, dtype=np.int64)
    np.add.at(indptr, t + 1, 1)
    indptr = np.cumsum(indptr)
    max_post = int((indptr[1:] - indptr[:-1]).max()) if len(t) else 1
    max_post = max(max_post, 1)
    pad = max_post
    d_pad = np.concatenate([d, np.full(pad, n_docs, dtype=np.int32)])
    w_pad = np.concatenate([w, np.zeros(pad, dtype=np.float32)])
    return BM25Postings(
        indptr=jnp.asarray(indptr.astype(np.int32)),
        doc_ids=jnp.asarray(d_pad),
        weights=jnp.asarray(w_pad),
        n_docs=n_docs,
        max_postings=max_post,
        vocab_size=vocab_size,
    )


@functools.partial(jax.jit, static_argnames=("n_docs", "max_postings"))
def _bm25_scores_impl(
    indptr: jax.Array,
    doc_ids: jax.Array,
    weights: jax.Array,
    query_terms: jax.Array,
    n_docs: int,
    max_postings: int,
) -> jax.Array:
    """Dense [B, n_docs] BM25 scores for padded query-term-id batches.

    query_terms: [B, T_max] int32, pad slots = vocab_size (their posting run
    is empty because indptr[V] == indptr[V+1]... pad uses a zero-length run).
    """
    iota = jax.lax.broadcasted_iota(jnp.int32, (1, max_postings), 1)[0]

    def score_one(qt: jax.Array) -> jax.Array:
        def body(scores, t):
            start = indptr[t]
            length = indptr[t + 1] - start
            ids = jax.lax.dynamic_slice(doc_ids, (start,), (max_postings,))
            ws = jax.lax.dynamic_slice(weights, (start,), (max_postings,))
            valid = iota < length
            ids = jnp.where(valid, ids, n_docs)  # out-of-range => dropped
            ws = jnp.where(valid, ws, 0.0)
            scores = scores.at[ids].add(ws, mode="drop")
            return scores, None

        init = jnp.zeros((n_docs,), dtype=jnp.float32)
        scores, _ = jax.lax.scan(body, init, qt)
        return scores

    return jax.vmap(score_one)(query_terms)


def bm25_scores(postings: BM25Postings, query_terms: jax.Array) -> jax.Array:
    """Dense [B, N] BM25 scores (device). query_terms [B, T_max] int32 padded
    with postings.vocab_size (a reserved empty term)."""
    qt = jnp.clip(query_terms, 0, postings.vocab_size)
    return _bm25_scores_impl(
        postings.indptr,
        postings.doc_ids,
        postings.weights,
        qt,
        postings.n_docs,
        postings.max_postings,
    )


@functools.partial(jax.jit, static_argnames=("k",))
def bm25_topk(scores: jax.Array, k: int) -> Tuple[jax.Array, jax.Array]:
    """Top-k over dense BM25 scores (reference bm25.py:129-158 search)."""
    return jax.lax.top_k(scores, k)


def bm25_candidate_scores(
    postings: BM25Postings, query_terms: jax.Array, candidates: jax.Array
) -> jax.Array:
    """BM25 scores gathered at candidate doc ids: [B, C].

    Used by the multi-stage funnel's stage 2 (reference pipelines.py:484-487
    scores BM25 on the 100 stage-1 candidates only). Exact: gathers from the
    full score vector, so values match full scoring bit-for-bit.
    """
    full = bm25_scores(postings, query_terms)  # [B, N]
    safe = jnp.clip(candidates, 0, postings.n_docs - 1)
    gathered = jnp.take_along_axis(full, safe, axis=1)
    return jnp.where(candidates >= 0, gathered, 0.0)


def compute_eager_weights(
    tf_term_ids: np.ndarray,
    tf_doc_ids: np.ndarray,
    tf_counts: np.ndarray,
    doc_lens: np.ndarray,
    n_docs: int,
    vocab_size: int,
    k1: float = 1.5,
    b: float = 0.75,
    variant: str = "bm25",
    delta: float = 1.0,
) -> np.ndarray:
    """Host-side eager weight computation from COO tf triples.

    idf uses the reference's smoothing: log((N - df + 0.5)/(df + 0.5) + 1)
    (reference bm25.py:81). BM25+ adds delta inside the per-term sum
    (reference bm25.py:177).
    """
    df = np.zeros(vocab_size, dtype=np.int64)
    np.add.at(df, tf_term_ids, 1)
    idf = np.log((n_docs - df + 0.5) / (df + 0.5) + 1.0)
    avg_len = float(doc_lens.mean()) if n_docs else 1.0
    avg_len = max(avg_len, 1e-9)
    tf = tf_counts.astype(np.float64)
    len_norm = k1 * (1.0 - b + b * doc_lens[tf_doc_ids] / avg_len)
    comp = tf * (k1 + 1.0) / (tf + len_norm)
    if variant == "bm25plus":
        comp = comp + delta
    return (idf[tf_term_ids] * comp).astype(np.float32)
