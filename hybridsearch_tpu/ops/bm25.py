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
from typing import List, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class BM25Postings(NamedTuple):
    """Device-resident eager-scored postings (term-major CSR).

    Terms whose posting run exceeds LENGTH_BUCKETS[-1] ("hot" terms — the
    stopword-grade tail the reference's 55-word English stopword list
    cannot catch in other languages or codebases) additionally carry a
    precomputed per-128-doc-tile weight-sum row (hot_tile_bounds), so the
    sparse-correction hybrid (ops/hybrid.py) never gathers their
    multi-million-entry runs at query time: tile bounds come from one row
    gather, and exact candidate scores from in-place bisection over the
    run (no materialized slice)."""

    indptr: jax.Array  # [V+1] int32 — start offset of each term's run
    doc_ids: jax.Array  # [nnz + P_max] int32 — padded tail = n_docs
    weights: jax.Array  # [nnz + P_max] float32 — padded tail = 0
    n_docs: int  # static
    max_postings: int  # static: longest posting run (slice width)
    vocab_size: int  # static
    starts_host: Optional[np.ndarray] = None  # [V] host run starts
    lengths_host: Optional[np.ndarray] = None  # [V] host run lengths
    hot_rows_of: Optional[np.ndarray] = None  # [V] int32 host, -1 = cold
    hot_tile_bounds: Optional[jax.Array] = None  # [H+1, n_tiles] f32 (row H = 0)


HOT_DF_THRESHOLD = LENGTH_BUCKETS_MAX = 65536  # runs longer than this are hot
MAX_HOT_TERMS = 1024  # bound the [H+1, n_tiles] table; overflow stays cold


def build_postings_arrays(
    term_ids: np.ndarray,
    doc_ids: np.ndarray,
    weights: np.ndarray,
    n_docs: int,
    vocab_size: int,
    tile: int = 128,
    presorted: bool = False,
) -> BM25Postings:
    """Host-side CSR build from COO (term, doc, weight) triples.

    The arrays are padded by max_postings so a dynamic_slice of static width
    starting at any indptr[t] never reads out of bounds.

    presorted=True asserts the triples are ALREADY (term asc, doc asc)
    ordered and skips the O(nnz log nnz) lexsort — the incremental-add
    path maintains that order by merging (index/sparse_index.py).
    """
    if presorted:
        t = term_ids.astype(np.int64)
        d = doc_ids.astype(np.int32)
        w = weights.astype(np.float32)
    else:
        # lexsort: doc ascending WITHIN each term run — candidate scoring
        # does binary search over runs and requires this invariant
        order = np.lexsort((doc_ids, term_ids))
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

    # hot-term tile-bound table (query-time cost: one row gather per term)
    starts = indptr[:-1]
    lengths = indptr[1:] - indptr[:-1]
    hot_rows_of = np.full(vocab_size, -1, dtype=np.int32)
    hot_bounds = None
    hot_tids = np.flatnonzero(lengths > HOT_DF_THRESHOLD)
    if len(hot_tids):
        if len(hot_tids) > MAX_HOT_TERMS:  # keep the hottest; rest stay cold
            hot_tids = hot_tids[np.argsort(-lengths[hot_tids])[:MAX_HOT_TERMS]]
            hot_tids = np.sort(hot_tids)
        n_tiles = -(-n_docs // tile)
        hb = np.zeros((len(hot_tids) + 1, n_tiles), dtype=np.float32)
        for row, tid in enumerate(hot_tids):
            st, ln = int(starts[tid]), int(lengths[tid])
            hb[row] = np.bincount(
                d[st : st + ln] // tile, weights=w[st : st + ln],
                minlength=n_tiles,
            )[:n_tiles]
        hot_rows_of[hot_tids] = np.arange(len(hot_tids), dtype=np.int32)
        hot_bounds = jnp.asarray(hb)
    return BM25Postings(
        indptr=jnp.asarray(indptr.astype(np.int32)),
        doc_ids=jnp.asarray(d_pad),
        weights=jnp.asarray(w_pad),
        n_docs=n_docs,
        max_postings=max_post,
        vocab_size=vocab_size,
        starts_host=indptr[:-1].astype(np.int64),
        lengths_host=(indptr[1:] - indptr[:-1]).astype(np.int64),
        hot_rows_of=hot_rows_of,
        hot_tile_bounds=hot_bounds,
    )


# Posting-run length buckets: a query term is scored with slices as wide as
# its bucket, not the corpus-wide max run. Without this, one hot term (a
# stopword-like token with a multi-million-entry posting list) forces EVERY
# term's dynamic_slice to that width — measured 76 s/query-batch at 1M docs.
# Runs longer than the largest bucket are SPLIT into multiple pieces at
# query-encode time (the host holds the indptr), so the compiled program
# only ever sees these fixed widths. Term-count padding uses TERM_LADDER so
# the set of compiled (width, T) programs is small and stable — unstable
# shapes meant a fresh XLA compile per query batch (seconds each); with
# stable shapes the same scoring runs in <1 ms.
LENGTH_BUCKETS = (128, 1024, 8192, 65536)
assert LENGTH_BUCKETS[-1] == HOT_DF_THRESHOLD  # hot = beyond the top bucket
TERM_LADDER = (8, 32, 128, 256)
# Per-width cap on pieces per query: bounds the gather staging arrays to
# ~B * T_cap * W * 8 bytes. Overflow pieces are emitted as additional
# same-shaped groups (extra calls into the SAME compiled program).
# Finer buckets cut padding waste: every gathered/scattered element costs
# real scatter bandwidth even when masked, so a 200-entry run in a 4096
# bucket wasted 20x — measured ~2x end-to-end lexical speedup from this
# ladder vs (128, 4096, 65536).
T_CAPS = {128: 256, 1024: 64, 8192: 16, 65536: 8}


def bucket_width(run_len: int, cap: int) -> int:
    for w in LENGTH_BUCKETS:
        if run_len <= w:
            return min(w, cap)
    return LENGTH_BUCKETS[-1]


def _ladder(n: int, cap: int) -> int:
    for t in TERM_LADDER:
        if t >= n:
            return min(t, cap)
    return cap


def encode_run_pieces(
    starts_host: "np.ndarray",
    lengths_host: "np.ndarray",
    query_term_ids: Sequence[Sequence[int]],
    cap: int,
    exclude: Optional[set] = None,
) -> List[Tuple[int, jax.Array, jax.Array]]:
    """Host-side query encoding: term ids -> per-bucket (width,
    starts [B, T], lengths [B, T]) run pieces.

    Long posting runs are split into width-sized pieces so the device
    program never slices wider than LENGTH_BUCKETS[-1]; empty buckets are
    omitted; T pads to TERM_LADDER (bounded compile set). Terms in
    `exclude` (hot terms handled via the precomputed tile-bound table +
    bisection) are skipped.
    """
    B = len(query_term_ids)
    buckets: dict = {}
    for qi, ids in enumerate(query_term_ids):
        for tid in ids:
            if exclude and tid in exclude:
                continue
            start = int(starts_host[tid])
            remaining = int(lengths_host[tid])
            off = 0
            while remaining > 0:
                piece = min(remaining, LENGTH_BUCKETS[-1])
                w = bucket_width(piece, cap)
                buckets.setdefault(w, [[] for _ in range(B)])[qi].append(
                    (start + off, piece)
                )
                off += piece
                remaining -= piece
    out: List[Tuple[int, jax.Array, jax.Array]] = []
    for w in sorted(buckets):
        lists = buckets[w]
        longest = max((len(x) for x in lists), default=0)
        if longest == 0:
            continue
        t_cap = T_CAPS.get(w, TERM_LADDER[-1])
        # emit as many same-shaped chunks as needed (same compiled program)
        for chunk_start in range(0, longest, t_cap):
            chunk = [x[chunk_start : chunk_start + t_cap] for x in lists]
            c_longest = max((len(x) for x in chunk), default=0)
            if c_longest == 0:
                continue
            T = _ladder(c_longest, t_cap)
            s_arr = np.zeros((B, T), dtype=np.int32)
            l_arr = np.zeros((B, T), dtype=np.int32)
            for qi, pieces in enumerate(chunk):
                for j, (st, ln) in enumerate(pieces[:T]):
                    s_arr[qi, j] = st
                    l_arr[qi, j] = ln
            out.append((w, jnp.asarray(s_arr), jnp.asarray(l_arr)))
    return out


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

    Two phases so the scan never carries the [n_docs] score array (a naive
    scatter-in-scan copies B*n_docs floats per term — measured seconds per
    batch at 1M docs):
      1. scan over query terms GATHERING (doc_id, weight) posting runs into
         [B, T, W] staging arrays (carry-free);
      2. ONE batched scatter-add of all runs into the [B, n_docs] scores.
    """
    iota = jax.lax.broadcasted_iota(jnp.int32, (1, max_postings), 1)[0]

    def gather_one(qt: jax.Array):
        def body(_, t):
            start = indptr[t]
            length = indptr[t + 1] - start
            ids = jax.lax.dynamic_slice(doc_ids, (start,), (max_postings,))
            ws = jax.lax.dynamic_slice(weights, (start,), (max_postings,))
            valid = iota < length
            ids = jnp.where(valid, ids, n_docs)  # out-of-range => dropped
            ws = jnp.where(valid, ws, 0.0)
            return None, (ids, ws)

        _, (all_ids, all_ws) = jax.lax.scan(body, None, qt)
        return all_ids.reshape(-1), all_ws.reshape(-1)  # [T*W]

    ids_flat, ws_flat = jax.vmap(gather_one)(query_terms)  # [B, T*W]

    def scatter_one(ids, ws):
        return jnp.zeros((n_docs,), jnp.float32).at[ids].add(ws, mode="drop")

    return jax.vmap(scatter_one)(ids_flat, ws_flat)


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


@functools.partial(jax.jit, static_argnames=("n_docs", "width"))
def _bm25_scores_runs(
    doc_ids: jax.Array,
    weights: jax.Array,
    starts: jax.Array,
    lengths: jax.Array,
    n_docs: int,
    width: int,
) -> jax.Array:
    """Dense [B, n_docs] scores from (start, length) posting-run pieces.

    Two phases so nothing large is carried through the scan:
      1. scan over pieces GATHERING (doc_id, weight) slices into [T, W]
         staging (carry-free);
      2. ONE batched scatter-add into the [B, n_docs] scores.
    """
    iota = jax.lax.broadcasted_iota(jnp.int32, (1, width), 1)[0]

    def gather_one(s_row, l_row):
        def body(_, sl):
            st, ln = sl
            ids = jax.lax.dynamic_slice(doc_ids, (st,), (width,))
            ws = jax.lax.dynamic_slice(weights, (st,), (width,))
            valid = iota < ln
            return None, (jnp.where(valid, ids, n_docs),
                          jnp.where(valid, ws, 0.0))

        _, (ids, ws) = jax.lax.scan(body, None, (s_row, l_row))
        return ids.reshape(-1), ws.reshape(-1)

    ids_flat, ws_flat = jax.vmap(gather_one)(starts, lengths)

    def scatter_one(ids, ws):
        return jnp.zeros((n_docs,), jnp.float32).at[ids].add(ws, mode="drop")

    return jax.vmap(scatter_one)(ids_flat, ws_flat)


def bm25_scores_bucketed(
    postings: BM25Postings,
    groups: Sequence[Tuple[int, jax.Array, jax.Array]],
    batch: int,
) -> jax.Array:
    """Dense [B, N] scores from per-bucket (width, starts, lengths) run
    pieces (encode_run_pieces)."""
    total = jnp.zeros((batch, postings.n_docs), dtype=jnp.float32)
    for width, starts, lengths in groups:
        total = total + _bm25_scores_runs(
            postings.doc_ids, postings.weights, starts, lengths,
            postings.n_docs, width,
        )
    return total


@functools.partial(jax.jit, static_argnames=("k",))
def bm25_topk(scores: jax.Array, k: int) -> Tuple[jax.Array, jax.Array]:
    """Top-k over dense BM25 scores (reference bm25.py:129-158 search).
    Tiled selection above 64k docs (wide lax.top_k sorts are compile
    hazards at corpus scale)."""
    if scores.shape[-1] > 65536:
        from hybridsearch_tpu.ops.dense import tiled_matrix_topk

        vals, idxs = tiled_matrix_topk(scores, k)
        return vals, jnp.maximum(idxs, 0)
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


@functools.partial(jax.jit, static_argnames=("n_docs", "width"))
def _cand_scores_runs(
    doc_ids: jax.Array,
    weights: jax.Array,
    starts: jax.Array,  # [B, T]
    lengths: jax.Array,  # [B, T]
    candidates: jax.Array,  # [B, C]
    n_docs: int,
    width: int,
) -> jax.Array:
    """[B, C] summed weights of each candidate across the query's posting-run
    pieces — binary search per candidate per piece, NO dense [N] scoring.

    Posting runs are doc-sorted within a term (build sorts by term with a
    stable sort over doc-major COO), so membership is jnp.searchsorted over
    the masked slice (tail masked to a +inf sentinel to preserve order).
    Cost: O(T * C * log W) per query vs O(sum posting lengths) for full
    scoring — the funnel's stage 2 at 10M docs drops from full-corpus
    scatter work to a few thousand comparisons.
    """
    iota = jax.lax.broadcasted_iota(jnp.int32, (1, width), 1)[0]
    sentinel = jnp.int32(n_docs + 1)

    def per_query(st_row, ln_row, cand_row):
        def piece(acc, sl):
            st, ln = sl
            ids = jax.lax.dynamic_slice(doc_ids, (st,), (width,))
            ws = jax.lax.dynamic_slice(weights, (st,), (width,))
            valid = iota < ln
            ids_m = jnp.where(valid, ids, sentinel)
            ws_m = jnp.where(valid, ws, 0.0)
            pos = jnp.searchsorted(ids_m, cand_row)  # [C]
            pos_c = jnp.clip(pos, 0, width - 1)
            hit = ids_m[pos_c] == cand_row
            return acc + jnp.where(hit, ws_m[pos_c], 0.0), None

        acc, _ = jax.lax.scan(piece, jnp.zeros(cand_row.shape, jnp.float32),
                              (st_row, ln_row))
        return acc

    return jax.vmap(per_query)(starts, lengths, candidates)


_HOT_LADDER = (1, 2, 4, 8)


def encode_hot_terms(
    postings: BM25Postings,
    query_term_ids: Sequence[Sequence[int]],
) -> Optional[Tuple[jax.Array, jax.Array, jax.Array]]:
    """(hot_rows [B, Hm], hot_starts [B, Hm], hot_lens [B, Hm]) for the
    hot terms of each query, padded to a small ladder (row pad = H, the
    all-zeros bounds row; start/len pad = 0). None when no query touches a
    hot term."""
    if postings.hot_rows_of is None or postings.hot_tile_bounds is None:
        return None
    B = len(query_term_ids)
    per_q: List[List[Tuple[int, int, int]]] = []
    longest = 0
    for ids in query_term_ids:
        rows = []
        for tid in ids:
            row = int(postings.hot_rows_of[tid])
            if row >= 0:
                rows.append((row, int(postings.starts_host[tid]),
                             int(postings.lengths_host[tid])))
        per_q.append(rows)
        longest = max(longest, len(rows))
    if longest == 0:
        return None
    Hm = next((h for h in _HOT_LADDER if h >= longest), _HOT_LADDER[-1])
    H = postings.hot_tile_bounds.shape[0] - 1
    rows_arr = np.full((B, Hm), H, dtype=np.int32)
    st_arr = np.zeros((B, Hm), dtype=np.int32)
    ln_arr = np.zeros((B, Hm), dtype=np.int32)
    for qi, rows in enumerate(per_q):
        for j, (row, st, ln) in enumerate(rows[:Hm]):
            rows_arr[qi, j], st_arr[qi, j], ln_arr[qi, j] = row, st, ln
    return jnp.asarray(rows_arr), jnp.asarray(st_arr), jnp.asarray(ln_arr)


@functools.partial(jax.jit, static_argnames=("n_iters",))
def cand_scores_bisect(
    doc_ids: jax.Array,  # [nnz_pad] int32, doc-sorted within each run
    weights: jax.Array,  # [nnz_pad] float32
    starts: jax.Array,  # [B, H] run starts (0 = pad with len 0)
    lengths: jax.Array,  # [B, H] run lengths (0 = pad)
    candidates: jax.Array,  # [B, C] doc ids (out-of-range = no hit)
    n_iters: int = 26,
) -> jax.Array:
    """[B, C] summed weights of candidates across hot-term runs by IN-PLACE
    lower-bound bisection over the HBM-resident run — no dynamic_slice of
    the (multi-million-entry) run is ever materialized. 2^26 covers runs to
    67M postings. Cost: B*H*C*n_iters random 4-byte gathers."""

    def per_query(st_row, ln_row, cand_row):
        def per_term(acc, sl):
            st, ln = sl

            def body(_i, lohi):
                lo, hi = lohi
                mid = (lo + hi) // 2
                v = doc_ids[st + jnp.minimum(mid, jnp.maximum(ln - 1, 0))]
                upd = lo < hi
                go_right = upd & (v < cand_row)
                lo = jnp.where(go_right, mid + 1, lo)
                hi = jnp.where(upd & ~go_right, mid, hi)
                return lo, hi

            lo = jnp.zeros(cand_row.shape, jnp.int32)
            hi = jnp.broadcast_to(ln, cand_row.shape)
            lo, _hi = jax.lax.fori_loop(0, n_iters, body, (lo, hi))
            pos = st + jnp.minimum(lo, jnp.maximum(ln - 1, 0))
            hit = (lo < ln) & (doc_ids[pos] == cand_row)
            return acc + jnp.where(hit, weights[pos], 0.0), None

        acc, _ = jax.lax.scan(
            per_term, jnp.zeros(cand_row.shape, jnp.float32),
            (st_row, ln_row),
        )
        return acc

    return jax.vmap(per_query)(starts, lengths, candidates)


def bm25_candidate_scores_runs(
    postings: BM25Postings,
    groups: Sequence[Tuple[int, jax.Array, jax.Array]],
    candidates: jax.Array,  # [B, C] doc ids (-1 = pad)
) -> jax.Array:
    """[B, C] candidate scores from run-piece groups (encode_run_pieces) —
    exact match with full scoring, without computing it."""
    B, C = candidates.shape
    safe = jnp.where(candidates >= 0, candidates, postings.n_docs + 2)
    total = jnp.zeros((B, C), dtype=jnp.float32)
    for width, starts, lengths in groups:
        total = total + _cand_scores_runs(
            postings.doc_ids, postings.weights, starts, lengths, safe,
            postings.n_docs, width,
        )
    return jnp.where(candidates >= 0, total, 0.0)


class ShardedBM25Postings(NamedTuple):
    """Doc-partitioned eager postings for a device mesh.

    Each shard s owns docs [s*docs_per_shard, (s+1)*docs_per_shard); its
    postings are localized (doc_id - shard offset) and padded to a common
    nnz so the arrays stack into mesh-shardable [S, ...] tensors.
    """

    indptr: jax.Array  # [S, V+1] int32
    doc_ids: jax.Array  # [S, nnz_pad] int32 local ids; pad = docs_per_shard
    weights: jax.Array  # [S, nnz_pad] float32
    n_docs: int
    docs_per_shard: int
    max_postings: int  # max local posting run across shards
    vocab_size: int
    n_shards: int
    starts_host: Optional[np.ndarray] = None  # [S, V] host run starts
    lengths_host: Optional[np.ndarray] = None  # [S, V] host run lengths


def build_sharded_postings(
    term_ids: np.ndarray,
    doc_ids: np.ndarray,
    weights: np.ndarray,
    n_docs: int,
    vocab_size: int,
    n_shards: int,
    mesh=None,
    docs_per_shard: int | None = None,
) -> ShardedBM25Postings:
    """Host-side build of doc-partitioned postings; places the stacked
    arrays with NamedSharding(P("data", None)) when a mesh is given.
    docs_per_shard lets the caller align the partition with the dense
    index's shard rows so hybrid fusion can run shard-locally."""
    per = docs_per_shard or -(-max(n_docs, 1) // n_shards)
    shard_of = (doc_ids // per).astype(np.int64)
    indptrs, ids_l, ws_l = [], [], []
    max_post = 1
    for s in range(n_shards):
        m = shard_of == s
        t, d, w = term_ids[m], doc_ids[m] - s * per, weights[m]
        order = np.lexsort((d, t))  # doc-sorted runs (searchsorted invariant)
        t, d, w = t[order], d[order], w[order]
        ip = np.zeros(vocab_size + 1, dtype=np.int64)
        np.add.at(ip, t + 1, 1)
        ip = np.cumsum(ip)
        if len(t):
            max_post = max(max_post, int((ip[1:] - ip[:-1]).max()))
        indptrs.append(ip)
        ids_l.append(d.astype(np.int32))
        ws_l.append(w.astype(np.float32))
    nnz_pad = max(len(x) for x in ids_l) + max_post
    ids_arr = np.full((n_shards, nnz_pad), per, dtype=np.int32)
    ws_arr = np.zeros((n_shards, nnz_pad), dtype=np.float32)
    ip_arr = np.zeros((n_shards, vocab_size + 1), dtype=np.int32)
    for s in range(n_shards):
        ids_arr[s, : len(ids_l[s])] = ids_l[s]
        ws_arr[s, : len(ws_l[s])] = ws_l[s]
        ip_arr[s] = indptrs[s].astype(np.int32)
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        shard = NamedSharding(mesh, P("data", None))
        ip_dev = jax.device_put(ip_arr, shard)
        ids_dev = jax.device_put(ids_arr, shard)
        ws_dev = jax.device_put(ws_arr, shard)
    else:
        ip_dev, ids_dev, ws_dev = map(jnp.asarray, (ip_arr, ids_arr, ws_arr))
    ip_np = ip_arr.astype(np.int64)
    return ShardedBM25Postings(
        indptr=ip_dev, doc_ids=ids_dev, weights=ws_dev, n_docs=n_docs,
        docs_per_shard=per, max_postings=max_post, vocab_size=vocab_size,
        n_shards=n_shards,
        starts_host=ip_np[:, :-1],
        lengths_host=ip_np[:, 1:] - ip_np[:, :-1],
    )


def _local_bucketed_scores(ids, ws, run_arrays, widths, per):
    """Sum bucketed run-piece scores for one shard's postings (traced).
    run_arrays interleaves (starts_0, lengths_0, starts_1, lengths_1, ...)."""
    total = None
    for i, width in enumerate(widths):
        starts, lengths = run_arrays[2 * i], run_arrays[2 * i + 1]
        s = _bm25_scores_runs(ids, ws, starts, lengths, per, width)
        total = s if total is None else total + s
    return total


def encode_run_pieces_sharded(
    starts_host: np.ndarray,  # [S, V]
    lengths_host: np.ndarray,  # [S, V]
    query_term_ids: Sequence[Sequence[int]],
    cap: int,
) -> List[Tuple[int, jax.Array, jax.Array]]:
    """Sharded query encoding: per-bucket (width, starts [S, B, T],
    lengths [S, B, T]). Bucket/T structure is decided by the max local run
    across shards so every shard shares the same static shapes."""
    S = starts_host.shape[0]
    B = len(query_term_ids)
    # max local run per term decides bucketing; piece splitting applies
    # per shard with that bucket width.
    max_run = lengths_host.max(axis=0)  # [V]
    buckets: dict = {}
    for qi, ids in enumerate(query_term_ids):
        for tid in ids:
            run = int(max_run[tid])
            if run <= 0:
                continue
            n_pieces = -(-min(run, 10**12) // LENGTH_BUCKETS[-1]) if run > LENGTH_BUCKETS[-1] else 1
            if run > LENGTH_BUCKETS[-1]:
                w = LENGTH_BUCKETS[-1]
            else:
                w = bucket_width(run, cap)
            buckets.setdefault(w, [[] for _ in range(B)])[qi].append(
                (tid, n_pieces)
            )
    # expand (tid, n_pieces) -> per-query flat piece lists of (tid, off)
    expanded: dict = {}
    for w, lists in buckets.items():
        flat = [[] for _ in range(B)]
        for qi, pieces in enumerate(lists):
            for tid, n_pieces in pieces:
                for pi in range(n_pieces):
                    flat[qi].append((tid, pi * w))
        expanded[w] = flat

    out: List[Tuple[int, jax.Array, jax.Array]] = []
    for w in sorted(expanded):
        lists = expanded[w]
        longest = max((len(x) for x in lists), default=0)
        if longest == 0:
            continue
        t_cap = T_CAPS.get(w, TERM_LADDER[-1])
        for chunk_start in range(0, longest, t_cap):
            chunk = [x[chunk_start : chunk_start + t_cap] for x in lists]
            c_longest = max((len(x) for x in chunk), default=0)
            if c_longest == 0:
                continue
            T = _ladder(c_longest, t_cap)
            s_arr = np.zeros((S, B, T), dtype=np.int32)
            l_arr = np.zeros((S, B, T), dtype=np.int32)
            for qi, pieces in enumerate(chunk):
                for j, (tid, off) in enumerate(pieces[:T]):
                    for sh in range(S):
                        run_s = int(lengths_host[sh, tid])
                        ln = max(0, min(w, run_s - off))
                        s_arr[sh, qi, j] = int(starts_host[sh, tid]) + off
                        l_arr[sh, qi, j] = ln
            out.append((w, jnp.asarray(s_arr), jnp.asarray(l_arr)))
    return out


def sharded_bm25_topk(
    mesh,
    postings: ShardedBM25Postings,
    groups: Sequence[Tuple[int, jax.Array, jax.Array]],
    k: int,
) -> Tuple[jax.Array, jax.Array]:
    """Exact global top-k BM25 over doc-sharded postings: each shard
    scatter-scores its local docs (bucketed run pieces), takes a local
    top-k, and k candidates per shard cross the ICI for the final merge —
    the same collective pattern as the dense index."""
    from jax.sharding import PartitionSpec as P
    from jax import shard_map
    from hybridsearch_tpu.parallel.mesh import DATA_AXIS

    per = postings.docs_per_shard
    k_local = min(k, per)
    n = postings.n_docs
    widths = tuple(w for w, _s, _l in groups)
    run_arrays = tuple(a for _w, st, ln in groups for a in (st, ln))

    def local(ids, ws, *runs):
        local_runs = tuple(r[0] for r in runs)  # [B, T] per array
        scores = _local_bucketed_scores(ids[0], ws[0], local_runs, widths, per)
        shard_id = jax.lax.axis_index(DATA_AXIS)
        offset = shard_id * per
        if per > 65536:
            from hybridsearch_tpu.ops.dense import tiled_matrix_topk

            vals, idxs = tiled_matrix_topk(scores, k_local)
            idxs = jnp.maximum(idxs, 0)
        else:
            vals, idxs = jax.lax.top_k(scores, k_local)
        gidx = idxs + offset
        vals = jnp.where(gidx < n, vals, -jnp.inf)
        gidx = jnp.where(gidx < n, gidx, -1)
        all_vals = jax.lax.all_gather(vals, DATA_AXIS, axis=1, tiled=True)
        all_idxs = jax.lax.all_gather(gidx, DATA_AXIS, axis=1, tiled=True)
        mv, sel = jax.lax.top_k(all_vals, k)
        return mv, jnp.take_along_axis(all_idxs, sel, axis=1)

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(DATA_AXIS, None), P(DATA_AXIS, None))
        + (P(DATA_AXIS, None, None),) * len(run_arrays),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return fn(postings.doc_ids, postings.weights, *run_arrays)


def sharded_bm25_scores(
    mesh,
    postings: ShardedBM25Postings,
    groups: Sequence[Tuple[int, jax.Array, jax.Array]],
) -> jax.Array:
    """Full [B, N_pad] scores, doc-sharded on the last axis (for fusion)."""
    from jax.sharding import PartitionSpec as P
    from jax import shard_map
    from hybridsearch_tpu.parallel.mesh import DATA_AXIS

    per = postings.docs_per_shard
    widths = tuple(w for w, _s, _l in groups)
    run_arrays = tuple(a for _w, st, ln in groups for a in (st, ln))

    def local(ids, ws, *runs):
        local_runs = tuple(r[0] for r in runs)
        return _local_bucketed_scores(ids[0], ws[0], local_runs, widths, per)

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(DATA_AXIS, None), P(DATA_AXIS, None))
        + (P(DATA_AXIS, None, None),) * len(run_arrays),
        out_specs=P(None, DATA_AXIS),
        check_vma=False,
    )
    return fn(postings.doc_ids, postings.weights, *run_arrays)


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
    df: "Optional[np.ndarray]" = None,
    avg_len: "Optional[float]" = None,
) -> np.ndarray:
    """Host-side eager weight computation from COO tf triples.

    idf uses the reference's smoothing: log((N - df + 0.5)/(df + 0.5) + 1)
    (reference bm25.py:81). BM25+ adds delta inside the per-term sum
    (reference bm25.py:177).

    `df` / `avg_len`, when given, OVERRIDE the stats derived from the
    triples — the epoch-frozen incremental-add path scores new docs
    under the stats of the last full fit (bounded staleness,
    index/sparse_index.py add_tokens).
    """
    if df is None:
        df = np.zeros(vocab_size, dtype=np.int64)
        np.add.at(df, tf_term_ids, 1)
    idf = np.log((n_docs - df + 0.5) / (df + 0.5) + 1.0)
    if avg_len is None:
        avg_len = float(doc_lens.mean()) if n_docs else 1.0
    avg_len = max(avg_len, 1e-9)
    tf = tf_counts.astype(np.float64)
    len_norm = k1 * (1.0 - b + b * doc_lens[tf_doc_ids] / avg_len)
    comp = tf * (k1 + 1.0) / (tf + len_norm)
    if variant == "bm25plus":
        comp = comp + delta
    return (idf[tf_term_ids] * comp).astype(np.float32)
