"""BM25 device kernel parity vs the dict-based oracle."""

import numpy as np
import jax.numpy as jnp
import pytest

from hybridsearch_tpu.evaluation.oracle import BM25Oracle
from hybridsearch_tpu.index.sparse_index import BM25
from hybridsearch_tpu.ops import bm25 as bm25_ops
from hybridsearch_tpu.text.extractor import Vocabulary, extract_tokens


def build_from_texts(texts, variant="bm25", k1=1.5, b=0.75, delta=1.0):
    """Helper replicating what index/sparse_index.py does: texts -> postings."""
    vocab = Vocabulary()
    tokenized = [extract_tokens(t) for t in texts]
    term_ids, doc_ids, counts = [], [], []
    doc_lens = np.array([len(toks) for toks in tokenized], dtype=np.float64)
    for d, toks in enumerate(tokenized):
        seen = {}
        for t in toks:
            seen[vocab.add(t)] = seen.get(vocab.add(t), 0) + 1
        for tid, c in seen.items():
            term_ids.append(tid)
            doc_ids.append(d)
            counts.append(c)
    term_ids = np.asarray(term_ids, dtype=np.int64)
    doc_ids = np.asarray(doc_ids, dtype=np.int64)
    counts = np.asarray(counts, dtype=np.float64)
    weights = bm25_ops.compute_eager_weights(
        term_ids, doc_ids, counts, doc_lens, len(texts), len(vocab),
        k1=k1, b=b, variant=variant, delta=delta,
    )
    postings = bm25_ops.build_postings_arrays(
        term_ids, doc_ids.astype(np.int32), weights, len(texts), len(vocab)
    )
    return vocab, tokenized, postings


def encode_queries(vocab, queries, t_max=16):
    out = np.full((len(queries), t_max), len(vocab), dtype=np.int32)
    for i, q in enumerate(queries):
        ids = vocab.encode(extract_tokens(q))[:t_max]
        out[i, : len(ids)] = ids
    return jnp.asarray(out)


@pytest.mark.parametrize("variant", ["bm25", "bm25plus"])
def test_bm25_scores_match_oracle(demo_docs, variant):
    vocab, tokenized, postings = build_from_texts(demo_docs, variant=variant)
    orc = BM25Oracle(variant=variant).fit(tokenized)
    queries = ["machine learning data", "neural networks", "cooking pasta water",
               "nonexistent zzz term"]
    qt = encode_queries(vocab, queries)
    got = np.asarray(bm25_ops.bm25_scores(postings, qt))
    for i, q in enumerate(queries):
        want = orc.score_all(extract_tokens(q))
        np.testing.assert_allclose(got[i], want, rtol=1e-4, atol=1e-5,
                                   err_msg=f"query={q!r}")


def test_bm25_repeated_query_terms(demo_docs):
    """Reference sums per query token occurrence, so a repeated term counts
    twice (reference bm25.py:96 iterates raw query tokens)."""
    vocab, tokenized, postings = build_from_texts(demo_docs)
    orc = BM25Oracle().fit(tokenized)
    q = "learning learning"
    qt = encode_queries(vocab, [q])
    got = np.asarray(bm25_ops.bm25_scores(postings, qt))[0]
    want = orc.score_all(extract_tokens(q))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_bm25_topk_and_candidates(demo_docs):
    vocab, tokenized, postings = build_from_texts(demo_docs)
    orc = BM25Oracle().fit(tokenized)
    qt = encode_queries(vocab, ["machine learning"])
    scores = bm25_ops.bm25_scores(postings, qt)
    vals, idx = bm25_ops.bm25_topk(scores, 3)
    want = orc.score_all(extract_tokens("machine learning"))
    want_idx = np.argsort(-want, kind="stable")[:3]
    np.testing.assert_allclose(np.asarray(vals)[0], want[want_idx], rtol=1e-4,
                               atol=1e-5)
    # candidate gather matches full scoring
    cand = jnp.asarray([[0, 5, 11, 3, -1]], dtype=jnp.int32)
    got_c = np.asarray(bm25_ops.bm25_candidate_scores(postings, qt, cand))[0]
    np.testing.assert_allclose(got_c[:4], want[[0, 5, 11, 3]], rtol=1e-4, atol=1e-5)
    assert got_c[4] == 0.0


def test_bm25_empty_query(demo_docs):
    vocab, tokenized, postings = build_from_texts(demo_docs)
    qt = jnp.full((1, 8), len(vocab), dtype=jnp.int32)
    got = np.asarray(bm25_ops.bm25_scores(postings, qt))
    np.testing.assert_allclose(got, np.zeros((1, len(demo_docs))))


def test_run_piece_encoding_splits_long_runs():
    """Posting runs longer than the largest bucket split into pieces; chunked
    groups keep staging bounded (T_CAPS); all pieces cover the run exactly."""
    import numpy as np

    from hybridsearch_tpu.ops.bm25 import (
        LENGTH_BUCKETS,
        T_CAPS,
        encode_run_pieces,
    )

    W = LENGTH_BUCKETS[-1]
    starts = np.array([0, 1000, 10_000_000])
    lengths = np.array([10, 3 * W + 7, 100])
    groups = encode_run_pieces(starts, lengths, [[0, 1, 2]], cap=10 * W)
    # collect all pieces back
    pieces = []
    for w, s_arr, l_arr in groups:
        assert s_arr.shape == l_arr.shape
        assert s_arr.shape[1] <= T_CAPS.get(w, 1 << 30)
        for st, ln in zip(np.asarray(s_arr)[0], np.asarray(l_arr)[0]):
            if ln > 0:
                assert ln <= w
                pieces.append((int(st), int(ln)))
    # term 1's run is fully covered by contiguous pieces
    t1 = sorted(p for p in pieces if 1000 <= p[0] < 1000 + 3 * W + 7)
    covered = 0
    expect_start = 1000
    for st, ln in t1:
        assert st == expect_start
        expect_start += ln
        covered += ln
    assert covered == 3 * W + 7
    assert (0, 10) in pieces and (10_000_000, 100) in pieces


def test_bucketed_scores_match_reference_impl(demo_docs):
    """Run-piece bucketed scoring == the straightforward term-id kernel."""
    import jax.numpy as jnp
    import numpy as np

    from hybridsearch_tpu.index.sparse_index import BM25

    bm = BM25().fit(demo_docs)
    queries = ["machine learning data", "neural networks"]
    got = bm.batch_scores(queries)
    # reference: legacy term-id kernel
    qt = bm._encode_queries(queries)
    want = np.asarray(bm25_ops.bm25_scores(bm.postings, qt))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_candidate_scores_runs_match_full(demo_docs):
    """Binary-search candidate scoring == dense scoring gathered at the
    candidates (exact, without full-corpus work)."""
    from hybridsearch_tpu.index.sparse_index import BM25
    from hybridsearch_tpu.ops.bm25 import bm25_candidate_scores_runs

    bm = BM25().fit(demo_docs)
    q = "machine learning data"
    full = bm.score_all(q)
    cand = np.asarray([0, 3, 11, 5, -1], dtype=np.int32)
    groups = bm.encode_queries_bucketed([q])
    got = np.asarray(
        bm25_candidate_scores_runs(bm.postings, groups, jnp.asarray(cand[None, :]))
    )[0]
    np.testing.assert_allclose(got[:4], full[[0, 3, 11, 5]], rtol=1e-4,
                               atol=1e-5)
    assert got[4] == 0.0
    # class API path
    got2 = bm.candidate_scores(q, cand)
    np.testing.assert_allclose(got2[:4], full[[0, 3, 11, 5]], rtol=1e-4,
                               atol=1e-5)


def test_add_tokens_matches_full_refit(rng):
    """Incremental add must publish postings identical to a full refit of
    the concatenated corpus (weights included — global stats change)."""
    from hybridsearch_tpu.index.sparse_index import BM25

    vocab = [f"tok{i}" for i in range(200)]
    first = [list(rng.choice(vocab, size=12)) for _ in range(300)]
    more = [list(rng.choice(vocab, size=9)) for _ in range(50)]
    inc = BM25().fit_tokens(first)
    old_state = inc._state
    inc.add_tokens(more)
    full = BM25().fit_tokens(first + more)
    a, b = inc._state.postings, full._state.postings
    assert a.n_docs == b.n_docs == 350
    np.testing.assert_array_equal(np.asarray(a.indptr), np.asarray(b.indptr))
    np.testing.assert_array_equal(np.asarray(a.doc_ids),
                                  np.asarray(b.doc_ids))
    np.testing.assert_allclose(np.asarray(a.weights), np.asarray(b.weights),
                               rtol=1e-6)
    # snapshot safety: the old state's vocab did not grow
    assert len(old_state.vocab) <= a.vocab_size
    assert old_state.postings.vocab_size == len(old_state.vocab)


def test_add_tokens_requires_cache(rng):
    from hybridsearch_tpu.index.sparse_index import BM25

    b = BM25()
    with pytest.raises(ValueError):
        b.add_tokens([["a", "b"]])


def test_fit_hashes_matches_fit_scores(rng):
    """The native bulk hash-fit path must produce IDENTICAL BM25 scores to
    the string-token fit (term identity is a bijection corpus-side, query
    encode goes through the same hashes)."""
    pytest.importorskip("ctypes")
    from hybridsearch_tpu.text.native import native_available

    if not native_available():
        pytest.skip("libtextops not built")
    vocab = [f"word{i}" for i in range(300)] + ["the", "and", "of"]
    texts = [" ".join(rng.choice(vocab, size=int(rng.integers(5, 20))))
             for _ in range(200)]
    a = BM25().fit(texts)
    b = BM25().fit_hashes(texts)
    queries = [" ".join(rng.choice(vocab, size=3)) for _ in range(8)]
    sa = a.batch_scores(queries)
    sb = b.batch_scores(queries)
    np.testing.assert_allclose(sa, sb, rtol=1e-6, atol=1e-7)


def test_fit_hashes_incremental_add_and_roundtrip(rng, tmp_path):
    """add_tokens on a hash-fit state (string tokens hashed on the way in)
    equals a fresh hash fit of the full corpus; save/load roundtrips the
    hash vocabulary."""
    from hybridsearch_tpu.text.native import native_available

    if not native_available():
        pytest.skip("libtextops not built")
    vocab = [f"word{i}" for i in range(100)]
    texts = [" ".join(rng.choice(vocab, size=10)) for _ in range(80)]
    extra = [" ".join(rng.choice(vocab, size=10)) for _ in range(20)]
    from hybridsearch_tpu.text.extractor import extract_tokens

    inc = BM25().fit_hashes(texts)
    inc.add_tokens([extract_tokens(t) for t in extra])
    full = BM25().fit_hashes(texts + extra)
    queries = [" ".join(rng.choice(vocab, size=3)) for _ in range(5)]
    # adds land in a delta segment under epoch-frozen stats; compaction
    # restores exact equality with a fresh full fit (staleness bounds are
    # pinned in test_bm25_delta.py)
    inc.compact()
    np.testing.assert_allclose(inc.batch_scores(queries),
                               full.batch_scores(queries),
                               rtol=1e-6, atol=1e-7)

    path = str(tmp_path / "bm25_hash.npz")
    full.save(path)
    loaded = BM25().load(path)
    np.testing.assert_allclose(loaded.batch_scores(queries),
                               full.batch_scores(queries),
                               rtol=1e-6, atol=1e-7)
