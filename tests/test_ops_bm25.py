"""BM25 device kernel parity vs the dict-based oracle."""

import numpy as np
import jax.numpy as jnp
import pytest

from hybridsearch_tpu.evaluation.oracle import BM25Oracle
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
