"""Property-based tests (hypothesis) for the kernel layer — the test
discipline the reference aspired to but never built (its requirements.txt
lists hypothesis unused; SURVEY §4)."""

import jax.numpy as jnp
import numpy as np
from hypothesis import given, settings, strategies as st

from hybridsearch_tpu.evaluation import oracle
from hybridsearch_tpu.ops import bm25 as bm25_ops
from hybridsearch_tpu.ops.fusion import minmax_normalize, weighted_fusion
from hybridsearch_tpu.text.extractor import Vocabulary

settings.register_profile("ci", max_examples=25, deadline=None)
settings.load_profile("ci")


@given(st.lists(st.floats(-1e6, 1e6, allow_nan=False), min_size=2, max_size=64))
def test_minmax_normalize_bounds(xs):
    arr = np.array(xs, np.float32)
    out = np.asarray(minmax_normalize(jnp.asarray(arr)))
    assert out.min() >= -1e-6 and out.max() <= 1.0 + 1e-6
    if arr.max() - arr.min() > 1e-6:
        # monotone: sorted by input, output is non-decreasing (fp32 rounding
        # may merge near-ties, so strict order equality is too strong)
        by_input = out[np.argsort(arr, kind="stable")]
        assert np.all(np.diff(by_input) >= -1e-6)
    elif arr.max() == arr.min():
        # constant-score path returns ones by design (reference
        # utils.py:57-71); ranges in (0, 1e-6] normalize normally (the
        # kernel's eps is 1e-12) and are covered by the bounds assert above
        np.testing.assert_allclose(out, np.ones_like(out))


@given(
    st.integers(2, 40),
    st.integers(1, 8),
    st.floats(0.0, 1.0),
)
def test_fusion_bounds_and_symmetry(n, seed, w):
    rng = np.random.default_rng(seed)
    sem = rng.standard_normal(n).astype(np.float32)[None, :]
    lex = rng.random(n).astype(np.float32)[None, :] * 7
    fused = np.asarray(weighted_fusion(jnp.asarray(sem), jnp.asarray(lex),
                                       w, 1.0 - w))
    assert fused.min() >= -1e-5 and fused.max() <= 1.0 + 1e-5
    # w=1 reduces to normalized semantic ranking
    if w == 1.0:
        want = np.asarray(minmax_normalize(jnp.asarray(sem)))
        np.testing.assert_allclose(fused, want, atol=1e-6)


_word = st.text(alphabet="abcdefgh", min_size=1, max_size=5)
_doc = st.lists(_word, min_size=1, max_size=20)


@given(st.lists(_doc, min_size=1, max_size=10), _doc, st.integers(0, 3))
def test_bm25_kernel_matches_oracle_random_corpora(token_docs, query, variant_i):
    variant = "bm25" if variant_i % 2 == 0 else "bm25plus"
    orc = oracle.BM25Oracle(variant=variant).fit(token_docs)

    vocab = Vocabulary()
    term_ids, doc_ids, counts = [], [], []
    doc_lens = np.array([len(t) for t in token_docs], dtype=np.float64)
    for d, toks in enumerate(token_docs):
        tf = {}
        for t in toks:
            tf[vocab.add(t)] = tf.get(vocab.add(t), 0) + 1
        term_ids.extend(tf.keys())
        doc_ids.extend([d] * len(tf))
        counts.extend(tf.values())
    weights = bm25_ops.compute_eager_weights(
        np.asarray(term_ids), np.asarray(doc_ids), np.asarray(counts, np.float64),
        doc_lens, len(token_docs), len(vocab), variant=variant,
    )
    postings = bm25_ops.build_postings_arrays(
        np.asarray(term_ids), np.asarray(doc_ids, np.int32), weights,
        len(token_docs), len(vocab),
    )
    qt = np.full((1, 32), len(vocab), np.int32)
    ids = [vocab.get(t) for t in query if vocab.get(t) >= 0][:32]
    qt[0, : len(ids)] = ids
    got = np.asarray(bm25_ops.bm25_scores(postings, jnp.asarray(qt)))[0]
    want = orc.score_all([t for t in query if vocab.get(t) >= 0])
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


@given(st.integers(1, 6), st.integers(0, 5))
def test_dense_topk_subset_monotonicity(k, seed):
    """top-(k) is a prefix of top-(k+1) under exact scoring."""
    from hybridsearch_tpu.ops.dense import scan_dense_topk

    rng = np.random.default_rng(seed)
    docs = oracle.l2_normalize(rng.standard_normal((50, 16))).astype(np.float32)
    q = oracle.l2_normalize(rng.standard_normal((1, 16))).astype(np.float32)
    _, i1 = scan_dense_topk(jnp.asarray(q), jnp.asarray(docs), k, block_n=16)
    _, i2 = scan_dense_topk(jnp.asarray(q), jnp.asarray(docs), k + 1, block_n=16)
    assert np.asarray(i1)[0].tolist() == np.asarray(i2)[0, :k].tolist()
