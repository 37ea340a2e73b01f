"""Fusion, normalization, MMR, and LSH op tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hybridsearch_tpu.evaluation import oracle
from hybridsearch_tpu.ops import fusion, lsh, mmr


def test_minmax_matches_oracle(rng):
    s = rng.standard_normal((3, 20)).astype(np.float32)
    got = np.asarray(fusion.minmax_normalize(jnp.asarray(s)))
    want = oracle.minmax_normalize(s)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
    assert got.min() >= 0.0 and got.max() <= 1.0


def test_minmax_constant_scores_all_ones():
    """Reference utils.py:57-71: constant input -> all ones."""
    s = jnp.full((2, 7), 3.5)
    got = np.asarray(fusion.minmax_normalize(s))
    np.testing.assert_allclose(got, np.ones((2, 7)))


def test_weighted_fusion_matches_oracle(rng):
    sem = rng.standard_normal((2, 30)).astype(np.float32)
    lex = rng.random((2, 30)).astype(np.float32) * 10
    got = np.asarray(fusion.weighted_fusion(jnp.asarray(sem), jnp.asarray(lex),
                                            0.7, 0.3))
    want = oracle.hybrid_fusion(sem, lex, 0.7, 0.3)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_fusion_weight_monotonicity(rng):
    """Raising semantic weight raises the fused score of semantically
    stronger docs relative to lexical ones (property test)."""
    sem = jnp.asarray([[1.0, 0.0]])
    lex = jnp.asarray([[0.0, 1.0]])
    f1 = np.asarray(fusion.weighted_fusion(sem, lex, 0.9, 0.1))[0]
    f2 = np.asarray(fusion.weighted_fusion(sem, lex, 0.1, 0.9))[0]
    assert f1[0] > f1[1] and f2[1] > f2[0]


def test_validate_weights():
    fusion.validate_weights(0.7, 0.3)
    with pytest.raises(ValueError):
        fusion.validate_weights(0.7, 0.4)


def test_rrf_fusion_prefers_agreement():
    a = jnp.asarray([[3.0, 2.0, 1.0, 0.0]])
    b = jnp.asarray([[30.0, 1.0, 2.0, 0.5]])
    out = np.asarray(fusion.rrf_fusion(a, b))[0]
    assert out.argmax() == 0


def test_mmr_matches_oracle(rng):
    C, D, k = 20, 16, 6
    rel = rng.random(C).astype(np.float32)
    emb = rng.standard_normal((C, D)).astype(np.float32)
    order, _ = mmr.mmr_select(jnp.asarray(rel), jnp.asarray(emb), k, 0.5)
    want = oracle.mmr(rel, emb, k, 0.5)
    assert np.asarray(order).tolist() == want


def test_mmr_lambda_one_is_pure_relevance(rng):
    C, D, k = 12, 8, 5
    rel = rng.random(C).astype(np.float32)
    emb = rng.standard_normal((C, D)).astype(np.float32)
    order, _ = mmr.mmr_select(jnp.asarray(rel), jnp.asarray(emb), k, 1.0)
    want = np.argsort(-rel, kind="stable")[:k]
    assert np.asarray(order).tolist() == want.tolist()


def test_lsh_signatures_deterministic_and_locality(rng):
    planes = lsh.lsh_planes(jax.random.PRNGKey(7), 10, 8, 64)
    v = rng.standard_normal((1, 64)).astype(np.float32)
    near = v + 0.01 * rng.standard_normal((1, 64)).astype(np.float32)
    far = rng.standard_normal((1, 64)).astype(np.float32)
    s_v = np.asarray(lsh.lsh_signatures(planes, jnp.asarray(v), 10, 8))
    s_v2 = np.asarray(lsh.lsh_signatures(planes, jnp.asarray(v), 10, 8))
    s_near = np.asarray(lsh.lsh_signatures(planes, jnp.asarray(near), 10, 8))
    s_far = np.asarray(lsh.lsh_signatures(planes, jnp.asarray(far), 10, 8))
    np.testing.assert_array_equal(s_v, s_v2)
    assert (s_v == s_near).sum() >= (s_v == s_far).sum()
    assert s_v.shape == (1, 10)
    assert s_v.min() >= 0 and s_v.max() < 256


def test_mmr_batch_matches_per_query(rng):
    B, C, D, k = 4, 20, 16, 6
    rel = rng.random((B, C)).astype(np.float32)
    emb = rng.standard_normal((B, C, D)).astype(np.float32)
    order_b, scores_b = mmr.mmr_select_batch(jnp.asarray(rel),
                                             jnp.asarray(emb), k, 0.5)
    for b in range(B):
        order_1, scores_1 = mmr.mmr_select(jnp.asarray(rel[b]),
                                           jnp.asarray(emb[b]), k, 0.5)
        assert np.asarray(order_b[b]).tolist() == np.asarray(order_1).tolist()
        np.testing.assert_allclose(np.asarray(scores_b[b]),
                                   np.asarray(scores_1), rtol=1e-5)


def test_mmr_batch_padding_never_selected(rng):
    """Rows shorter than C mark the tail invalid; padded entries must not
    appear in the selection even at lam=0 (diversity-only)."""
    B, C, D, k = 3, 12, 8, 4
    rel = rng.random((B, C)).astype(np.float32)
    emb = rng.standard_normal((B, C, D)).astype(np.float32)
    valid = np.ones((B, C), dtype=bool)
    valid[0, 6:] = False  # row 0 has only 6 real candidates
    valid[2, 5:] = False
    for lam in (0.0, 0.5, 1.0):
        order, _ = mmr.mmr_select_batch(jnp.asarray(rel), jnp.asarray(emb),
                                        k, lam, valid=jnp.asarray(valid))
        order = np.asarray(order)
        assert (order[0] < 6).all() and (order[2] < 5).all()
        assert (order[1] < C).all()


def test_mmr_batch_per_row_lambda(rng):
    """lam can be a [B] vector: row 0 pure-relevance, row 1 diverse."""
    B, C, D, k = 2, 15, 8, 5
    rel = rng.random((B, C)).astype(np.float32)
    emb = rng.standard_normal((B, C, D)).astype(np.float32)
    lam = jnp.asarray([1.0, 0.3], dtype=jnp.float32)
    order, _ = mmr.mmr_select_batch(jnp.asarray(rel), jnp.asarray(emb), k,
                                    lam)
    want0 = np.argsort(-rel[0], kind="stable")[:k]
    assert np.asarray(order[0]).tolist() == want0.tolist()
