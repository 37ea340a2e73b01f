"""int8-swept certified-exact dense top-k (ops/dense.py int8_swept_topk).

The exactness contract under test: on rows where the coverage
certificate is True, the returned (values, indices) must equal the bf16
oracle's exactly — the int8 sweep only steers tile SELECTION; values
come from the bf16 rescore. Reference mandate: indexer.py:20-67 (FAISS
flat = exact search).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
import pytest

from hybridsearch_tpu.ops.dense import (
    int8_swept_topk,
    l2_normalize,
    quantize_corpus_int8,
    scan_dense_topk,
)


def _corpus(n, d, seed=0, clustered=True):
    rng = np.random.default_rng(seed)
    if clustered:
        cents = rng.standard_normal((16, d)).astype(np.float32)
        z = rng.integers(0, 16, n)
        x = cents[z] + 0.3 * rng.standard_normal((n, d)).astype(np.float32)
    else:
        x = rng.standard_normal((n, d)).astype(np.float32)
    return np.asarray(l2_normalize(jnp.asarray(x)))


def test_quantizer_residuals_sound():
    docs = jnp.asarray(_corpus(1024, 128))
    d8, scale, tile_resid = quantize_corpus_int8(docs)
    deq = d8.astype(jnp.float32) * (scale[:, None] / 127.0)
    resid = np.sqrt(np.sum(np.square(np.asarray(docs - deq)), axis=1))
    # per-tile maxima bound every member doc's residual
    tr = np.asarray(tile_resid)
    for t in range(8):
        assert tr[t] >= resid[t * 128:(t + 1) * 128].max() - 1e-7
    # per-doc scaling keeps the interval tight (the certificate's slack)
    assert resid.max() < 0.05


@pytest.mark.parametrize("clustered", [True, False])
def test_certified_rows_exact(clustered):
    n, d, k = 4096, 128, 10
    docs = jnp.asarray(_corpus(n, d, seed=1, clustered=clustered))
    rng = np.random.default_rng(2)
    q = np.asarray(l2_normalize(jnp.asarray(
        rng.standard_normal((16, d)).astype(np.float32))))
    d8, scale, tile_resid = quantize_corpus_int8(docs)
    vals, idxs, covered = int8_swept_topk(
        jnp.asarray(q), d8, scale, docs, tile_resid, k)
    want_v, want_i = scan_dense_topk(jnp.asarray(q), docs, k)
    covered = np.asarray(covered)
    assert covered.any(), "no row certified — bounds far too loose"
    for b in np.nonzero(covered)[0]:
        np.testing.assert_array_equal(
            np.asarray(idxs)[b], np.asarray(want_i)[b])
        np.testing.assert_allclose(
            np.asarray(vals)[b], np.asarray(want_v)[b], rtol=1e-6)


def test_certificate_rate_clustered():
    """On a clustered corpus (the serving layout) the default 4k-tile
    probe budget should certify the large majority of queries."""
    n, d, k = 8192, 128, 10
    docs = jnp.asarray(_corpus(n, d, seed=3))
    rng = np.random.default_rng(4)
    q = np.asarray(l2_normalize(jnp.asarray(
        rng.standard_normal((32, d)).astype(np.float32))))
    d8, scale, tile_resid = quantize_corpus_int8(docs)
    _, _, covered = int8_swept_topk(
        jnp.asarray(q), d8, scale, docs, tile_resid, k)
    assert np.asarray(covered).mean() >= 0.75


def test_full_probe_always_certifies_and_matches():
    n, d, k = 1024, 64, 5
    docs = jnp.asarray(_corpus(n, d, seed=5))
    rng = np.random.default_rng(6)
    q = np.asarray(l2_normalize(jnp.asarray(
        rng.standard_normal((8, d)).astype(np.float32))))
    d8, scale, tile_resid = quantize_corpus_int8(docs)
    vals, idxs, covered = int8_swept_topk(
        jnp.asarray(q), d8, scale, docs, tile_resid, k,
        probe_tiles=n // 128)
    assert bool(np.asarray(covered).all())
    want_v, want_i = scan_dense_topk(jnp.asarray(q), docs, k)
    np.testing.assert_array_equal(np.asarray(idxs), np.asarray(want_i))
    np.testing.assert_allclose(np.asarray(vals), np.asarray(want_v),
                               rtol=1e-6)


def test_bias_mask_prefilters():
    """0/-inf bias rows are dead before top-k (tombstones / metadata
    pre-filter) in BOTH the sweep and the rescore."""
    n, d, k = 2048, 64, 8
    docs = jnp.asarray(_corpus(n, d, seed=7))
    rng = np.random.default_rng(8)
    q = np.asarray(l2_normalize(jnp.asarray(
        rng.standard_normal((4, d)).astype(np.float32))))
    bias = np.zeros(n, np.float32)
    dead = rng.choice(n, size=n // 2, replace=False)
    bias[dead] = -np.inf
    d8, scale, tile_resid = quantize_corpus_int8(docs)
    vals, idxs, covered = int8_swept_topk(
        jnp.asarray(q), d8, scale, docs, tile_resid, k,
        probe_tiles=n // 128, bias=jnp.asarray(bias))
    assert bool(np.asarray(covered).all())
    assert not set(np.asarray(idxs).ravel().tolist()) & set(dead.tolist())
    want_v, want_i = scan_dense_topk(jnp.asarray(q), docs, k,
                                     bias=jnp.asarray(bias))
    np.testing.assert_array_equal(np.asarray(idxs), np.asarray(want_i))


def test_int8_with_stats_self_consistent():
    """tiled_dense_topk(with_stats=True) now works in int8 mode: the
    stats are the exact min/max of the dequantized int8 scores (the
    round-4 stub at ops/dense.py:201)."""
    from hybridsearch_tpu.ops.dense import tiled_dense_topk

    n, d, k = 2048, 64, 5
    docs = jnp.asarray(_corpus(n, d, seed=9))
    d8, scale, _ = quantize_corpus_int8(docs)
    # global symmetric corpus (the int8 mode tiled_dense_topk expects)
    d8g = jnp.clip(jnp.round(docs.astype(jnp.float32) * 127.0),
                   -127.0, 127.0).astype(jnp.int8)
    rng = np.random.default_rng(10)
    q = jnp.asarray(l2_normalize(jnp.asarray(
        rng.standard_normal((4, d)).astype(np.float32))))
    vals, idxs, smin, smax = tiled_dense_topk(q, d8g, k, with_stats=True)
    # oracle: full dequantized int8 score matrix
    q8 = jnp.clip(jnp.round(q * 127.0), -127.0, 127.0)
    s = np.asarray(q8 @ d8g.astype(jnp.float32).T) / (127.0 * 127.0)
    np.testing.assert_allclose(np.asarray(smax), s.max(axis=1), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(smin), s.min(axis=1), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(vals[:, 0]), s.max(axis=1),
                               rtol=1e-5)
