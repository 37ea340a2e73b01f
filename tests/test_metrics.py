"""Evaluation metric unit tests (reference evaluation.py:80-129 semantics)."""

import pytest

from hybridsearch_tpu.evaluation import metrics as m


def test_precision_recall_f1():
    retrieved = [1, 2, 3, 4, 5]
    relevant = [2, 5, 9]
    assert m.precision_at_k(retrieved, relevant, 5) == pytest.approx(2 / 5)
    assert m.recall_at_k(retrieved, relevant, 5) == pytest.approx(2 / 3)
    p, r = 2 / 5, 2 / 3
    assert m.f1_at_k(retrieved, relevant, 5) == pytest.approx(2 * p * r / (p + r))


def test_mrr():
    assert m.mrr([9, 7, 3], [3]) == pytest.approx(1 / 3)
    assert m.mrr([3, 7], [3]) == 1.0
    assert m.mrr([1, 2], [5]) == 0.0


def test_ndcg_binary():
    # perfect ranking
    assert m.ndcg_at_k([1, 2], [1, 2], 2) == pytest.approx(1.0)
    # one relevant at rank 2 of 2, 1 relevant total
    import math

    want = (1 / math.log2(3)) / 1.0
    assert m.ndcg_at_k([9, 1], [1], 2) == pytest.approx(want)
    assert m.ndcg_at_k([1], [], 5) == 0.0


def test_latency_percentiles():
    out = m.latency_percentiles([0.001, 0.002, 0.003])
    assert out["p50_ms"] == pytest.approx(2.0)
    assert m.latency_percentiles([]) == {"p50_ms": 0.0, "p95_ms": 0.0, "p99_ms": 0.0}
