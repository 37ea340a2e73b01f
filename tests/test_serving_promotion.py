"""Phase-12 A/B winner promotion (benchmarks/hw_session.py).

The hardware queue can finish with nobody around to flip serving
defaults; `_promote_best_serving` persists the winning (variant, batch,
env) so bench.py serves it in the driver window. These tests pin the
selection rules: fastest row wins, but only among rows that hold the
measured base rows' certified-exact share (within 0.5pp).
"""

import json

import pytest

import benchmarks.hw_session as hw


@pytest.fixture()
def best_path(tmp_path, monkeypatch):
    p = tmp_path / "serving_best.json"
    monkeypatch.setenv("HST_SERVING_BEST", str(p))
    return p


def _row(variant, batch, qps, exact=100.0, env=None):
    return {"variant": variant, "batch": batch, "value": qps,
            "exact_pct": exact, "env": env or {}}


def test_fastest_quality_holding_row_wins(best_path, capsys):
    rows = [
        _row("base", 256, 1500.0),
        _row("dedup", 256, 2400.0, env={"HST_SCORES_DEDUP": "1"}),
        _row("both", 512, 5200.0, env={"HST_PLACE_FUSED": "1",
                                       "HST_SCORES_DEDUP": "1"}),
    ]
    hw._promote_best_serving(rows, 10_000_000)
    rec = json.loads(best_path.read_text())
    assert rec["variant"] == "both"
    assert rec["batch"] == 512
    assert rec["env"] == {"HST_PLACE_FUSED": "1", "HST_SCORES_DEDUP": "1"}
    assert rec["n_docs"] == 10_000_000


def test_quality_losing_row_is_rejected(best_path):
    rows = [
        _row("base", 256, 1500.0, exact=100.0),
        _row("dedup", 256, 9000.0, exact=97.0),  # 3pp certified loss
    ]
    hw._promote_best_serving(rows, 10_000_000)
    rec = json.loads(best_path.read_text())
    assert rec["variant"] == "base"


def test_half_point_tolerance(best_path):
    rows = [
        _row("base", 256, 1500.0, exact=100.0),
        _row("fusedplace", 256, 3000.0, exact=99.6,
             env={"HST_PLACE_FUSED": "1"}),
    ]
    hw._promote_best_serving(rows, 10_000_000)
    assert json.loads(best_path.read_text())["variant"] == "fusedplace"


def test_failed_grid_writes_nothing(best_path):
    hw._promote_best_serving([], 10_000_000)
    assert not best_path.exists()
    hw._promote_best_serving([{"variant": "base", "batch": 256,
                               "value": 0.0, "env": {}}], 10_000_000)
    assert not best_path.exists()


def test_no_base_row_still_promotes(best_path):
    # base rows can all fail (e.g. a wedge mid-grid); survivors compete
    # with no quality floor to compare against
    rows = [_row("dedup", 512, 2800.0, exact=99.8,
                 env={"HST_SCORES_DEDUP": "1"})]
    hw._promote_best_serving(rows, 10_000_000)
    assert json.loads(best_path.read_text())["variant"] == "dedup"
