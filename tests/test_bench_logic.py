"""Host-side logic of the driver benchmark (bench.py).

The JSON line bench.py prints is the round's headline artifact; these
tests pin the fallback rules that protect it:

- `_persist_last_good` never DOWNGRADES the record: a CPU run, a
  degraded-tunnel small-corpus run, or a run that lost the hybrid
  figure must not clobber a full-scale entry that still carries it.
- `_emit_fallback` attaches the last good run when one exists.
"""

import importlib
import json
import sys

import pytest


@pytest.fixture()
def bench(tmp_path, monkeypatch):
    monkeypatch.setenv("HST_BENCH_LAST_GOOD", str(tmp_path / "last_good.json"))
    sys.modules.pop("bench", None)
    mod = importlib.import_module("bench")
    yield mod
    sys.modules.pop("bench", None)


def _read(mod):
    with open(mod.LAST_GOOD_PATH) as f:
        return json.load(f)


def _write(mod, record):
    with open(mod.LAST_GOOD_PATH, "w") as f:
        json.dump(record, f)


FULL = {
    "metric": "dense_topk_qps@10000000docs",
    "value": 18000.0,
    "hybrid_qps": 1500.0,
    "hybrid_docs": 10_000_000,
}


def test_persist_writes_first_record(bench):
    line = dict(FULL)
    bench._persist_last_good(
        line, qps=18000.0, used_n=10_000_000, backend="tpu",
        hybrid={"hybrid_qps": 1500.0})
    assert _read(bench)["hybrid_qps"] == 1500.0


def test_cpu_run_never_persists(bench):
    _write(bench, FULL)
    bench._persist_last_good(
        {"value": 900.0}, qps=900.0, used_n=200_000, backend="cpu",
        hybrid={})
    assert _read(bench) == FULL


def test_small_corpus_fallback_does_not_clobber_full_scale(bench):
    _write(bench, FULL)
    bench._persist_last_good(
        {"value": 30000.0, "hybrid_qps": 2000.0, "hybrid_docs": 1_000_000},
        qps=30000.0, used_n=1_000_000, backend="tpu",
        hybrid={"hybrid_qps": 2000.0})
    assert _read(bench) == FULL


def test_run_without_hybrid_does_not_clobber_hybrid_record(bench):
    _write(bench, FULL)
    bench._persist_last_good(
        {"value": 20000.0}, qps=20000.0, used_n=10_000_000, backend="tpu",
        hybrid={})
    assert _read(bench) == FULL


def test_full_scale_run_with_hybrid_upgrades(bench):
    _write(bench, FULL)
    newer = {"metric": "dense_topk_qps@10000000docs", "value": 19000.0,
             "hybrid_qps": 5200.0, "hybrid_docs": 10_000_000}
    bench._persist_last_good(
        newer, qps=19000.0, used_n=10_000_000, backend="tpu",
        hybrid={"hybrid_qps": 5200.0})
    assert _read(bench) == newer


def test_failed_run_never_persists(bench):
    _write(bench, FULL)
    bench._persist_last_good(
        {"value": 0.0}, qps=0.0, used_n=0, backend="tpu", hybrid={})
    assert _read(bench) == FULL


def test_emit_fallback_attaches_last_good(bench, capsys):
    _write(bench, FULL)
    bench._emit_fallback()
    line = json.loads(capsys.readouterr().out.strip())
    assert line["metric"] == "bench_unavailable"
    assert line["last_good_run"] == FULL


def test_emit_fallback_without_record(bench, capsys):
    bench._emit_fallback()
    line = json.loads(capsys.readouterr().out.strip())
    assert line["metric"] == "bench_unavailable"
    assert "last_good_run" not in line


def test_apply_promoted_serving(bench, tmp_path, monkeypatch):
    import time as _time

    p = tmp_path / "serving_best.json"
    monkeypatch.setenv("HST_SERVING_BEST", str(p))
    fresh = _time.strftime("%Y-%m-%d %H:%M:%S")
    monkeypatch.delenv("HST_PLACE_FUSED", raising=False)
    monkeypatch.delenv("HST_SCORES_DEDUP", raising=False)
    # no record -> defaults
    assert bench._apply_promoted_serving(10_000_000) == (256, None, {})
    p.write_text(json.dumps({
        "variant": "both", "batch": 512, "n_docs": 10_000_000,
        "stamp": fresh,
        "env": {"HST_PLACE_FUSED": "1", "HST_SCORES_DEDUP": "1"}}))
    # scale mismatch -> defaults, env untouched
    monkeypatch.delenv("HST_PLACE_FUSED", raising=False)
    assert bench._apply_promoted_serving(1_000_000) == (256, None, {})
    import os
    assert "HST_PLACE_FUSED" not in os.environ
    # match -> gates applied, batch returned, record + prior snapshot
    monkeypatch.setenv("HST_SCORES_DEDUP", "0")  # operator-exported
    hbatch, rec, prior = bench._apply_promoted_serving(10_000_000)
    assert hbatch == 512 and rec["variant"] == "both"
    assert os.environ["HST_PLACE_FUSED"] == "1"
    assert os.environ["HST_SCORES_DEDUP"] == "1"
    # snapshot records what to restore: unset key -> None, set key -> value
    assert prior == {"HST_PLACE_FUSED": None, "HST_SCORES_DEDUP": "0"}
    os.environ.pop("HST_PLACE_FUSED", None)
    os.environ.pop("HST_SCORES_DEDUP", None)
    # explicit opt-out
    monkeypatch.setenv("HST_BENCH_SERVING_BEST", "0")
    assert bench._apply_promoted_serving(10_000_000) == (256, None, {})


def test_apply_promoted_serving_staleness(bench, tmp_path, monkeypatch):
    """A winner measured before a kernel change must not be served
    forever: records older than the TTL (or unstamped) are ignored so
    the in-bench A/B rider produces fresh evidence instead."""
    import os
    import time as _time

    p = tmp_path / "serving_best.json"
    monkeypatch.setenv("HST_SERVING_BEST", str(p))
    monkeypatch.delenv("HST_PLACE_FUSED", raising=False)
    base = {"variant": "both", "batch": 512, "n_docs": 10_000_000,
            "env": {"HST_PLACE_FUSED": "1"}}
    # unstamped (pre-freshness record) -> ignored
    p.write_text(json.dumps(base))
    assert bench._apply_promoted_serving(10_000_000) == (256, None, {})
    # stale -> ignored
    old_stamp = _time.strftime(
        "%Y-%m-%d %H:%M:%S", _time.localtime(_time.time() - 3 * 86400))
    p.write_text(json.dumps({**base, "stamp": old_stamp}))
    assert bench._apply_promoted_serving(10_000_000) == (256, None, {})
    assert "HST_PLACE_FUSED" not in os.environ
    # fresh -> applied
    p.write_text(json.dumps({
        **base, "stamp": _time.strftime("%Y-%m-%d %H:%M:%S")}))
    hbatch, rec, _prior = bench._apply_promoted_serving(10_000_000)
    assert hbatch == 512 and rec is not None
    os.environ.pop("HST_PLACE_FUSED", None)
