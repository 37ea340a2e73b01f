"""Wiring test for the HTTP load generator (benchmarks/loadgen.py)."""

import json


def test_loadgen_open_loop_smoke(capsys):
    from benchmarks.loadgen import main

    line = main(["--docs", "200", "--qps", "8", "--duration", "1.5",
                 "--workers", "4"])
    printed = json.loads(capsys.readouterr().out.strip())
    assert printed == line
    assert line["mode"] == "open"
    assert line["errors"] == 0
    assert line["n"] == 12  # qps * duration
    assert line["p50_ms"] > 0
    assert line["p99_ms"] >= line["p95_ms"] >= line["p50_ms"]


def test_loadgen_closed_loop_smoke():
    from benchmarks.loadgen import main

    line = main(["--docs", "200", "--closed", "--workers", "2",
                 "--duration", "0.5"])
    assert line["mode"] == "closed"
    assert line["offered_qps"] is None
    assert line["errors"] == 0
    assert line["achieved_qps"] > 0
