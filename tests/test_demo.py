"""The bundled demo as an end-to-end smoke test (the reference's own
verification surface, SURVEY §4.1)."""


def test_demo_runs_end_to_end(capsys):
    from hybridsearch_tpu.demo import run_demo

    run_demo()
    out = capsys.readouterr().out
    assert "basic hybrid search" in out
    assert "learned weights after 10 positive ratings" in out
    assert "multi-stage funnel" in out
    assert "MMR diversity" in out
    assert "demo complete" in out
    # the ML query surfaces the ML doc
    assert "Machine learning models learn patterns" in out
