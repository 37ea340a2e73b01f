"""PerfConfig: serving-kernel levers as first-class configuration.

The supertile kernels read their gates from env at trace time
(docs/KERNELS.md "Round-4 supertile levers"); PerfConfig pins them from
config so a promoted A/B winner (hw_session phase 12) is reproducible
without operator-exported env vars."""

import os

from hybridsearch_tpu.config import EngineConfig, PerfConfig


def test_perf_config_json_roundtrip():
    cfg = EngineConfig()
    cfg.perf.place_fused = True
    cfg.perf.scores_dedup = True
    cfg.perf.dedup_mxu = False
    cfg.perf.pallas_tpb = 64
    back = EngineConfig.from_json(cfg.to_json())
    assert back.perf.place_fused is True
    assert back.perf.scores_dedup is True
    assert back.perf.dedup_mxu is False
    assert back.perf.pallas_tpb == 64
    assert back.perf.tile_stats_sub is None


def test_perf_apply_env_semantics(monkeypatch):
    for k in ("HST_PLACE_FUSED", "HST_SCORES_DEDUP", "HST_DEDUP_MXU",
              "HST_PALLAS_TPB", "HST_TILE_STATS_SUB"):
        monkeypatch.delenv(k, raising=False)
    monkeypatch.setenv("HST_TILE_STATS_SUB", "1")  # operator-exported
    p = PerfConfig(place_fused=True, scores_dedup=False, pallas_tpb=64)
    p.apply_env()
    assert os.environ["HST_PLACE_FUSED"] == "1"
    assert os.environ["HST_SCORES_DEDUP"] == "0"
    assert os.environ["HST_PALLAS_TPB"] == "64"
    # None fields leave the env alone — operator wins
    assert "HST_DEDUP_MXU" not in os.environ
    assert os.environ["HST_TILE_STATS_SUB"] == "1"


def test_searcher_applies_perf_env(monkeypatch):
    from hybridsearch_tpu.models.encoder import HashingEncoder
    from hybridsearch_tpu.retrieval.searcher import Searcher

    monkeypatch.delenv("HST_SCORES_DEDUP", raising=False)
    cfg = EngineConfig()
    cfg.perf.scores_dedup = True
    Searcher(encoder=HashingEncoder(dim=64), use_query_memory=False,
             config=cfg)
    assert os.environ["HST_SCORES_DEDUP"] == "1"
    monkeypatch.delenv("HST_SCORES_DEDUP", raising=False)
