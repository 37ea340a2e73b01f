from hybridsearch_tpu.api.app import EngineState, Router, build_router  # noqa: F401
