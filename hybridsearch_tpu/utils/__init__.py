from hybridsearch_tpu.utils.tracing import QueryTracer, StageTimer, trace_span  # noqa: F401
