from hybridsearch_tpu.evaluation.metrics import (  # noqa: F401
    precision_at_k,
    recall_at_k,
    f1_at_k,
    mrr,
    ndcg_at_k,
    latency_percentiles,
)
from hybridsearch_tpu.evaluation import oracle  # noqa: F401
