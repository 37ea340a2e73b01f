"""Device kernels: dense retrieval, BM25 sparse scoring, fusion, MMR, LSH.

Each op has (a) a pure-XLA implementation that compiles well on TPU and CPU
(used in tests under a virtual multi-device CPU mesh) and, for the hot query
path, (b) a Pallas TPU kernel. The NumPy parity oracle lives in
hybridsearch_tpu.evaluation.oracle.
"""

from hybridsearch_tpu.ops.dense import (  # noqa: F401
    l2_normalize,
    cosine_scores,
    dense_topk,
    scan_dense_topk,
)
from hybridsearch_tpu.ops.fusion import (  # noqa: F401
    minmax_normalize,
    max_normalize,
    weighted_fusion,
    rrf_fusion,
)
from hybridsearch_tpu.ops.mmr import mmr_select  # noqa: F401
from hybridsearch_tpu.ops.lsh import lsh_planes, lsh_signatures  # noqa: F401
