from hybridsearch_tpu.parallel.mesh import (  # noqa: F401
    build_mesh,
    doc_sharding,
    replicated_sharding,
)
from hybridsearch_tpu.parallel.collectives import sharded_dense_topk  # noqa: F401
