from hybridsearch_tpu.index.dense_index import DenseIndex  # noqa: F401
from hybridsearch_tpu.index.sparse_index import BM25, BM25Plus  # noqa: F401
from hybridsearch_tpu.index.builder import Indexer  # noqa: F401
