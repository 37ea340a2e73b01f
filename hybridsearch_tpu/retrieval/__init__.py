from hybridsearch_tpu.retrieval.searcher import Searcher  # noqa: F401
from hybridsearch_tpu.retrieval.query_memory import QueryMemory  # noqa: F401
