from hybridsearch_tpu.store.docstore import DocStore  # noqa: F401
