"""Module entry point: python -m hybridsearch_tpu <command>
(reference search_engine/__main__.py:1-5)."""

from hybridsearch_tpu.api.cli import main

raise SystemExit(main())
