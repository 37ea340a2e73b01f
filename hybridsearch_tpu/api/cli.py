"""Command-line interface.

Parity with the reference CLI (reference cli.py:26-240): the 7 subcommands
search / index / add / stats / export / import / serve, plus bench and demo.
`python -m hybridsearch_tpu <cmd>` (see hybridsearch_tpu/__main__.py).
"""

from __future__ import annotations

import argparse
import json
import sys
from typing import List, Optional


def _build_searcher(args):
    from hybridsearch_tpu.retrieval.searcher import Searcher

    s = Searcher(db_path=args.db)
    s.indexer.reload()
    return s


def cmd_search(args) -> int:
    s = _build_searcher(args)
    if not s.indexer.contents:
        print("index is empty — run `index` first", file=sys.stderr)
        return 1
    results = s.search(args.query, top_k=args.top_k,
                       semantic_weight=args.semantic_weight,
                       lexical_weight=args.lexical_weight)
    for rank, (score, content, doc_id) in enumerate(results, 1):
        preview = content[:120].replace("\n", " ")
        print(f"{rank:2d}. [{score:.4f}] (doc {doc_id}) {preview}")
    return 0


def cmd_index(args) -> int:
    from hybridsearch_tpu.index.builder import Indexer
    from hybridsearch_tpu.text.extractor import discover_documents

    with Indexer(db_path=args.db) as ix:
        docs = discover_documents(args.directory)
        if not docs:
            print(f"no supported documents under {args.directory}",
                  file=sys.stderr)
            return 1
        stats = ix.index_documents([c for _p, c in docs], [p for p, _c in docs])
        if args.save:
            ix.save(args.save)
        print(f"indexed {stats['indexed']} documents from {args.directory}")
    return 0


def cmd_add(args) -> int:
    from hybridsearch_tpu.index.builder import Indexer

    with Indexer(db_path=args.db) as ix:
        ix.reload()
        texts: List[str] = []
        if args.text:
            texts.append(args.text)
        if args.file:
            from hybridsearch_tpu.text.extractor import load_file_content

            content = load_file_content(args.file)
            if content:
                texts.append(content)
        if not texts:
            print("nothing to add (use --text or --file)", file=sys.stderr)
            return 1
        ids = ix.add_documents(texts)
        print(f"added doc ids: {ids}")
    return 0


def cmd_stats(args) -> int:
    s = _build_searcher(args)
    print(json.dumps(s.get_stats(), indent=2, default=str))
    return 0


def cmd_export(args) -> int:
    from hybridsearch_tpu.index.builder import Indexer

    with Indexer(db_path=args.db) as ix:
        ix.reload()
        ix.export_json(args.output)
        print(f"exported {len(ix.contents)} documents to {args.output}")
    return 0


def cmd_import(args) -> int:
    from hybridsearch_tpu.index.builder import Indexer

    with Indexer(db_path=args.db) as ix:
        n = ix.import_json(args.input)
        print(f"imported {n} documents from {args.input}")
    return 0


def cmd_serve(args) -> int:
    from hybridsearch_tpu.api.app import EngineState
    from hybridsearch_tpu.api.httpd import serve

    state = EngineState(db_path=args.db, auth_enabled=args.auth)
    n = state.indexer.reload()
    print(f"loaded {n} documents from {args.db}")
    if args.fastapi:
        try:
            import uvicorn

            from hybridsearch_tpu.api.fastapi_app import create_app

            uvicorn.run(create_app(state), host=args.host, port=args.port)
            return 0
        except ImportError:
            print("fastapi/uvicorn not installed; using stdlib server",
                  file=sys.stderr)
    serve(state, host=args.host, port=args.port)
    return 0


def cmd_demo(args) -> int:
    from hybridsearch_tpu.demo import run_demo

    run_demo()
    return 0


def cmd_bench(args) -> int:
    import subprocess

    return subprocess.call([sys.executable, "bench.py"])


def main(argv: Optional[List[str]] = None) -> int:
    parser = argparse.ArgumentParser(
        prog="hybridsearch_tpu",
        description="TPU-native hybrid search engine",
    )
    parser.add_argument("--db", default="hybridsearch.db",
                        help="sqlite docstore path")
    parser.add_argument("-v", "--verbose", action="store_true")
    sub = parser.add_subparsers(dest="command", required=True)

    p = sub.add_parser("search", help="query the index")
    p.add_argument("query")
    p.add_argument("--top-k", type=int, default=5)
    p.add_argument("--semantic-weight", type=float, default=None)
    p.add_argument("--lexical-weight", type=float, default=None)
    p.set_defaults(fn=cmd_search)

    p = sub.add_parser("index", help="index a directory")
    p.add_argument("directory")
    p.add_argument("--save", default=None, help="persist engine manifest dir")
    p.set_defaults(fn=cmd_index)

    p = sub.add_parser("add", help="add a document")
    p.add_argument("--text", default=None)
    p.add_argument("--file", default=None)
    p.set_defaults(fn=cmd_add)

    p = sub.add_parser("stats", help="index + query statistics")
    p.set_defaults(fn=cmd_stats)

    p = sub.add_parser("export", help="export docs+vectors to JSON")
    p.add_argument("output")
    p.set_defaults(fn=cmd_export)

    p = sub.add_parser("import", help="import docs+vectors from JSON")
    p.add_argument("input")
    p.set_defaults(fn=cmd_import)

    p = sub.add_parser("serve", help="start the REST API")
    p.add_argument("--host", default="0.0.0.0")
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--auth", action="store_true", help="enforce API keys")
    p.add_argument("--fastapi", action="store_true",
                   help="prefer fastapi/uvicorn when installed")
    p.set_defaults(fn=cmd_serve)

    p = sub.add_parser("demo", help="run the bundled demo")
    p.set_defaults(fn=cmd_demo)

    p = sub.add_parser("bench", help="run the headline benchmark")
    p.set_defaults(fn=cmd_bench)

    args = parser.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
