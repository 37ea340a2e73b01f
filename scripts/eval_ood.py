"""Out-of-distribution English quality report (VERDICT r4 ask 8).

Runs the 144-query hand-authored real-English retrieval eval
(hybridsearch_tpu/evaluation/ood_english.py) over every arm:

  * trained bi-encoder (models/hst-all-MiniLM-L6-v2-synth)
  * hashing encoder baseline
  * BM25 lexical baseline
  * trained cross-encoder pairwise accuracy over ~576 derived triples
    (half hard same-domain negatives)

Usage: JAX_PLATFORMS=cpu python scripts/eval_ood.py [bi_ckpt_dir]
`bi_ckpt_dir` (or $HST_BI_CKPT) pins the bi-encoder arm to an explicit
checkpoint directory instead of name discovery — how successive trained
candidates (models/hst-bi-v*) are compared on equal footing.
Prints one JSON object; paste the rows into BENCH_CONFIGS.md.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("JAX_PLATFORMS") == "cpu":
    jax.config.update("jax_platforms", "cpu")


def main() -> dict:
    from hybridsearch_tpu.evaluation import ood_english as ood
    from hybridsearch_tpu.models.encoder import HashingEncoder

    out: dict = {"eval": "ood_english_v1"}

    hashing = HashingEncoder(dim=384)
    out["hashing"] = ood.eval_retrieval(lambda t: hashing.encode(t))
    out["bm25"] = ood.eval_bm25()

    bi_ckpt = (sys.argv[1] if len(sys.argv) > 1
               else os.environ.get("HST_BI_CKPT") or None)
    try:
        from hybridsearch_tpu.models.minilm import MiniLMEncoder

        enc = MiniLMEncoder(checkpoint=bi_ckpt)
        if not enc.pretrained:
            raise RuntimeError("no trained bi-encoder checkpoint")
        out["bi_encoder"] = ood.eval_retrieval(lambda t: enc.encode(t))
        out["bi_encoder"]["weights"] = enc.weights_origin
        out["bi_encoder"]["checkpoint"] = bi_ckpt or "discovered"
    except Exception as e:  # noqa: BLE001 — report the arm as absent
        out["bi_encoder"] = {"error": f"{type(e).__name__}: {e}"}

    try:
        from hybridsearch_tpu.models.minilm import MiniLMCrossEncoder

        ce = MiniLMCrossEncoder()
        if not ce.pretrained:
            raise RuntimeError("no trained cross-encoder checkpoint")
        out["cross_encoder"] = ood.eval_cross_encoder(
            lambda pairs: ce.predict(pairs, batch_size=64))
        out["cross_encoder"]["weights"] = ce.weights_origin
    except Exception as e:  # noqa: BLE001
        out["cross_encoder"] = {"error": f"{type(e).__name__}: {e}"}

    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main()
