"""Train a real cross-encoder reranker in-repo and promote it to serving.

The reference reranks on a downloaded ms-marco-MiniLM-L-6-v2 checkpoint
(reference reranker.py:19); this environment has zero egress
(docs/WEIGHTS_FETCH.log), so the real-weights path is pointwise BCE
training (training/cross.py — the MS MARCO cross-encoder recipe) on
planted-topic (query, doc, relevant?) pairs.

The checkpoint is saved in the native format models/minilm.py resolves
under the HF name (models/hst-ms-marco-MiniLM-L-6-v2-synth), so
CrossEncoderReranker's lazy MiniLMCrossEncoder("ms-marco-MiniLM-L-6-v2")
— and therefore the multi_stage funnel and /search/rerank — serve on
learned weights afterward.

Usage:
  python scripts/train_cross_encoder.py [--steps 400] [--batch 64] [--eval-only]
Prints one JSON line with train/eval metrics.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

CKPT_DIR = "./models/hst-ms-marco-MiniLM-L-6-v2-synth"


def make_triples(n_docs: int, seed: int = 0):
    """(docs, topic_of, queries, q_topic) from the planted-topic
    generator; a (q, d) pair is relevant iff topics match."""
    from benchmarks.run_configs import TOPICS, queries_for, synthetic_corpus

    docs, topic_of = synthetic_corpus(n_docs, seed=seed)
    qs = queries_for(list(range(len(TOPICS))), max(256, n_docs // 8),
                     seed=seed + 1)
    return (docs, np.asarray(topic_of), [q for q, _t in qs],
            np.asarray([t for _q, t in qs]))


def pairwise_accuracy(scores_pos: np.ndarray, scores_neg: np.ndarray) -> float:
    """P(score(relevant) > score(irrelevant)) over matched pairs."""
    return float(np.mean(scores_pos > scores_neg))


def rerank_mrr(predict, queries, q_topic, docs, topic_of,
               n_cand: int = 20, seed: int = 5) -> float:
    """MRR@n_cand when the CE reranks candidate sets containing exactly
    one relevant doc among n_cand-1 distractors."""
    rng = np.random.default_rng(seed)
    by_topic = {t: np.flatnonzero(topic_of == t)
                for t in np.unique(topic_of)}
    rr = []
    for qi in rng.choice(len(queries), size=64, replace=False):
        t = q_topic[qi]
        pos = rng.choice(by_topic[t])
        negs = rng.choice(np.flatnonzero(topic_of != t), size=n_cand - 1,
                          replace=False)
        cand = [int(pos)] + [int(i) for i in negs]
        scores = predict([(queries[qi], docs[c]) for c in cand])
        rank = int(np.argsort(-scores).tolist().index(0)) + 1
        rr.append(1.0 / rank)
    return float(np.mean(rr))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--n-docs", type=int, default=4096)
    ap.add_argument("--seq", type=int, default=64)
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--lex-frac", type=float, default=0.25,
                    help="fraction of pairs from the generic lexical-"
                         "overlap sampler (balanced pos/neg)")
    ap.add_argument("--eval-only", action="store_true")
    ap.add_argument("--out", default=CKPT_DIR)
    args = ap.parse_args()

    import jax

    if os.environ.get("JAX_PLATFORMS") == "cpu":
        # the axon TPU plugin wins over the env var; force via config
        jax.config.update("jax_platforms", "cpu")
    from hybridsearch_tpu.models.bert import BertConfig
    from hybridsearch_tpu.models.minilm import (
        MiniLMCrossEncoder,
        save_trained_checkpoint,
    )
    from hybridsearch_tpu.models.tokenizer import BertTokenizer
    from hybridsearch_tpu.training.cross import CrossEncoderTrainer

    cfg = BertConfig(vocab_size=8192, hidden_dim=384, num_layers=4,
                     num_heads=6, mlp_dim=1536, max_position=128)
    tok = BertTokenizer(vocab_path=None, vocab_size=cfg.vocab_size)
    docs, topic_of, queries, q_topic = make_triples(args.n_docs)
    rng = np.random.default_rng(11)
    by_topic = {t: np.flatnonzero(topic_of == t)
                for t in np.unique(topic_of)}

    # generic lexical-overlap pairs over random pseudo-words: relevance
    # = "the doc contains the query's words among fillers". The hashed
    # wordpiece vocab maps ANY text into the same bucket space, so a
    # scorer trained on this generalizes to arbitrary out-of-
    # distribution text as a learned soft term matcher — planted-topic
    # pairs alone leave OOD scores at tie-noise (all ~equal logits).
    # Words are generated FRESH per pair (unbounded vocabulary): a fixed
    # word list gets memorized per-bucket instead of forcing the
    # bucket-agnostic "query token appears in the doc half" solution
    # (measured: fixed 1500-word list at 25% mix -> OOD acc 0.67).
    _alpha = list("abcdefghijklmnopqrstuvwxyz")

    def _word():
        return "".join(rng.choice(_alpha, size=rng.integers(3, 10)))

    def lexical_pair(relevant: bool):
        qw = [_word() for _ in range(int(rng.integers(2, 4)))]
        fillers = [_word() for _ in range(int(rng.integers(6, 14)))]
        if relevant:
            body = fillers + qw  # doc contains the query words
        else:
            # hard negatives sometimes share ONE query word
            body = fillers + (qw[:1] if rng.random() < 0.3 else [])
        rng.shuffle(body)
        return " ".join(rng.permutation(qw)), " ".join(body)

    # lexical pairs occupy the last TWO slots of each `period`-slot
    # stripe (one relevant, one irrelevant -> balanced labels)
    period = max(4, int(round(2 / max(args.lex_frac, 1e-6))))

    def sample_batch(b):
        """Half relevant, half irrelevant; lex_frac of pairs from the
        generic lexical-overlap sampler, the rest planted-topic."""
        qi = rng.integers(0, len(queries), b)
        labels = (np.arange(b) % 2).astype(np.float32)
        pairs = []
        for j, i in enumerate(qi):
            if j % period >= period - 2:  # generic lexical pair
                pairs.append(lexical_pair(labels[j] > 0.5))
                continue
            t = q_topic[i]
            if labels[j] > 0.5:
                d = rng.choice(by_topic[t])
            else:
                d = rng.choice(np.flatnonzero(topic_of != t))
            pairs.append((queries[i], docs[int(d)]))
        ids, types, mask = tok.batch_encode_pairs(pairs, args.seq)
        return (ids, mask, types, labels), pairs

    out = {"cfg": {"layers": cfg.num_layers, "dim": cfg.hidden_dim,
                   "vocab": cfg.vocab_size}}
    if not args.eval_only:
        trainer = CrossEncoderTrainer(cfg=cfg, learning_rate=args.lr)
        t0 = time.time()
        losses = []
        for step in range(args.steps):
            batch, _pairs = sample_batch(args.batch)
            losses.append(trainer.train_step(batch))
            if step % 50 == 0:
                print(f"# step {step} loss {losses[-1]:.4f}", flush=True)
        out["train_s"] = round(time.time() - t0, 1)
        out["loss_first10"] = round(float(np.mean(losses[:10])), 4)
        out["loss_last10"] = round(float(np.mean(losses[-10:])), 4)
        save_trained_checkpoint(
            trainer.params, cfg, args.out,
            note=(f"pointwise BCE, {args.steps} steps, batch {args.batch}, "
                  f"planted-topic synthetic pairs"),
        )
        print(f"# checkpoint -> {args.out}", flush=True)

    # -- evaluation -------------------------------------------------------
    ce = MiniLMCrossEncoder(checkpoint=args.out)
    assert ce.pretrained and ce.weights_origin == "in-repo-trained"
    # matched-pair accuracy: same query, one relevant vs one irrelevant doc
    n_pairs = 256
    qi = rng.integers(0, len(queries), n_pairs)
    pos_pairs, neg_pairs = [], []
    for i in qi:
        t = q_topic[i]
        pos_pairs.append((queries[i], docs[int(rng.choice(by_topic[t]))]))
        neg_pairs.append(
            (queries[i],
             docs[int(rng.choice(np.flatnonzero(topic_of != t)))]))
    sp = ce.predict(pos_pairs)
    sn = ce.predict(neg_pairs)
    out["pairwise_acc"] = round(pairwise_accuracy(sp, sn), 4)
    out["margin_mean"] = round(float(np.mean(sp - sn)), 3)
    out["rerank_mrr@20"] = round(
        rerank_mrr(ce.predict, queries, q_topic, docs, topic_of), 4)
    # OOD sanity: real-English triples (query, relevant, irrelevant) far
    # from the synthetic training text — the learned soft term matcher
    # must rank the overlapping doc first
    ood = [
        ("machine learning patterns",
         "machine learning models learn patterns from training data",
         "boiling pasta requires salted water"),
        ("stock market earnings",
         "the stock market rallied after the earnings report",
         "gardening in spring brings colorful flowers"),
        ("neural network layers",
         "deep neural networks stack many layers of neurons",
         "the recipe calls for two cups of flour"),
        ("database index performance",
         "a database index speeds up query performance",
         "the violin section rehearsed the symphony"),
        ("solar panel efficiency",
         "solar panel efficiency improves with new materials",
         "the goalkeeper saved the penalty kick"),
        ("python error handling",
         "python error handling uses try and except blocks",
         "autumn leaves turned red and gold"),
        ("electric vehicle battery range",
         "battery chemistry determines an electric vehicle's range",
         "the bakery sells sourdough every morning"),
        ("kubernetes pod scheduling",
         "the kubernetes scheduler assigns pods to cluster nodes",
         "whales migrate thousands of miles each year"),
        ("mortgage interest rates",
         "rising interest rates cool the mortgage market",
         "the art museum opened a sculpture wing"),
        ("protein folding structure",
         "a protein's function follows from its folded structure",
         "the marathon route crosses two bridges"),
        ("wifi signal interference",
         "microwave ovens cause wifi signal interference",
         "her poetry collection won a national prize"),
        ("compiler optimization passes",
         "the compiler applies optimization passes before codegen",
         "tomatoes grow best in full summer sun"),
        ("ocean plastic pollution",
         "plastic pollution accumulates in ocean gyres",
         "the orchestra tuned before the overture"),
        ("vaccine immune response",
         "vaccines train the immune response against pathogens",
         "vintage cars gathered at the county fair"),
        ("quantum error correction",
         "quantum error correction protects fragile qubit states",
         "the chef plated the dessert with berries"),
        ("supply chain logistics",
         "logistics software tracks inventory across the supply chain",
         "the hikers reached the summit at dawn"),
        ("renewable energy grid storage",
         "grid storage smooths renewable energy's variable output",
         "the library extended its weekend hours"),
        ("speech recognition accuracy",
         "background noise degrades speech recognition accuracy",
         "the tailor hemmed the wedding dress"),
    ]
    sp_o = ce.predict([(q, p) for q, p, _n in ood])
    sn_o = ce.predict([(q, n) for q, _p, n in ood])
    out["ood_pairwise_acc"] = round(pairwise_accuracy(sp_o, sn_o), 4)
    out["ood_margin_mean"] = round(float(np.mean(sp_o - sn_o)), 3)
    out["checkpoint"] = args.out
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
