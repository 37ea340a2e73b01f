"""Train a real bi-encoder in-repo and promote it to the serving path.

The reference serves on downloaded all-MiniLM-L6-v2 weights (reference
core.py:118); this environment has zero egress (docs/WEIGHTS_FETCH.log),
so the real-weights path is contrastive training from scratch
(training/contrastive.py: symmetric InfoNCE, in-batch negatives — the
sentence-transformers MultipleNegativesRankingLoss recipe) on the
synthetic planted-topic corpus the BENCH_CONFIGS quality harness uses.

The trained checkpoint is saved in the native format models/minilm.py
resolves (models/hst-all-MiniLM-L6-v2-synth/hst_params.npz), so
default_encoder("auto") — and therefore every pipeline/config — serves
on learned weights afterward.

Usage:
  python scripts/train_encoder.py [--steps 300] [--batch 64] [--eval-only]
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

CKPT_DIR = "./models/hst-all-MiniLM-L6-v2-synth"


def make_pairs(n_docs: int, seed: int = 0):
    """(docs, topic_of, queries, q_topic) from the planted-topic
    generator (benchmarks/run_configs.py) — positives share a topic."""
    from benchmarks.run_configs import TOPICS, queries_for, synthetic_corpus

    docs, topic_of = synthetic_corpus(n_docs, seed=seed)
    qs = queries_for(list(range(len(TOPICS))), max(256, n_docs // 8),
                     seed=seed + 1)
    queries = [q for q, _t in qs]
    q_topic = np.asarray([t for _q, t in qs])
    return docs, np.asarray(topic_of), queries, q_topic


def recall_at_10(q_emb: np.ndarray, d_emb: np.ndarray, q_topic, topic_of):
    """Fraction of queries whose top-10 dense hits share their topic
    (mean precision@10 against the planted relevance)."""
    sims = q_emb @ d_emb.T
    top = np.argsort(-sims, axis=1)[:, :10]
    return float(np.mean(topic_of[top] == q_topic[:, None]))


def semantic_generalization_eval(encode, seed: int = 7):
    """p@10 with ZERO lexical overlap between queries and documents:
    each topic's keyword set is split into disjoint query words and doc
    words, so a hashing/lexical encoder scores near chance (1/n_topics)
    and only co-occurrence learned during training can solve it. This is
    the differentiator the shared-token p@10 hides (both encoders hit
    1.0 there)."""
    from benchmarks.run_configs import TOPICS, _FILLER

    rng = np.random.default_rng(seed)
    docs, topic_of, queries, q_topic = [], [], [], []
    for t, (name, words) in enumerate(TOPICS):
        qw, dw = list(words[:2]), list(words[2:])
        for i in range(120):
            body = list(rng.choice(dw, size=3)) + list(
                rng.choice(_FILLER, size=rng.integers(5, 12)))
            rng.shuffle(body)
            docs.append(" ".join(body))  # no topic name, no query words
            topic_of.append(t)
        for i in range(24):
            queries.append(" ".join(rng.permutation(qw)))
            q_topic.append(t)
    d_emb = encode(docs)
    q_emb = encode(queries)
    return recall_at_10(q_emb, d_emb, np.asarray(q_topic),
                        np.asarray(topic_of))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--n-docs", type=int, default=4096)
    ap.add_argument("--seq", type=int, default=48)
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--eval-only", action="store_true")
    ap.add_argument("--save-every", type=int, default=0,
                    help="periodic checkpoint interval in steps (0 = "
                         "only at the end); long CPU runs survive kills")
    ap.add_argument("--out", default=CKPT_DIR)
    args = ap.parse_args()

    import jax

    if os.environ.get("JAX_PLATFORMS") == "cpu":
        # the axon TPU plugin wins over the env var; force via config
        # BEFORE backend init (jax.default_backend() would try — and on
        # a wedged tunnel hang on — the axon plugin)
        jax.config.update("jax_platforms", "cpu")
    from hybridsearch_tpu.models.bert import BertConfig
    from hybridsearch_tpu.models.encoder import HashingEncoder
    from hybridsearch_tpu.models.minilm import (
        MiniLMEncoder,
        save_trained_checkpoint,
    )
    from hybridsearch_tpu.models.tokenizer import BertTokenizer
    from hybridsearch_tpu.training.contrastive import ContrastiveTrainer

    cfg = BertConfig(vocab_size=8192, hidden_dim=384, num_layers=4,
                     num_heads=6, mlp_dim=1536, max_position=64)
    tok = BertTokenizer(vocab_path=None, vocab_size=cfg.vocab_size)
    docs, topic_of, queries, q_topic = make_pairs(args.n_docs)
    rng = np.random.default_rng(3)

    out = {"cfg": {"layers": cfg.num_layers, "dim": cfg.hidden_dim,
                   "vocab": cfg.vocab_size}}
    # generic lexical-overlap pairs over random pseudo-words (same
    # augmentation as scripts/train_cross_encoder.py): query = a few of
    # the doc's words. The hashed wordpiece vocab maps ANY text into the
    # same bucket space, so InfoNCE on these teaches "token overlap ->
    # closeness" for arbitrary out-of-distribution text — planted-topic
    # pairs alone leave OOD embeddings unshaped.
    # words generated FRESH per pair (unbounded vocabulary): a fixed
    # word list gets memorized per hash bucket instead of forcing the
    # bucket-agnostic overlap solution (measured on the cross-encoder:
    # fixed 1500-word list -> OOD accuracy collapse; and here: synth-
    # BEIR ndcg 0.872 vs 0.966 for pure hashing before this fix)
    _alpha = list("abcdefghijklmnopqrstuvwxyz")
    # real English function words sprinkled into generated docs: OOD
    # English is ~40% stopwords, and a model trained on pure content-word
    # streams meets them at eval time as unfamiliar dilution in the mean
    # pool (round-5 OOD eval: partial-overlap p@1 0.33 vs 0.52 hashing)
    _FUNC = ("the a an of to in and for with on is are was that this "
             "its by as at from").split()

    def _word():
        return "".join(rng.choice(_alpha, size=rng.integers(3, 10)))

    def _sprinkle(words):
        out_w = []
        for w in words:
            if rng.random() < 0.35:
                out_w.append(str(rng.choice(_FUNC)))
            out_w.append(w)
        return " ".join(out_w)

    def lexical_group(k: int = 4):
        """k TRUE (query, positive) pairs drawn from ONE shared word
        pool, query word sets disjoint across the group. Placed in the
        same batch, every other row's doc shares the pool vocabulary
        with my query but lacks my query words — an in-batch HARD
        negative. InfoNCE then has to learn GRADED overlap (rank two
        shared terms above pool-only overlap) instead of the binary
        any-overlap-vs-none the old fully-random negatives taught —
        that model lost to the hashing baseline on the partial-overlap
        OOD tier (scripts/eval_ood.py, round 5)."""
        pool = [_word() for _ in range(10 + 3 * k)]
        free = list(rng.permutation(pool))
        qsets = []
        for _ in range(k):
            take = int(rng.integers(2, 4))
            if len(free) < take + 6:
                break
            qsets.append(free[:take])
            free = free[take:]
        rows = []
        for qw in qsets:
            # fillers come from the query-word-free remainder so no row's
            # doc accidentally contains ANOTHER row's full query (that
            # would be a false in-batch negative)
            body = qw + list(rng.choice(free, size=int(
                rng.integers(6, 12))))
            rng.shuffle(body)
            rows.append((_sprinkle(list(rng.permutation(qw))),
                         _sprinkle(body)))
        return rows

    if not args.eval_only:
        trainer = ContrastiveTrainer(cfg=cfg, learning_rate=args.lr)
        # batches: query = a fresh topic query string, positive = a doc
        # of the same topic; in-batch negatives come from other topics
        # (the planted analog of MS MARCO (query, passage) pairs).
        # Half of each batch is generic lexical-overlap pairs.
        by_topic = {t: np.flatnonzero(topic_of == t)
                    for t in np.unique(topic_of)}
        t0 = time.time()
        losses = []
        for step in range(args.steps):
            qi = rng.integers(0, len(queries), args.batch)
            q_texts, d_texts = [], []
            use_group = True
            while len(q_texts) < args.batch:
                if use_group:
                    # a shared-pool group of TRUE pairs: each row's doc
                    # is a hard in-batch negative for the group's other
                    # rows (same vocabulary pool, different query words)
                    for lq, ld in lexical_group(4):
                        if len(q_texts) >= args.batch:
                            break
                        q_texts.append(lq)
                        d_texts.append(ld)
                else:
                    i = qi[len(q_texts) % len(qi)]
                    q_texts.append(queries[i])
                    d_texts.append(docs[rng.choice(by_topic[q_topic[i]])])
                use_group = not use_group
            q_ids, q_mask = tok.batch_encode(q_texts, args.seq)
            d_ids, d_mask = tok.batch_encode(d_texts, args.seq)
            loss = trainer.train_step((q_ids, q_mask, d_ids, d_mask))
            losses.append(loss)
            if step % 50 == 0:
                print(f"# step {step} loss {loss:.4f}", flush=True)
            if args.save_every and step and step % args.save_every == 0:
                save_trained_checkpoint(
                    trainer.params, cfg, args.out,
                    note=(f"contrastive InfoNCE, {step}/{args.steps} "
                          f"steps (periodic), batch {args.batch}"))
                print(f"# periodic checkpoint @ step {step}", flush=True)
        out["train_s"] = round(time.time() - t0, 1)
        out["loss_first10"] = round(float(np.mean(losses[:10])), 4)
        out["loss_last10"] = round(float(np.mean(losses[-10:])), 4)
        save_trained_checkpoint(
            trainer.params, cfg, args.out,
            note=(f"contrastive InfoNCE, {args.steps} steps, batch "
                  f"{args.batch}, planted-topic synthetic corpus"),
        )
        print(f"# checkpoint -> {args.out}", flush=True)

    # -- evaluation: trained encoder vs the hashing baseline -------------
    enc = MiniLMEncoder(checkpoint=args.out)
    assert enc.pretrained and enc.weights_origin == "in-repo-trained"
    n_eval = min(2048, len(docs))
    d_emb = enc.encode(docs[:n_eval])
    q_emb = enc.encode(queries[:256])
    out["trained_p@10"] = round(
        recall_at_10(q_emb, d_emb, q_topic[:256], topic_of[:n_eval]), 4)
    hashing = HashingEncoder(dim=384)
    out["hashing_p@10"] = round(
        recall_at_10(hashing.encode(queries[:256]),
                     hashing.encode(docs[:n_eval]),
                     q_topic[:256], topic_of[:n_eval]), 4)
    # disjoint-words eval: chance is 1/6; hashing has no signal here
    out["trained_semgen_p@10"] = round(
        semantic_generalization_eval(enc.encode), 4)
    out["hashing_semgen_p@10"] = round(
        semantic_generalization_eval(hashing.encode), 4)
    # OOD sanity: real-English triples far from the synthetic training
    # text — cosine must rank the overlapping doc first
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
    ]
    qe = enc.encode([q for q, _p, _n in ood])
    pe = enc.encode([p for _q, p, _n in ood])
    ne = enc.encode([n for _q, _p, n in ood])
    out["ood_pairwise_acc"] = round(
        float(np.mean(np.sum(qe * pe, 1) > np.sum(qe * ne, 1))), 4)
    out["checkpoint"] = args.out
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
