"""MiniLM bi-encoder / cross-encoder wrappers with HF weight loading.

Provides the reference's two model roles (reference core.py:118 bi-encoder,
reranker.py:19 cross-encoder) on TPU via the Flax trunk in models/bert.py.

Weight resolution order:
  1. a sentence-transformers/HF checkpoint directory (config.json +
     pytorch_model.bin or model.safetensors + vocab.txt) found under
     $HST_MODEL_DIR, ./models/<name>, or the HF cache — converted
     torch -> flax once and used verbatim (real embedding quality);
  2. deterministic random init (seeded) — identical FLOPs/shapes for
     benchmarking and for from-scratch training.
"""

from __future__ import annotations

import functools
import os
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from hybridsearch_tpu.models.bert import BertConfig, BiEncoder, CrossEncoder
from hybridsearch_tpu.models.tokenizer import BertTokenizer

def _search_dirs() -> Tuple[str, ...]:
    """Checkpoint search roots, resolved at call time so $HST_MODEL_DIR set
    after import still takes effect."""
    return (
        os.environ.get("HST_MODEL_DIR", ""),
        os.path.expanduser("~/.cache/huggingface"),
        "./models",
    )


def find_checkpoint(name: str) -> Optional[str]:
    """Locate a checkpoint directory containing weights for `name` — an
    HF torch/safetensors checkpoint, or a native in-repo trained one
    (hst_params.npz, written by save_trained_checkpoint).

    HST_CKPT_DISCOVERY=0 disables discovery (returns None): the test
    suite pins it so engine-building tests stay on fast deterministic
    models while the repo ships trained checkpoints under ./models;
    explicit `checkpoint=` paths bypass discovery entirely."""
    if os.environ.get("HST_CKPT_DISCOVERY", "1") == "0":
        return None

    def _has_weights(d: str) -> bool:
        return any(os.path.exists(os.path.join(d, f)) for f in (
            "pytorch_model.bin", "model.safetensors", "hst_params.npz"))

    # explicit promotion first: models/PROMOTED.json maps a model name
    # to the checkpoint dir the quality evals picked (e.g. successive
    # in-repo trained candidates hst-bi-v* whose dir names don't carry
    # the HF name). A key matches when either string contains the other,
    # so "all-MiniLM-L6-v2" serves both find_checkpoint("MiniLM") and
    # the full HF name without also capturing the ms-marco CROSS-encoder.
    for base in _search_dirs():
        pj = os.path.join(base, "PROMOTED.json") if base else ""
        if pj and os.path.exists(pj):
            import json

            try:
                with open(pj) as f:
                    promoted = json.load(f)
            except (OSError, ValueError):
                promoted = {}
            for key, rel in promoted.items():
                if (key.lower() in name.lower()
                        or name.lower() in key.lower()):
                    d = rel if os.path.isabs(rel) else os.path.join(base,
                                                                    rel)
                    if os.path.isdir(d) and _has_weights(d):
                        return d
    for base in _search_dirs():
        if not base or not os.path.isdir(base):
            continue
        for root, _dirs, files in os.walk(base):
            if name.lower() in root.lower() and (
                "pytorch_model.bin" in files
                or "model.safetensors" in files
                or "hst_params.npz" in files
            ):
                return root
    return None


# -- native (in-repo trained) checkpoints ---------------------------------------


def save_trained_checkpoint(params, cfg: BertConfig, path: str,
                            note: str = "") -> None:
    """Persist a Flax param tree + config as a native checkpoint that
    find_checkpoint/MiniLMEncoder resolve exactly like an HF one. Written
    by scripts/train_encoder.py after contrastive training — the real-
    weights serving path when no HF checkpoint can be downloaded
    (zero-egress environments; see docs/WEIGHTS_FETCH.log)."""
    import json

    from flax.core import meta as flax_meta
    from flax.traverse_util import flatten_dict

    os.makedirs(path, exist_ok=True)
    # trainer params carry flax Partitioned boxes (mesh annotations);
    # strip them — apply() takes plain arrays, np.savez can't box types
    params = flax_meta.unbox(params)
    flat = {"/".join(k): np.asarray(v)
            for k, v in flatten_dict(jax.device_get(params)).items()}
    np.savez(os.path.join(path, "hst_params.npz"), **flat)
    meta = {"vocab_size": cfg.vocab_size, "hidden_dim": cfg.hidden_dim,
            "num_layers": cfg.num_layers, "num_heads": cfg.num_heads,
            "mlp_dim": cfg.mlp_dim, "max_position": cfg.max_position,
            "type_vocab_size": cfg.type_vocab_size, "note": note}
    with open(os.path.join(path, "hst_config.json"), "w") as f:
        json.dump(meta, f, indent=1)


def load_trained_checkpoint(ckpt_dir: str):
    """(params, BertConfig) from a native checkpoint directory."""
    import json

    from flax.traverse_util import unflatten_dict

    with open(os.path.join(ckpt_dir, "hst_config.json")) as f:
        meta = json.load(f)
    meta.pop("note", None)
    cfg = BertConfig(**meta)
    z = np.load(os.path.join(ckpt_dir, "hst_params.npz"))
    params = unflatten_dict(
        {tuple(k.split("/")): jnp.asarray(z[k]) for k in z.files}
    )
    return params, cfg


def _is_native_checkpoint(ckpt_dir: Optional[str]) -> bool:
    return bool(ckpt_dir) and os.path.exists(
        os.path.join(ckpt_dir, "hst_params.npz"))


def checkpoint_dim(ckpt_dir: str) -> Optional[int]:
    """Embedding width of a checkpoint directory, or None if unknown.
    Reads only the small config json — no weight load."""
    import json

    for fname, key in (("hst_config.json", "hidden_dim"),
                       ("config.json", "hidden_size")):
        p = os.path.join(ckpt_dir, fname)
        if os.path.exists(p):
            try:
                with open(p) as f:
                    return int(json.load(f)[key])
            except Exception:
                return None
    return None


def weights_available(name: str = "MiniLM") -> bool:
    return find_checkpoint(name) is not None


# -- torch -> flax conversion ---------------------------------------------------


def convert_hf_bert(state_dict, cfg: BertConfig, prefix: str = "") -> dict:
    """Map an HF BERT state_dict onto the Flax trunk's parameter tree.
    torch Linear weights are [out, in]; flax kernels are [in, out]."""

    def g(key):
        for cand in (prefix + key, key, "bert." + key):
            if cand in state_dict:
                return np.asarray(state_dict[cand], dtype=np.float32)
        raise KeyError(key)

    def lin(key):
        return {"kernel": g(key + ".weight").T, "bias": g(key + ".bias")}

    def ln(key):
        return {"scale": g(key + ".weight"), "bias": g(key + ".bias")}

    params = {
        "word_embeddings": {"embedding": g("embeddings.word_embeddings.weight")},
        "position_embeddings": {
            "embedding": g("embeddings.position_embeddings.weight")
        },
        "token_type_embeddings": {
            "embedding": g("embeddings.token_type_embeddings.weight")
        },
        "embed_ln": ln("embeddings.LayerNorm"),
    }
    for i in range(cfg.num_layers):
        b = f"encoder.layer.{i}."
        params[f"layer_{i}"] = {
            "attention": {
                "query": lin(b + "attention.self.query"),
                "key": lin(b + "attention.self.key"),
                "value": lin(b + "attention.self.value"),
                "out": lin(b + "attention.output.dense"),
            },
            "attn_ln": ln(b + "attention.output.LayerNorm"),
            "mlp_in": lin(b + "intermediate.dense"),
            "mlp_out": lin(b + "output.dense"),
            "mlp_ln": ln(b + "output.LayerNorm"),
        }
    return params


def load_checkpoint_params(ckpt_dir: str, cfg: BertConfig, head: str = "none") -> dict:
    """Load torch weights from a checkpoint dir and convert to flax params."""
    sd = None
    bin_path = os.path.join(ckpt_dir, "pytorch_model.bin")
    sft_path = os.path.join(ckpt_dir, "model.safetensors")
    if os.path.exists(sft_path):
        from safetensors.numpy import load_file  # bundled with transformers

        sd = load_file(sft_path)
    elif os.path.exists(bin_path):
        import torch

        sd = {k: v.numpy() for k, v in torch.load(bin_path, map_location="cpu",
                                                  weights_only=True).items()}
    if sd is None:
        raise FileNotFoundError(f"no weights in {ckpt_dir}")
    trunk = convert_hf_bert(sd, cfg)
    out = {"bert": trunk}
    if head == "cross":
        def g(key):
            return np.asarray(sd[key], dtype=np.float32)

        out["pooler"] = {"kernel": g("bert.pooler.dense.weight").T,
                         "bias": g("bert.pooler.dense.bias")}
        out["classifier"] = {"kernel": g("classifier.weight").T,
                             "bias": g("classifier.bias")}
    return out


# -- bi-encoder -----------------------------------------------------------------


class MiniLMEncoder:
    """Batched on-device sentence encoder (Encoder protocol)."""

    def __init__(
        self,
        dim: int = 384,
        name: str = "all-MiniLM-L6-v2",
        max_seq_len: int = 256,
        cfg: Optional[BertConfig] = None,
        seed: int = 0,
        checkpoint: Optional[str] = None,
    ) -> None:
        self.name = name
        self.dim = dim
        # an explicit cfg pins the architecture (tests/benchmarks want
        # THAT model, deterministically initialized) — never override it
        # with a discovered checkpoint's weights/width
        ckpt = checkpoint or (None if cfg is not None
                              else find_checkpoint(name))
        native = _is_native_checkpoint(ckpt)
        native_params = None
        if native:
            native_params, cfg = load_trained_checkpoint(ckpt)
            self.dim = dim = cfg.hidden_dim  # weights define the width
        vocab_file = os.path.join(ckpt, "vocab.txt") if ckpt else None
        vocab_path = vocab_file if vocab_file and os.path.exists(
            vocab_file) else None
        self.tokenizer = BertTokenizer(
            vocab_path=vocab_path,
            vocab_size=cfg.vocab_size if cfg else 30522,
        )
        self.cfg = cfg or BertConfig(
            vocab_size=self.tokenizer.vocab_size, hidden_dim=dim,
            max_position=max(512, max_seq_len),
        )
        self.max_seq_len = min(max_seq_len, self.cfg.max_position)
        self.model = BiEncoder(self.cfg)
        if native:
            self.params = native_params
            self.pretrained = True
            self.weights_origin = "in-repo-trained"
        elif ckpt:
            self.params = {"params": load_checkpoint_params(ckpt, self.cfg)}
            self.pretrained = True
            self.weights_origin = "hf"
        else:
            ids = jnp.zeros((1, 8), jnp.int32)
            mask = jnp.ones((1, 8), jnp.int32)
            self.params = self.model.init(jax.random.PRNGKey(seed), ids, mask)
            self.pretrained = False
            self.weights_origin = "random"
        self._fwd = jax.jit(self.model.apply)

    def encode(self, texts: Sequence[str], batch_size: int = 64) -> np.ndarray:
        if not len(texts):
            return np.zeros((0, self.dim), np.float32)
        # length-sort so each chunk pads to ITS OWN sequence bucket (a
        # 200k index build mixing short and long docs otherwise pads
        # everything to the batch max); the permutation is undone below
        order = sorted(range(len(texts)),
                       key=lambda i: len(texts[i].split()))
        out = np.zeros((len(texts), self.dim), np.float32)
        # async pipeline in bounded waves: enqueue every chunk's forward
        # before fetching (a per-chunk device_get serialized 3k+ host
        # round trips into a 200k build); host tokenization of chunk i+1
        # overlaps the device running chunk i, one gather drains a wave
        wave = 64  # chunks in flight (~bounded device output buffers)
        pending = []

        def _drain():
            fetched = jax.device_get([e for _sel, e in pending])
            for (sel, _e), host in zip(pending, fetched):
                out[sel] = np.asarray(host)[: len(sel)]
            pending.clear()

        for i in range(0, len(order), batch_size):
            sel = order[i : i + batch_size]
            chunk = [texts[j] for j in sel]
            ids, mask = self.tokenizer.batch_encode(chunk, self.max_seq_len)
            # pad batch to bucketed size to bound XLA shape count
            bs = _bucket_batch(len(chunk))
            if bs != len(chunk):
                ids = np.pad(ids, ((0, bs - len(chunk)), (0, 0)))
                mask = np.pad(mask, ((0, bs - len(chunk)), (0, 0)))
                mask[len(chunk):, 0] = 1  # avoid 0/0 in mean pooling
            emb = self._fwd(self.params, jnp.asarray(ids), jnp.asarray(mask))
            pending.append((sel, emb))
            if len(pending) >= wave:
                _drain()
        if pending:
            _drain()
        return out


# -- cross-encoder ------------------------------------------------------------------


class MiniLMCrossEncoder:
    """Batched on-device (query, doc) scorer (reference reranker.py:50-89)."""

    def __init__(
        self,
        name: str = "ms-marco-MiniLM-L-6-v2",
        dim: int = 384,
        max_seq_len: int = 256,
        cfg: Optional[BertConfig] = None,
        seed: int = 1,
        checkpoint: Optional[str] = None,
    ) -> None:
        self.name = name
        # explicit cfg pins the architecture — see MiniLMEncoder
        ckpt = checkpoint or (None if cfg is not None
                              else find_checkpoint(name))
        native = _is_native_checkpoint(ckpt)
        native_params = None
        if native:
            native_params, cfg = load_trained_checkpoint(ckpt)
        vocab_file = os.path.join(ckpt, "vocab.txt") if ckpt else None
        vocab_path = vocab_file if vocab_file and os.path.exists(
            vocab_file) else None
        self.tokenizer = BertTokenizer(
            vocab_path=vocab_path,
            vocab_size=cfg.vocab_size if cfg else 30522,
        )
        self.cfg = cfg or BertConfig(
            vocab_size=self.tokenizer.vocab_size, hidden_dim=dim,
            max_position=max(512, max_seq_len),
        )
        self.max_seq_len = min(max_seq_len, self.cfg.max_position)
        self.model = CrossEncoder(self.cfg)
        if native:
            self.params = native_params
            self.pretrained = True
            self.weights_origin = "in-repo-trained"
        elif ckpt:
            self.params = {
                "params": load_checkpoint_params(ckpt, self.cfg, head="cross")
            }
            self.pretrained = True
            self.weights_origin = "hf"
        else:
            ids = jnp.zeros((1, 8), jnp.int32)
            one = jnp.ones((1, 8), jnp.int32)
            self.params = self.model.init(
                jax.random.PRNGKey(seed), ids, one, jnp.zeros((1, 8), jnp.int32)
            )
            self.pretrained = False
            self.weights_origin = "random"
        self._fwd = jax.jit(self.model.apply)

    def predict(self, pairs: Sequence[Tuple[str, str]], batch_size: int = 32,
                stats: Optional[dict] = None) -> np.ndarray:
        """Relevance logits for (query, doc) pairs.

        Pairs are length-sorted before chunking so each chunk pads to ITS
        OWN sequence bucket (batch_encode_pairs rounds the chunk's longest
        pair up to a power-of-two bucket): a funnel batch mixing short and
        long documents runs the short chunks at short sequence lengths
        instead of padding everything to the global max. Both axes stay
        bucketed, so a mixed-length query stream never recompiles beyond
        the fixed bucket grid."""
        if not len(pairs):
            return np.zeros((0,), np.float32)
        # tokenize everything up front (memoized per text in the
        # tokenizer — the query side repeats k2 times per funnel batch
        # and hot documents recur across batches), then group pairs by
        # their OWN sequence bucket. One dispatch per (bucket, <=token
        # budget) group: the per-chunk protocol paid one ~50 ms tunnel
        # round trip per 128 pairs, which dwarfed the forward itself
        # (funnel t_ce 0.496 s for 10 chunks, CE MFU 0.64%).
        enc = [self.tokenizer.encode_pair(a, b, self.max_seq_len)
               for a, b in pairs]
        pad_id = self.tokenizer.vocab.pad_id
        by_bucket: dict = {}
        for j, (e, _t) in enumerate(enc):
            by_bucket.setdefault(
                min(self.max_seq_len, _bucket_seq(len(e))), []).append(j)
        # dispatch-size cap in TOKENS: bounds activation memory (the
        # [bs, heads, S, S] attention scores dominate) independent of
        # sequence bucket. 128k tokens = 2048 pairs at S=64.
        max_tok = int(os.environ.get("HST_CE_MAX_TOKENS", "131072"))
        out = np.zeros(len(pairs), np.float32)
        # async pipeline: enqueue every group's forward before fetching
        # anything; one gather at the end drains the whole stream
        pending = []  # (sel, device logits)
        for S in sorted(by_bucket):
            sel_all = by_bucket[S]
            step = max(8, min(max(batch_size, 1024), max_tok // S))
            for i in range(0, len(sel_all), step):
                sel = sel_all[i : i + step]
                bs = _bucket_batch(len(sel))
                ids = np.full((bs, S), pad_id, dtype=np.int32)
                types = np.zeros((bs, S), dtype=np.int32)
                mask = np.zeros((bs, S), dtype=np.int32)
                for r, j in enumerate(sel):
                    e, t = enc[j]
                    ids[r, : len(e)] = e
                    types[r, : len(t)] = t
                    mask[r, : len(e)] = 1
                mask[len(sel):, 0] = 1  # all-pad rows: avoid 0/0 attn
                logits = self._fwd(
                    self.params, jnp.asarray(ids), jnp.asarray(mask),
                    jnp.asarray(types)
                )
                pending.append((sel, logits))
                if stats is not None:
                    # padded-work accounting for MFU reporting: per token
                    # per layer the trunk does 8H^2 (QKVO) + 4HF (MLP) +
                    # 4HS (scores + values) FLOPs; embeddings/head are
                    # negligible
                    H, F, L = (self.cfg.hidden_dim, self.cfg.mlp_dim,
                               self.cfg.num_layers)
                    stats["tokens_padded"] = (stats.get("tokens_padded", 0)
                                              + bs * S)
                    stats["pairs"] = stats.get("pairs", 0) + len(sel)
                    stats["dispatches"] = stats.get("dispatches", 0) + 1
                    stats["flops"] = stats.get("flops", 0) + (
                        bs * S * L * (8 * H * H + 4 * H * F + 4 * H * S))
        fetched = jax.device_get([lg for _sel, lg in pending])
        for (sel, _lg), host in zip(pending, fetched):
            out[sel] = np.asarray(host)[: len(sel)]
        return out


def _bucket_batch(n: int) -> int:
    b = 8
    while b < n:
        b *= 2
    return b


def _bucket_seq(n: int) -> int:
    """Power-of-two sequence bucket from 8 (matches the tokenizer's
    pad_multiple=8 bucketing, so the XLA shape set stays identical)."""
    b = 8
    while b < n:
        b *= 2
    return b
