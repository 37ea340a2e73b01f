"""Text encoders producing the document/query embedding space.

The reference uses sentence-transformers MiniLM checkpoints
(all-MiniLM-L6-v2, 384-dim; reference core.py:118, indexer.py:229-243).
This framework defines an `Encoder` protocol with two implementations:

  - `HashingEncoder` (default, offline-safe): deterministic feature-hashing
    encoder. Tokens and token bigrams hash into a fixed bucket table whose
    embeddings are drawn once from a seeded PRNG on device; a text's
    embedding is the idf-flat mean of its token-bucket vectors (bigrams
    down-weighted), L2-normalized. Cosine similarity then reflects lexical
    n-gram overlap — deterministic, no network, no weights on disk — and the
    encode itself is a batched device gather+mean under jit.

  - `MiniLMEncoder` (models/bert.py): a Flax MiniLM-class transformer that
    loads real HF sentence-transformers weights when present on disk,
    matching the reference's embedding quality.

`default_encoder()` picks MiniLM when weights are available, else hashing.
"""

from __future__ import annotations

import functools
from typing import List, Optional, Protocol, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from hybridsearch_tpu.text.extractor import extract_tokens

_FNV_OFFSET = 0xCBF29CE484222325
_FNV_PRIME = 0x100000001B3
_MASK64 = 0xFFFFFFFFFFFFFFFF


def stable_hash(token: str) -> int:
    """Deterministic 64-bit FNV-1a (Python's hash() is salted per-process)."""
    h = _FNV_OFFSET
    for b in token.encode("utf-8"):
        h = ((h ^ b) * _FNV_PRIME) & _MASK64
    return h


class Encoder(Protocol):
    dim: int
    name: str

    def encode(self, texts: Sequence[str], batch_size: int = 64) -> np.ndarray:
        """Return [len(texts), dim] float32 embeddings (not normalized)."""
        ...


@functools.partial(jax.jit, static_argnames=())
def _gather_mean(table: jax.Array, ids: jax.Array, weights: jax.Array) -> jax.Array:
    """[B, L] bucket ids + weights -> [B, D] weighted-mean embeddings."""
    vecs = jnp.take(table, ids, axis=0)  # [B, L, D]
    w = weights[..., None]
    summed = jnp.sum(vecs * w, axis=1)
    denom = jnp.maximum(jnp.sum(weights, axis=1, keepdims=True), 1e-9)
    return summed / denom


class HashingEncoder:
    """Deterministic offline feature-hashing encoder (see module docstring)."""

    def __init__(
        self,
        dim: int = 384,
        n_buckets: int = 1 << 15,
        seed: int = 42,
        bigram_weight: float = 0.5,
        max_tokens: int = 256,
        name: str = "hashing-encoder",
    ) -> None:
        self.dim = dim
        self.n_buckets = n_buckets
        self.seed = seed
        self.bigram_weight = bigram_weight
        self.max_tokens = max_tokens
        self.name = name
        self._table: Optional[jax.Array] = None

    @property
    def table(self) -> jax.Array:
        if self._table is None:
            key = jax.random.PRNGKey(self.seed)
            self._table = jax.random.normal(
                key, (self.n_buckets, self.dim), dtype=jnp.float32
            ) / jnp.sqrt(jnp.float32(self.dim))
        return self._table

    _STOP_HASHES = None

    @classmethod
    def _stop_hashes(cls):
        if cls._STOP_HASHES is None:
            from hybridsearch_tpu.text.extractor import STOPWORDS

            cls._STOP_HASHES = tuple(sorted(stable_hash(w) for w in STOPWORDS))
        return cls._STOP_HASHES

    def _features(self, text: str) -> List[tuple]:
        # fast path: tokenize + FNV hashing in one native C pass
        # (hash-identical to the Python path below; ~10x faster indexing).
        # ASCII only — non-ASCII text needs the unicode tokenizer below
        # (extract_tokens CJK-bigrams space-less scripts)
        try:
            if not text.isascii():
                raise ImportError
            from hybridsearch_tpu.text.native import token_hashes

            uni, bi = token_hashes(text, self._stop_hashes())
            feats = [(int(h) % self.n_buckets, 1.0) for h in uni]
            feats += [(int(h) % self.n_buckets, self.bigram_weight) for h in bi]
            return feats[: self.max_tokens] or [(0, 0.0)]
        except ImportError:
            pass
        toks = extract_tokens(text)
        feats = [(stable_hash(t) % self.n_buckets, 1.0) for t in toks]
        for a, b in zip(toks, toks[1:]):
            feats.append((stable_hash(a + "_" + b) % self.n_buckets, self.bigram_weight))
        return feats[: self.max_tokens] or [(0, 0.0)]

    def _feature_arrays(self, text: str):
        """(ids, weights) numpy arrays for one text — vectorized fast path
        over the native tokenize+hash pass."""
        try:
            if not text.isascii():
                raise ImportError  # unicode path below
            from hybridsearch_tpu.text.native import token_hashes

            uni, bi = token_hashes(text, self._stop_hashes())
            ids = np.concatenate([uni, bi]).astype(np.int64) % self.n_buckets
            ws = np.concatenate([
                np.ones(len(uni), np.float32),
                np.full(len(bi), self.bigram_weight, np.float32),
            ])
        except ImportError:
            feats = self._features(text)
            ids = np.asarray([f for f, _w in feats], dtype=np.int64)
            ws = np.asarray([w for _f, w in feats], dtype=np.float32)
        ids = ids[: self.max_tokens]
        ws = ws[: self.max_tokens]
        if len(ids) == 0:
            ids = np.zeros(1, np.int64)
            ws = np.zeros(1, np.float32)
        return ids.astype(np.int32), ws

    def encode(self, texts: Sequence[str], batch_size: int = 64) -> np.ndarray:
        if not len(texts):
            return np.zeros((0, self.dim), dtype=np.float32)
        feats = [self._feature_arrays(t) for t in texts]
        L = max(len(f[0]) for f in feats)
        # Bucket pad length to limit jit recompiles across calls.
        L = max(8, 1 << (L - 1).bit_length())
        B = len(texts)
        ids = np.zeros((B, L), dtype=np.int32)
        ws = np.zeros((B, L), dtype=np.float32)
        for i, (fid, w) in enumerate(feats):
            ids[i, : len(fid)] = fid
            ws[i, : len(w)] = w
        out = _gather_mean(self.table, jnp.asarray(ids), jnp.asarray(ws))
        return np.asarray(out, dtype=np.float32)


class ByteTrigramEncoder(HashingEncoder):
    """Language-agnostic byte-trigram hashing encoder.

    The multilingual arm that needs NO weights and NO tokenizer: features
    are hashed UTF-8 byte trigrams, so every script — CJK, Arabic,
    Cyrillic, Devanagari, emoji — produces overlapping features, and
    same-language near-duplicates/paraphrase-with-shared-morphology land
    close. (Cross-LANGUAGE alignment still needs a trained multilingual
    checkpoint; services/language.py swaps one in when it exists —
    reference language.py:171-225 requires sentence-transformers or
    raises.) Shares the random-projection table + mean-pool design with
    HashingEncoder, so the index/serving path is identical."""

    def __init__(self, dim: int = 384, n_buckets: int = 1 << 15,
                 seed: int = 7, max_tokens: int = 512,
                 name: str = "byte-trigram-encoder") -> None:
        super().__init__(dim=dim, n_buckets=n_buckets, seed=seed,
                         bigram_weight=0.0, max_tokens=max_tokens,
                         name=name)

    def _feature_arrays(self, text: str):
        raw = (" " + " ".join(text.lower().split()) + " ").encode("utf-8")
        if len(raw) < 3:
            return np.zeros(1, np.int32), np.zeros(1, np.float32)
        arr = np.frombuffer(raw, dtype=np.uint8).astype(np.int64)
        # FNV-1a over each byte trigram, vectorized
        h = np.full(len(arr) - 2, 0xCBF29CE484222325, dtype=np.uint64)
        for k in range(3):
            h = (h ^ arr[k:len(arr) - 2 + k].astype(np.uint64))
            h = h * np.uint64(0x100000001B3)
        ids = (h % np.uint64(self.n_buckets)).astype(np.int64)
        # tf weights: repeated trigrams accumulate via duplicate ids in
        # the gather-mean, so plain ones suffice
        ws = np.ones(len(ids), np.float32)
        if len(ids) > self.max_tokens:
            ids = ids[: self.max_tokens]
            ws = ws[: self.max_tokens]
        return ids.astype(np.int32), ws

    def _features(self, text: str):
        ids, ws = self._feature_arrays(text)
        return list(zip(ids.tolist(), ws.tolist()))


def default_encoder(dim: int = 384, kind: str = "auto", **kwargs) -> Encoder:
    """Pick the best available encoder: MiniLM with real weights if present,
    else the deterministic hashing encoder.

    `HST_ENCODER` (hashing|minilm|auto) overrides an "auto" kind — tests
    pin hashing for speed/determinism (tests/conftest.py); serving and
    benchmarks leave it unset so real weights win when on disk. In auto
    mode a discovered checkpoint is only served when its width matches
    the requested `dim` — the caller's embedding space is a contract
    with the index it was built against."""
    import os

    if kind == "auto":
        kind = os.environ.get("HST_ENCODER", "auto")
    if kind in ("auto", "minilm"):
        try:
            from hybridsearch_tpu.models.minilm import (
                MiniLMEncoder,
                checkpoint_dim,
                find_checkpoint,
            )

            ckpt = find_checkpoint("MiniLM")
            if kind == "auto" and ckpt and checkpoint_dim(ckpt) not in (None, dim):
                ckpt = None  # width mismatch: keep the requested space
            if kind == "minilm" or ckpt:
                # pass the resolved directory so a trained in-repo
                # checkpoint (e.g. models/hst-all-MiniLM-L6-v2-synth)
                # loads even though its dir name isn't the HF name
                return MiniLMEncoder(dim=dim, checkpoint=ckpt, **kwargs)
        except Exception:
            if kind == "minilm":
                raise
    return HashingEncoder(dim=dim, **kwargs)
