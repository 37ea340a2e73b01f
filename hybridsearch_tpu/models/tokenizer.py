"""Self-contained WordPiece tokenizer (BERT-style).

The reference gets tokenization for free from sentence-transformers
(reference core.py:118 loads all-MiniLM-L6-v2, whose checkpoint bundles a
WordPiece vocab). This environment has no weight/vocab cache and no egress,
so the tokenizer is first-party:

  - with a vocab.txt on disk (a real HF checkpoint directory), it does
    standard BERT basic tokenization (lowercase, punctuation split) +
    greedy longest-match WordPiece with ## continuation;
  - without one, `HashedVocab` maps whole words deterministically into a
    fixed id space (FNV-1a mod size) so the Flax encoder still runs with
    stable ids (random-weight benchmarking / training from scratch).
"""

from __future__ import annotations

import os
import unicodedata
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

PAD, UNK, CLS, SEP, MASK = "[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"


def _is_punctuation(ch: str) -> bool:
    cp = ord(ch)
    if (33 <= cp <= 47) or (58 <= cp <= 64) or (91 <= cp <= 96) or (123 <= cp <= 126):
        return True
    return unicodedata.category(ch).startswith("P")


def basic_tokenize(text: str, lowercase: bool = True) -> List[str]:
    """Whitespace + punctuation split with accent stripping (BERT basic)."""
    if lowercase:
        text = text.lower()
    text = unicodedata.normalize("NFD", text)
    out: List[str] = []
    buf: List[str] = []
    for ch in text:
        if unicodedata.category(ch) == "Mn":
            continue
        if ch.isspace():
            if buf:
                out.append("".join(buf))
                buf = []
        elif _is_punctuation(ch):
            if buf:
                out.append("".join(buf))
                buf = []
            out.append(ch)
        else:
            buf.append(ch)
    if buf:
        out.append("".join(buf))
    return out


class WordPieceVocab:
    def __init__(self, vocab: Dict[str, int]) -> None:
        self.vocab = vocab
        self.pad_id = vocab.get(PAD, 0)
        self.unk_id = vocab.get(UNK, 1)
        self.cls_id = vocab.get(CLS, 2)
        self.sep_id = vocab.get(SEP, 3)
        self.size = max(vocab.values()) + 1

    @classmethod
    def from_file(cls, path: str) -> "WordPieceVocab":
        vocab: Dict[str, int] = {}
        with open(path, encoding="utf-8") as f:
            for i, line in enumerate(f):
                vocab[line.rstrip("\n")] = i
        return cls(vocab)

    def wordpiece(self, word: str, max_chars: int = 100) -> List[int]:
        if len(word) > max_chars:
            return [self.unk_id]
        ids: List[int] = []
        start = 0
        while start < len(word):
            end = len(word)
            cur = None
            while start < end:
                piece = word[start:end]
                if start > 0:
                    piece = "##" + piece
                if piece in self.vocab:
                    cur = self.vocab[piece]
                    break
                end -= 1
            if cur is None:
                return [self.unk_id]
            ids.append(cur)
            start = end
        return ids


class HashedVocab:
    """Deterministic whole-word hashing vocab for weightless operation.
    Ids 0-4 are reserved for special tokens."""

    N_SPECIAL = 5

    def __init__(self, size: int = 30522) -> None:
        self.size = size
        self.pad_id, self.unk_id, self.cls_id, self.sep_id = 0, 1, 2, 3

    def wordpiece(self, word: str, max_chars: int = 100) -> List[int]:
        from hybridsearch_tpu.models.encoder import stable_hash

        return [self.N_SPECIAL + stable_hash(word) % (self.size - self.N_SPECIAL)]


class BertTokenizer:
    """BERT-style tokenizer over either vocab backend."""

    # memo bound: ~512k texts x ~60 int ids ~= 150 MB worst case;
    # cleared wholesale when full (rerank candidate sets are zipfian —
    # the hot texts repopulate within one batch)
    _CACHE_ENTRIES = 1 << 19
    _CACHE_TOK = 512  # tokens memoized per text (>= every max_len used)

    def __init__(
        self,
        vocab_path: Optional[str] = None,
        vocab_size: int = 30522,
        lowercase: bool = True,
    ) -> None:
        if vocab_path and os.path.exists(vocab_path):
            self.vocab = WordPieceVocab.from_file(vocab_path)
        else:
            self.vocab = HashedVocab(vocab_size)
        self.lowercase = lowercase
        self._seq_cache: Dict[str, Tuple[List[int], bool]] = {}

    @property
    def vocab_size(self) -> int:
        return self.vocab.size

    def _text_ids(self, text: str, need: int) -> List[int]:
        """Wordpiece ids for `text` (no special tokens), at least `need`
        tokens unless the text is shorter. Memoized per text: the rerank
        hot path tokenizes the SAME query 20x per funnel batch and the
        same hot documents every batch — host WordPiece measured 0.59 s
        per 1280 pairs, longer than the whole CE device forward."""
        hit = self._seq_cache.get(text)
        if hit is not None:
            ids, complete = hit
            if complete or len(ids) >= need:
                return ids
        ids = []
        complete = True
        for word in basic_tokenize(text, self.lowercase):
            ids.extend(self.vocab.wordpiece(word))
            if len(ids) >= self._CACHE_TOK:
                complete = False
                break
        if len(self._seq_cache) >= self._CACHE_ENTRIES:
            self._seq_cache.clear()
        self._seq_cache[text] = (ids, complete)
        return ids

    def encode(self, text: str, max_len: int = 256) -> List[int]:
        body = self._text_ids(text, max_len - 2)
        return ([self.vocab.cls_id] + body[: max_len - 2]
                + [self.vocab.sep_id])

    def encode_pair(self, text_a: str, text_b: str, max_len: int = 256) -> Tuple[List[int], List[int]]:
        """(ids, type_ids) for cross-encoder (query, doc) pairs."""
        a = ([self.vocab.cls_id]
             + self._text_ids(text_a, max_len // 2 - 2)[: max_len // 2 - 2]
             + [self.vocab.sep_id])
        b = (self._text_ids(text_b, max_len - 1 - len(a))
             [: max_len - 1 - len(a)] + [self.vocab.sep_id])
        return a + b, [0] * len(a) + [1] * len(b)

    def batch_encode(
        self,
        texts: Sequence[str],
        max_len: int = 256,
        pad_multiple: int = 8,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """(ids [B, L], mask [B, L]) padded to a bucketed length to bound the
        number of distinct XLA shapes."""
        encoded = [self.encode(t, max_len) for t in texts]
        longest = max((len(e) for e in encoded), default=1)
        L = min(max_len, _bucket(longest, pad_multiple))
        ids = np.full((len(texts), L), self.vocab.pad_id, dtype=np.int32)
        mask = np.zeros((len(texts), L), dtype=np.int32)
        for i, e in enumerate(encoded):
            e = e[:L]
            ids[i, : len(e)] = e
            mask[i, : len(e)] = 1
        return ids, mask

    def batch_encode_pairs(
        self,
        pairs: Sequence[Tuple[str, str]],
        max_len: int = 256,
        pad_multiple: int = 8,
    ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        encoded = [self.encode_pair(a, b, max_len) for a, b in pairs]
        longest = max((len(e[0]) for e in encoded), default=1)
        L = min(max_len, _bucket(longest, pad_multiple))
        ids = np.full((len(pairs), L), self.vocab.pad_id, dtype=np.int32)
        types = np.zeros((len(pairs), L), dtype=np.int32)
        mask = np.zeros((len(pairs), L), dtype=np.int32)
        for i, (e, t) in enumerate(encoded):
            e, t = e[:L], t[:L]
            ids[i, : len(e)] = e
            types[i, : len(t)] = t
            mask[i, : len(e)] = 1
        return ids, types, mask


def _bucket(n: int, multiple: int) -> int:
    """Round up to a power-of-two-ish bucket (8, 16, 32, 64, 128, 256...)."""
    b = multiple
    while b < n:
        b *= 2
    return b
