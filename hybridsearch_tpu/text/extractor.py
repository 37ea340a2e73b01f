"""Tokenization, preprocessing, and document loading.

Capability parity with the reference extractor (reference extractor.py:6-134):
word tokens are lowercase ``[a-z0-9_]+`` runs with an English stopword set
removed; whitespace-normalizing preprocessing; file loaders for
.txt/.md/.log/.csv/.json; recursive directory discovery.

Tokenization is a host-side O(bytes) pass; the hot path (scoring) never
re-tokenizes — token ids feed the device BM25 postings (ops/bm25.py).
A native C++ fast path lives in text/native.py (textops shared library).
"""

from __future__ import annotations

import json
import os
import re
from typing import Dict, Iterable, List, Optional, Tuple

_TOKEN_RE = re.compile(r"[A-Za-z0-9_]+")
_WS_RE = re.compile(r"\s+")
# unicode word tokens for non-ASCII text ([^\W_] = letters/digits across
# scripts); CJK runs get split into character bigrams below
_UNI_TOKEN_RE = re.compile(r"[^\W_]+", re.UNICODE)
# scripts written without spaces: CJK unified + extensions, kana, hangul,
# and Thai — token = character bigram (the standard search-engine
# fallback when no segmenter ships)
_NOSPACE_RE = re.compile(
    r"[⺀-⿿぀-ヿ㐀-䶿一-鿿"
    r"가-힯豈-﫿฀-๿]+")

# Standard English function-word stopword set (same role as reference
# extractor.py:6-12; membership kept to very common function words so BM25
# statistics stay meaningful).
STOPWORDS = frozenset(
    """a an and are as at be been but by for from had has have he her his i if
    in into is it its me my no not of on or our she so that the their them
    then there these they this to was we were what when where which who will
    with you your""".split()
)

SUPPORTED_EXTENSIONS = (".txt", ".md", ".log", ".csv", ".json")


def extract_tokens(text: str, remove_stopwords: bool = True) -> List[str]:
    """Lowercase word tokens, optionally stopword-filtered
    (reference extractor.py:15-31).

    ASCII text matches the reference's `[A-Za-z0-9_]+` exactly (parity,
    plus the native C fast path). Non-ASCII text is a deliberate
    extension the reference lacks (its regex drops accented Latin,
    Cyrillic, and every CJK character entirely, extractor.py:28):
    unicode word tokens, with runs in space-less scripts (CJK, kana,
    hangul, Thai) split into character bigrams so BM25 has postings to
    match on."""
    if text.isascii():
        try:
            from hybridsearch_tpu.text.native import native_tokenize

            toks = native_tokenize(text)
        except Exception:
            toks = _TOKEN_RE.findall(text.lower())
    else:
        toks = []
        for tok in _UNI_TOKEN_RE.findall(text.lower()):
            pos = 0
            for m in _NOSPACE_RE.finditer(tok):
                if m.start() > pos:
                    toks.append(tok[pos:m.start()])
                run = m.group()
                if len(run) == 1:
                    toks.append(run)
                else:
                    toks.extend(run[i:i + 2] for i in range(len(run) - 1))
                pos = m.end()
            if pos < len(tok):
                toks.append(tok[pos:])
    if remove_stopwords:
        toks = [t for t in toks if t not in STOPWORDS]
    return toks


def preprocess_text(text: str) -> str:
    """Collapse whitespace and strip (reference extractor.py:34-52)."""
    return _WS_RE.sub(" ", text).strip()


def extract_metadata(path: str) -> Dict[str, object]:
    """Basic file metadata (reference extractor.py:55-71)."""
    st = os.stat(path)
    return {
        "path": os.path.abspath(path),
        "filename": os.path.basename(path),
        "extension": os.path.splitext(path)[1].lower(),
        "size_bytes": st.st_size,
        "modified_at": st.st_mtime,
    }


def load_file_content(path: str) -> Optional[str]:
    """Load text from a supported file (reference extractor.py:74-102).
    JSON files are flattened to their string values."""
    ext = os.path.splitext(path)[1].lower()
    if ext not in SUPPORTED_EXTENSIONS:
        return None
    try:
        with open(path, "r", encoding="utf-8", errors="replace") as f:
            raw = f.read()
    except OSError:
        return None
    if ext == ".json":
        try:
            data = json.loads(raw)
        except json.JSONDecodeError:
            return raw
        parts: List[str] = []

        def walk(v):
            if isinstance(v, str):
                parts.append(v)
            elif isinstance(v, dict):
                for vv in v.values():
                    walk(vv)
            elif isinstance(v, list):
                for vv in v:
                    walk(vv)

        walk(data)
        return "\n".join(parts)
    return raw


def discover_documents(
    directory: str, extensions: Optional[Iterable[str]] = None
) -> List[Tuple[str, str]]:
    """Recursively find supported files and load them; returns
    [(path, content)] (reference extractor.py:105-134)."""
    exts = tuple(extensions) if extensions else SUPPORTED_EXTENSIONS
    out: List[Tuple[str, str]] = []
    for root, _dirs, files in os.walk(directory):
        for name in sorted(files):
            if os.path.splitext(name)[1].lower() not in exts:
                continue
            path = os.path.join(root, name)
            content = load_file_content(path)
            if content:
                out.append((path, preprocess_text(content)))
    return out


class Vocabulary:
    """Mutable token -> id mapping used to feed the device BM25 postings.

    id `len(vocab)` (== vocab_size) is reserved as the padding/no-op term in
    ops/bm25.py query vectors.
    """

    def __init__(self) -> None:
        self.token_to_id: Dict[str, int] = {}
        self.id_to_token: List[str] = []

    def __len__(self) -> int:
        return len(self.id_to_token)

    def add(self, token: str) -> int:
        tid = self.token_to_id.get(token)
        if tid is None:
            tid = len(self.id_to_token)
            self.token_to_id[token] = tid
            self.id_to_token.append(token)
        return tid

    def get(self, token: str, default: int = -1) -> int:
        return self.token_to_id.get(token, default)

    def copy(self) -> "Vocabulary":
        """Copy-on-write support for incremental index adds: the new state
        extends a COPY so readers of the old snapshot never see term ids
        beyond their postings' vocab_size."""
        v = Vocabulary()
        v.token_to_id = dict(self.token_to_id)
        v.id_to_token = list(self.id_to_token)
        return v

    def encode(self, tokens: Iterable[str], add: bool = False) -> List[int]:
        if add:
            return [self.add(t) for t in tokens]
        return [tid for t in tokens if (tid := self.token_to_id.get(t)) is not None]

_FNV_OFFSET = 0xCBF29CE484222325
_FNV_PRIME = 0x100000001B3
_MASK64 = 0xFFFFFFFFFFFFFFFF


def stable_token_hash(token: str) -> int:
    """Deterministic 64-bit FNV-1a over the UTF-8 token bytes — identical
    to the native hst_token_hashes contract (native/textops.cc), so hash
    vocabularies built by the C bulk path and Python queries agree."""
    h = _FNV_OFFSET
    for b in token.encode("utf-8"):
        h = ((h ^ b) * _FNV_PRIME) & _MASK64
    return h


STOP_HASHES = tuple(sorted(stable_token_hash(w) for w in STOPWORDS))


class HashVocabulary:
    """Drop-in Vocabulary keyed on stable 64-bit token hashes.

    Built by the native bulk-index path (BM25.fit_hashes): term identity is
    the FNV-1a hash of the lowercase token, so fitting never materializes
    token strings. The string-facing API (add/get/encode over tokens) hashes
    on the way in, which keeps query encoding, incremental add_tokens, and
    every sparse-index consumer working unchanged. 64-bit FNV collisions
    over real vocabularies (<10^7 terms) are ~10^-5-probability events and
    at worst merge two terms' postings."""

    def __init__(self) -> None:
        self.hash_to_id: Dict[int, int] = {}
        self.id_to_hash: List[int] = []

    @classmethod
    def from_hashes(cls, unique_hashes) -> "HashVocabulary":
        v = cls()
        v.id_to_hash = [int(h) for h in unique_hashes]
        v.hash_to_id = {h: i for i, h in enumerate(v.id_to_hash)}
        return v

    def __len__(self) -> int:
        return len(self.id_to_hash)

    def add(self, token: str) -> int:
        h = stable_token_hash(token)
        tid = self.hash_to_id.get(h)
        if tid is None:
            tid = len(self.id_to_hash)
            self.hash_to_id[h] = tid
            self.id_to_hash.append(h)
        return tid

    def get(self, token: str, default: int = -1) -> int:
        return self.hash_to_id.get(stable_token_hash(token), default)

    def copy(self) -> "HashVocabulary":
        v = HashVocabulary()
        v.hash_to_id = dict(self.hash_to_id)
        v.id_to_hash = list(self.id_to_hash)
        return v

    def encode(self, tokens: Iterable[str], add: bool = False) -> List[int]:
        if add:
            return [self.add(t) for t in tokens]
        out = []
        for t in tokens:
            tid = self.hash_to_id.get(stable_token_hash(t))
            if tid is not None:
                out.append(tid)
        return out
