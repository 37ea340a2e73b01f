"""ctypes bindings to the native C++ textops library (native/textops.cc).

Provides host-side hot-loop primitives that the reference outsourced to
third-party native deps (rapidfuzz C++ edit distance, reference core.py:185;
regex tokenization): tokenize, Levenshtein distance, partial_ratio, and
MinHash shingle hashing. Pure-Python fallbacks keep everything working when
the library hasn't been built (build with `make -C native`).
"""

from __future__ import annotations

import ctypes
import os
from typing import List, Optional

_LIB: Optional[ctypes.CDLL] = None
_LOAD_TRIED = False


def _try_build(src_dir: str) -> None:
    """Build libtextops.so on first use when a toolchain exists (a fresh
    checkout has only the .cc source; without this, indexing silently
    falls back to the ~10x slower per-token Python hash path)."""
    import subprocess

    try:
        subprocess.run(
            ["make", "-C", src_dir],
            check=True, capture_output=True, timeout=120,
        )
    except Exception:
        pass  # no toolchain / failed build -> Python fallbacks


def _lib() -> Optional[ctypes.CDLL]:
    global _LIB, _LOAD_TRIED
    if _LOAD_TRIED:
        return _LIB
    _LOAD_TRIED = True
    here = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    native_dir = os.path.join(here, "native")
    if not os.path.exists(os.path.join(native_dir, "libtextops.so")) and (
        os.path.exists(os.path.join(native_dir, "Makefile"))
    ):
        _try_build(native_dir)
    for cand in (
        os.path.join(here, "native", "libtextops.so"),
        os.path.join(os.path.dirname(__file__), "libtextops.so"),
    ):
        if os.path.exists(cand):
            try:
                lib = ctypes.CDLL(cand)
                lib.hst_tokenize.restype = ctypes.c_int64
                lib.hst_tokenize.argtypes = [
                    ctypes.c_char_p, ctypes.c_int64,
                    ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
                    ctypes.c_int64,
                ]
                lib.hst_levenshtein.restype = ctypes.c_int64
                lib.hst_levenshtein.argtypes = [
                    ctypes.c_char_p, ctypes.c_int64, ctypes.c_char_p, ctypes.c_int64
                ]
                lib.hst_partial_ratio.restype = ctypes.c_double
                lib.hst_partial_ratio.argtypes = [
                    ctypes.c_char_p, ctypes.c_int64, ctypes.c_char_p, ctypes.c_int64
                ]
                lib.hst_minhash_shingles.restype = ctypes.c_int64
                lib.hst_minhash_shingles.argtypes = [
                    ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64,
                    ctypes.POINTER(ctypes.c_uint64), ctypes.c_int64,
                ]
                lib.hst_token_hashes.restype = ctypes.c_int64
                lib.hst_token_hashes.argtypes = [
                    ctypes.c_char_p, ctypes.c_int64,
                    ctypes.POINTER(ctypes.c_uint64), ctypes.c_int64,
                    ctypes.POINTER(ctypes.c_uint64),
                    ctypes.POINTER(ctypes.c_uint64), ctypes.c_int64,
                ]
                if hasattr(lib, "hst_token_hashes_docs"):
                    lib.hst_token_hashes_docs.restype = ctypes.c_int64
                    lib.hst_token_hashes_docs.argtypes = [
                        ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64),
                        ctypes.c_int64,
                        ctypes.POINTER(ctypes.c_uint64), ctypes.c_int64,
                        ctypes.POINTER(ctypes.c_uint64), ctypes.c_int64,
                        ctypes.POINTER(ctypes.c_int64),
                    ]
                _LIB = lib
            except OSError:
                _LIB = None
            break
    return _LIB


def native_available() -> bool:
    return _lib() is not None


def native_tokenize(text: str) -> List[str]:
    """Tokenize via the C++ library. Raises if unavailable (callers fall back
    to the Python regex path)."""
    lib = _lib()
    if lib is None:
        raise ImportError("libtextops.so not built")
    data = text.encode("utf-8", errors="replace")
    cap = max(16, len(data) // 2 + 1)
    starts = (ctypes.c_int64 * cap)()
    ends = (ctypes.c_int64 * cap)()
    n = lib.hst_tokenize(data, len(data), starts, ends, cap)
    lowered = data.lower()
    return [lowered[starts[i] : ends[i]].decode("utf-8", "replace") for i in range(n)]


_STOP_HASH_CACHE: dict = {}


def _stop_hash_array(stop_hashes: "tuple"):
    """Sorted uint64 stop-hash array, cached by tuple VALUE. An id()
    key can silently serve a stale set when a GC'd temporary's id is
    reused by a different tuple (ADVICE r3)."""
    import numpy as np

    arr = _STOP_HASH_CACHE.get(stop_hashes)
    if arr is None:
        arr = np.sort(np.asarray(stop_hashes, dtype=np.uint64))
        _STOP_HASH_CACHE[stop_hashes] = arr
    return arr


def token_hashes(text: str, stop_hashes: "tuple") -> "tuple":
    """(unigram_hashes, bigram_hashes) of lowercase word tokens with
    stopwords removed — one C pass, hash-identical to Python stable_hash
    over extract_tokens output. Raises ImportError without the library."""
    import numpy as np

    lib = _lib()
    if lib is None:
        raise ImportError("libtextops.so not built")
    arr = _stop_hash_array(stop_hashes)
    data = text.encode("utf-8", errors="replace")
    cap = max(16, len(data) // 2 + 1)
    uni = np.empty(cap, dtype=np.uint64)
    bi = np.empty(cap, dtype=np.uint64)
    n = lib.hst_token_hashes(
        data, len(data),
        arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)), len(arr),
        uni.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        bi.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)), cap,
    )
    return uni[:n], bi[: max(0, n - 1)]


def token_hashes_docs(texts, stop_hashes: "tuple"):
    """(hashes uint64 [total], counts int64 [n_docs]) — lowercase word-token
    FNV-1a hashes with stopwords removed for a WHOLE document batch in one
    C call (the bulk-index fast path: no per-doc Python, no token strings).
    Hash-identical to stable_hash over extract_tokens output. Raises
    ImportError when the library (or the batch symbol) is unavailable."""
    import numpy as np

    lib = _lib()
    if lib is None or not hasattr(lib, "hst_token_hashes_docs"):
        raise ImportError("libtextops.so with hst_token_hashes_docs needed")
    arr = _stop_hash_array(stop_hashes)
    blobs = [t.encode("utf-8", errors="replace") for t in texts]
    offsets = np.zeros(len(blobs) + 1, dtype=np.int64)
    np.cumsum([len(b) for b in blobs], out=offsets[1:])
    data = b"".join(blobs)
    counts = np.zeros(len(blobs), dtype=np.int64)
    cap = max(16, len(data) // 2 + 1)
    while True:
        out = np.empty(cap, dtype=np.uint64)
        n = lib.hst_token_hashes_docs(
            data, offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            len(blobs),
            arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)), len(arr),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)), cap,
            counts.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        )
        if n >= 0:
            return out[:n], counts
        cap *= 2  # capacity overflow: retry with a larger buffer


def levenshtein(a: str, b: str) -> int:
    lib = _lib()
    if lib is not None:
        ab, bb = a.encode(), b.encode()
        return int(lib.hst_levenshtein(ab, len(ab), bb, len(bb)))
    # Python fallback (two-row DP)
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def partial_ratio(a: str, b: str) -> float:
    """Best-window similarity of the shorter string against the longer, in
    [0, 100] — same contract as rapidfuzz.fuzz.partial_ratio used by the
    reference's fuzzy lexical arm (reference core.py:185)."""
    lib = _lib()
    if lib is not None:
        ab, bb = a.encode(), b.encode()
        return float(lib.hst_partial_ratio(ab, len(ab), bb, len(bb)))
    if not a or not b:
        return 0.0
    short, long_ = (a, b) if len(a) <= len(b) else (b, a)
    n = len(short)
    best = 0.0
    for start in range(0, len(long_) - n + 1) or [0]:
        window = long_[start : start + n]
        dist = levenshtein(short, window)
        score = 100.0 * (1.0 - dist / max(n, 1))
        if score > best:
            best = score
        if best >= 100.0:
            break
    return best


def minhash_shingle_hashes(text: str, shingle_len: int = 3) -> List[int]:
    """64-bit FNV-1a hashes of character shingles (dedup fingerprinting,
    reference deduplication.py:84-124)."""
    lib = _lib()
    data = text.encode("utf-8", errors="replace")
    n_shingles = max(0, len(data) - shingle_len + 1)
    if lib is not None and n_shingles > 0:
        out = (ctypes.c_uint64 * n_shingles)()
        n = lib.hst_minhash_shingles(data, len(data), shingle_len, out, n_shingles)
        return list(out[:n])
    # Python FNV-1a fallback
    hashes = []
    for i in range(n_shingles):
        h = 0xCBF29CE484222325
        for byte in data[i : i + shingle_len]:
            h = ((h ^ byte) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
        hashes.append(h)
    return hashes
