"""Extractor, chunker, native textops, and encoder tests."""

import numpy as np
import pytest

from hybridsearch_tpu.models.encoder import HashingEncoder, stable_hash
from hybridsearch_tpu.text import chunker as ck
from hybridsearch_tpu.text import native
from hybridsearch_tpu.text.extractor import (
    Vocabulary,
    extract_tokens,
    preprocess_text,
)


def test_extract_tokens_basic():
    toks = extract_tokens("The quick-brown Fox_1 jumps!")
    assert "quick" in toks and "brown" in toks and "fox_1" in toks
    assert "the" not in toks  # stopword


def test_extract_tokens_keep_stopwords():
    toks = extract_tokens("the fox", remove_stopwords=False)
    assert toks == ["the", "fox"]


def test_preprocess_text():
    assert preprocess_text("  a\n\tb   c ") == "a b c"


def test_vocabulary_roundtrip():
    v = Vocabulary()
    ids = v.encode(["a", "b", "a"], add=True)
    assert ids == [0, 1, 0]
    assert v.encode(["a", "zz", "b"]) == [0, 1]


def test_native_tokenize_matches_regex():
    text = "Hello, World_2! foo-bar baz"
    import re

    want = re.findall(r"[A-Za-z0-9_]+", text.lower())
    if native.native_available():
        assert native.native_tokenize(text) == want
    else:
        pytest.skip("libtextops.so not built")


def test_levenshtein():
    assert native.levenshtein("kitten", "sitting") == 3
    assert native.levenshtein("", "abc") == 3
    assert native.levenshtein("same", "same") == 0


def test_partial_ratio_contract():
    assert native.partial_ratio("hello", "say hello world") == 100.0
    assert native.partial_ratio("abc", "abc") == 100.0
    assert 0.0 <= native.partial_ratio("xyz", "abcdef") < 50.0
    assert native.partial_ratio("", "abc") == 0.0


def test_minhash_shingles_native_matches_python():
    text = "abcdefg"
    got = native.minhash_shingle_hashes(text, 3)
    # recompute in pure python
    data = text.encode()
    want = []
    for i in range(len(data) - 2):
        h = 0xCBF29CE484222325
        for byte in data[i : i + 3]:
            h = ((h ^ byte) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
        want.append(h)
    assert got == want


def test_sentence_chunker_overlap():
    text = "One sentence here. Two sentences now. Third one arrives. Fourth closes."
    chunks = ck.SentenceChunker(max_chars=45, overlap_sentences=1).chunk(text, doc_id=7)
    assert len(chunks) >= 2
    assert all(c.doc_id == 7 for c in chunks)
    # overlap: last sentence of chunk i appears in chunk i+1
    assert chunks[0].content.split(". ")[-1].rstrip(".") in chunks[1].content


def test_paragraph_chunker():
    text = "Short.\n\n" + ("Long paragraph sentence. " * 20) + "\n\nAnother tail."
    chunks = ck.ParagraphChunker(min_chars=30, max_chars=120).chunk(text)
    assert all(len(c.content) <= 130 for c in chunks)
    assert len(chunks) >= 3


def test_sliding_window_chunker():
    text = "x" * 1000
    chunks = ck.SlidingWindowChunker(window_chars=300, overlap_chars=50).chunk(text)
    assert chunks[0].start_char == 0
    assert chunks[1].start_char == 250
    assert all(len(c.content) <= 300 for c in chunks)


def test_semantic_chunker_splits_on_topic_shift():
    enc = HashingEncoder(dim=64)
    text = (
        "Python code uses functions. Python modules import packages. "
        "Gardens bloom with tulips in spring. Flowers need water and sun."
    )
    chunks = ck.SemanticChunker(encoder=enc, similarity_threshold=0.2).chunk(text)
    assert len(chunks) >= 2


def test_get_chunker_factory():
    assert isinstance(ck.get_chunker("sentence"), ck.SentenceChunker)
    assert isinstance(ck.get_chunker("sliding_window"), ck.SlidingWindowChunker)
    with pytest.raises(ValueError):
        ck.get_chunker("bogus")


def test_stable_hash_deterministic():
    assert stable_hash("token") == stable_hash("token")
    assert stable_hash("a") != stable_hash("b")


def test_hashing_encoder_properties(demo_docs):
    enc = HashingEncoder(dim=128)
    emb = enc.encode(demo_docs)
    assert emb.shape == (len(demo_docs), 128)
    # deterministic
    emb2 = enc.encode(demo_docs)
    np.testing.assert_allclose(emb, emb2)
    # lexically-related docs are closer than unrelated ones
    def cos(a, b):
        return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))

    ml1 = enc.encode(["machine learning models learn from data"])[0]
    ml2 = enc.encode(["training data for machine learning"])[0]
    other = enc.encode(["boiling pasta with salt"])[0]
    assert cos(ml1, ml2) > cos(ml1, other)


def test_native_token_hashes_parity():
    """C tokenize+hash pass == Python stable_hash over extract_tokens."""
    from hybridsearch_tpu.models.encoder import HashingEncoder, stable_hash
    from hybridsearch_tpu.text import native as nat

    if not nat.native_available():
        pytest.skip("libtextops.so not built")
    enc = HashingEncoder(dim=32)
    for text in (
        "The QUICK brown fox and the lazy dog",
        "numbers 123 and under_scores mix-in",
        "",
        "the and of to",  # all stopwords
    ):
        uni, bi = nat.token_hashes(text, enc._stop_hashes())
        from hybridsearch_tpu.text.extractor import extract_tokens

        toks = extract_tokens(text)
        assert [int(x) for x in uni] == [stable_hash(t) for t in toks]
        assert [int(x) for x in bi] == [
            stable_hash(a + "_" + b) for a, b in zip(toks, toks[1:])
        ]
