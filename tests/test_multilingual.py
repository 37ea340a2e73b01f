"""Multilingual path: unicode tokenizer, byte-trigram embedder, eval."""

from hybridsearch_tpu.evaluation import multilingual as ml
from hybridsearch_tpu.models.encoder import ByteTrigramEncoder
from hybridsearch_tpu.text.extractor import extract_tokens


def test_tokenizer_accented_latin():
    toks = extract_tokens("aprendizaje automático de modelos")
    assert "automático" in toks  # reference regex splits this into 2


def test_tokenizer_cjk_bigrams():
    toks = extract_tokens("机器学习模型")
    assert "机器" in toks and "学习" in toks and len(toks) >= 4


def test_tokenizer_cyrillic():
    assert "обучение" in extract_tokens("машинное обучение моделей")


def test_tokenizer_ascii_unchanged():
    # parity with the reference on ASCII input (extractor.py:28)
    assert extract_tokens("The Quick brown-fox runs!") == [
        "quick", "brown", "fox", "runs"]


def test_byte_trigram_encoder_all_scripts():
    enc = ByteTrigramEncoder(dim=64)
    texts = ["hello world", "机器学习", "обучение", "تدريب", "नेटवर्क"]
    vecs = enc.encode(texts)
    assert vecs.shape == (5, 64)
    import numpy as np

    norms = np.linalg.norm(vecs, axis=1)
    assert (norms > 0).all()
    # same text twice -> identical; different scripts -> not identical
    again = enc.encode(["机器学习"])[0]
    np.testing.assert_allclose(again, vecs[1], rtol=1e-5)
    assert abs(float(np.dot(vecs[0] / norms[0], vecs[1] / norms[1]))) < 0.9


def test_multilingual_retrieval_quality():
    r = ml.eval_retrieval()
    assert r["p_at_1"] >= 0.9, r
    b = ml.eval_bm25()
    assert b["p_at_1"] >= 0.8, b  # CJK bigrams give BM25 postings


def test_language_detection_sane():
    d = ml.eval_detection()
    assert d["accuracy"] >= 0.7, d
