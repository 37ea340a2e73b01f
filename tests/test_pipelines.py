"""Eight pipelines + factory, rerankers, highlighter, RAG/HyDE/agentic."""

import numpy as np
import pytest

from hybridsearch_tpu.models.bert import BertConfig
from hybridsearch_tpu.models.encoder import HashingEncoder
from hybridsearch_tpu.models.minilm import MiniLMCrossEncoder
from hybridsearch_tpu.pipelines import (
    PipelineResult,
    create_pipeline,
)
from hybridsearch_tpu.retrieval.highlighter import (
    HTMLHighlighter,
    MarkdownHighlighter,
    TerminalHighlighter,
    get_highlighter,
)
from hybridsearch_tpu.retrieval.rag import (
    AgenticSearcher,
    HyDESearcher,
    RAGAnswerer,
    build_context,
    build_prompt,
)
from hybridsearch_tpu.retrieval.reranker import (
    CrossEncoderReranker,
    LateInteractionReranker,
    create_reranker,
)


@pytest.fixture(scope="module")
def encoder():
    return HashingEncoder(dim=128)


@pytest.fixture(scope="module")
def small_ce():
    cfg = BertConfig(vocab_size=2000, hidden_dim=64, num_layers=2, num_heads=4,
                     mlp_dim=128)
    return MiniLMCrossEncoder(cfg=cfg, dim=64, max_seq_len=64)


def fake_llm(prompt):
    return ("The answer is machine learning.", 42)


# -- factory ------------------------------------------------------------------


def test_factory_unknown_type():
    with pytest.raises(ValueError):
        create_pipeline("bogus")


@pytest.mark.parametrize("name", ["basic", "bm25", "hybrid_bm25", "chunked",
                                  "diversity"])
def test_factory_creates_and_searches(name, encoder, demo_docs):
    p = create_pipeline(name, encoder=encoder)
    p.index(demo_docs)
    out = p.search("machine learning", top_k=3)
    assert isinstance(out, PipelineResult)
    assert out.metadata["pipeline"] == name
    assert len(out.results) <= 3 and len(out.results) > 0
    score, content, doc_id = out.results[0]
    assert isinstance(content, str) and isinstance(doc_id, int)


# -- specific pipeline semantics -------------------------------------------------


def test_bm25_pipeline_matches_bm25_search(encoder, demo_docs):
    p = create_pipeline("bm25", encoder=encoder)
    p.index(demo_docs)
    out = p.search("machine learning data", top_k=3)
    want = p.indexer.bm25.search("machine learning data", top_k=3)
    assert [r[2] for r in out.results] == [w[0] for w in want]


def test_chunked_pipeline_parent_mapping(encoder):
    docs = [
        "Python is great. Python has packages. Python powers data science. "
        "Many people write Python daily.",
        "Cooking pasta is easy. Boil water with salt. Add the pasta for ten "
        "minutes. Drain and serve with sauce.",
    ]
    p = create_pipeline("chunked", encoder=encoder,
                        chunker_kwargs={"max_chars": 60})
    stats = p.index(docs)
    assert stats["chunks"] > stats["parents"]
    out = p.search("python data science", top_k=1)
    assert out.results[0][2] == 0  # parent doc id, not chunk id
    assert out.results[0][1] == docs[0]  # parent content returned


def test_chunked_pipeline_return_chunks(encoder):
    docs = ["One sentence. Another sentence entirely about gardens."]
    p = create_pipeline("chunked", encoder=encoder, return_parent=False,
                        chunker_kwargs={"max_chars": 25})
    p.index(docs)
    out = p.search("gardens", top_k=1)
    assert "garden" in out.results[0][1].lower()


def test_hybrid_bm25_uses_max_normalization(encoder, demo_docs):
    p = create_pipeline("hybrid_bm25", encoder=encoder, semantic_weight=0.6,
                        bm25_weight=0.4)
    p.index(demo_docs)
    out = p.search("machine learning", top_k=5)
    # max-normalized fusion keeps scores in [0, 1] for non-negative arms
    assert all(r[0] <= 1.0 + 1e-5 for r in out.results)
    assert out.results[0][2] in {1, 3, 6, 8, 10}


def test_reranked_pipeline(encoder, small_ce, demo_docs):
    rr = CrossEncoderReranker(model=small_ce)
    p = create_pipeline("reranked", encoder=encoder, reranker=rr)
    p.index(demo_docs)
    out = p.search("machine learning", top_k=3)
    assert len(out.results) == 3
    assert out.metadata["candidates"] == 9


def test_multi_stage_funnel(encoder, small_ce, demo_docs):
    rr = CrossEncoderReranker(model=small_ce)
    p = create_pipeline("multi_stage", encoder=encoder, reranker=rr,
                        stage1_k=8, stage2_k=4, final_k=2)
    p.index(demo_docs)
    out = p.search("machine learning")
    assert len(out.results) == 2
    assert out.metadata["stage1_k"] == 8
    assert out.metadata["stage2_k"] == 4
    # stage-2 candidates are a subset of stage-1
    assert set(out.metadata["stage2_ids"]).issuperset({r[2] for r in out.results})


def test_diversity_pipeline_diversifies(encoder):
    # 4 near-duplicates of topic A + 2 docs of topic B
    docs = [
        "machine learning models learn from data",
        "machine learning models learn from training data",
        "machine learning systems learn patterns from data",
        "learning machines model data patterns",
        "gardens bloom with colorful spring flowers",
        "the stock market rallied this quarter",
    ]
    plain = create_pipeline("basic", encoder=encoder)
    plain.index(docs)
    div = create_pipeline("diversity", encoder=encoder, lambda_param=0.3,
                          candidate_multiplier=2)
    div.index(docs)
    p_ids = [r[2] for r in plain.search("machine learning data", top_k=3).results]
    d_ids = [r[2] for r in div.search("machine learning data", top_k=3).results]
    assert set(p_ids) <= {0, 1, 2, 3}  # plain returns only the dupes
    assert d_ids[0] == p_ids[0]  # MMR first pick = max relevance
    assert d_ids != p_ids  # diversification changed the tail


def test_rag_pipeline_with_fake_llm(encoder, demo_docs):
    p = create_pipeline("rag", encoder=encoder, llm_fn=fake_llm)
    p.index(demo_docs)
    out = p.search("what is machine learning", top_k=3)
    assert out.answer == "The answer is machine learning."
    assert out.metadata["tokens_used"] == 42
    assert len(out.results) == 3
    assert all(len(r[1]) <= 200 for r in out.results)  # 200-char previews


# -- rag internals ------------------------------------------------------------------


def test_build_context_limits():
    results = [(1.0, "x" * 3000, 0), (0.9, "y" * 3000, 1), (0.8, "z", 2)]
    ctx = build_context(results)
    assert len(ctx) <= 4100
    assert "[Document 1]" in ctx and "[Document 2]" in ctx


def test_build_prompt_contains_question():
    p = build_prompt("why?", "because")
    assert "why?" in p and "because" in p


def test_hyde_searcher(encoder, demo_docs):
    from hybridsearch_tpu.retrieval.searcher import Searcher

    s = Searcher(encoder=encoder)
    s.indexer.index_documents(demo_docs)
    hyde = HyDESearcher(s, llm_fn=lambda p: ("neural networks learn patterns", 1))
    res = hyde.search("what do brains inspire?", top_k=3)
    assert len(res) == 3
    assert {r[2] for r in res} & {1, 3, 8, 10}


def test_agentic_search_follows_directives(encoder, demo_docs):
    from hybridsearch_tpu.retrieval.searcher import Searcher

    s = Searcher(encoder=encoder)
    s.indexer.index_documents(demo_docs)
    calls = {"n": 0}

    def llm(prompt):
        calls["n"] += 1
        if calls["n"] == 1:
            return ("SEARCH: neural networks", 1)
        return ("DONE", 1)

    ag = AgenticSearcher(s, llm_fn=llm)
    res = ag.search("ai stuff", top_k=4)
    assert calls["n"] == 2
    assert len(res) <= 4
    ids = [r[2] for r in res]
    assert len(ids) == len(set(ids))  # deduped


def test_agentic_search_caps_iterations(encoder, demo_docs):
    from hybridsearch_tpu.retrieval.searcher import Searcher

    s = Searcher(encoder=encoder)
    s.indexer.index_documents(demo_docs)
    calls = {"n": 0}

    def llm(prompt):
        calls["n"] += 1
        return (f"SEARCH: query {calls['n']}", 1)

    AgenticSearcher(s, llm_fn=llm).search("x", top_k=2)
    assert calls["n"] == 3  # MAX_AGENT_ITERS


# -- rerankers ------------------------------------------------------------------------


def test_rerank_with_fusion_weights(small_ce):
    rr = CrossEncoderReranker(model=small_ce)
    results = [(0.9, "alpha beta", 0), (0.5, "gamma delta", 1), (0.1, "epsilon", 2)]
    fused = rr.rerank_with_fusion("alpha", results, top_k=3)
    assert len(fused) == 3
    assert all(0.0 <= s <= 1.0 + 1e-6 for s, _c, _i in fused)


def test_late_interaction_reranker(encoder):
    cfg = BertConfig(vocab_size=2000, hidden_dim=64, num_layers=2, num_heads=4,
                     mlp_dim=128)
    from hybridsearch_tpu.models.minilm import MiniLMEncoder

    bi = MiniLMEncoder(dim=64, cfg=cfg, max_seq_len=64)
    rr = LateInteractionReranker(encoder=bi)
    results = [(0.5, "machine learning data", 0), (0.4, "cooking pasta", 1)]
    out = rr.rerank("machine learning", results)
    assert len(out) == 2
    assert {r[2] for r in out} == {0, 1}


def test_create_reranker_factory():
    assert isinstance(create_reranker("colbert"), LateInteractionReranker)
    with pytest.raises(ValueError):
        create_reranker("bogus")


# -- highlighter ----------------------------------------------------------------------


def test_highlight_text_word_boundaries():
    h = MarkdownHighlighter()
    out = h.highlight_text("The learner is learning fast", "learning")
    assert "**learning**" in out
    assert "**learner**" not in out  # word boundary respected


def test_highlight_case_insensitive():
    h = HTMLHighlighter()
    assert h.highlight_text("Machine Learning", "machine") == \
        "<mark>Machine</mark> Learning"


def test_snippets_center_and_ellipses():
    h = MarkdownHighlighter()
    text = ("padding words " * 20) + "the key term appears here" + (" trailing" * 20)
    snips = h.extract_snippets(text, "key term", window=40)
    assert len(snips) >= 1
    assert "**key**" in snips[0] and snips[0].startswith("...")


def test_terminal_highlighter_ansi():
    h = TerminalHighlighter()
    out = h.highlight_text("find me", "find")
    assert "\033[1;33m" in out and "\033[0m" in out


def test_get_highlighter_factory():
    assert isinstance(get_highlighter("html"), HTMLHighlighter)
    with pytest.raises(ValueError):
        get_highlighter("nope")


def test_multi_stage_batched_matches_single(encoder, small_ce, demo_docs):
    """Batched funnel (one CE forward for all pairs) == per-query funnel."""
    rr = CrossEncoderReranker(model=small_ce)
    p = create_pipeline("multi_stage", encoder=encoder, reranker=rr,
                        stage1_k=8, stage2_k=4, final_k=2)
    p.index(demo_docs)
    queries = ["machine learning", "cooking pasta"]
    batched = p.search_batch(queries)
    singles = [p.search(q) for q in queries]
    for b, s in zip(batched, singles):
        assert [r[2] for r in b.results] == [r[2] for r in s.results]
        assert b.metadata["batched"] is True


def test_diversity_search_batch_matches_single(encoder):
    docs = [
        "machine learning models learn from data",
        "machine learning models learn from training data",
        "machine learning systems learn patterns from data",
        "learning machines model data patterns",
        "gardens bloom with colorful spring flowers",
        "the stock market rallied this quarter",
        "neural networks power modern vision systems",
        "flowers and gardens in springtime bloom",
    ]
    div = create_pipeline("diversity", encoder=encoder, lambda_param=0.3,
                          candidate_multiplier=2)
    div.index(docs)
    queries = ["machine learning data", "spring flowers garden"]
    batch = div.search_batch(queries, top_k=3)
    assert len(batch) == 2
    for q, res in zip(queries, batch):
        single = div.search(q, top_k=3)
        assert [r[2] for r in res.results] == [r[2] for r in single.results]
        assert res.metadata["batched"] is True


def test_diversity_search_batch_short_rows(encoder):
    """Queries with <= top_k candidates skip MMR but still return."""
    div = create_pipeline("diversity", encoder=encoder)
    div.index(["only one document here", "and a second one"])
    batch = div.search_batch(["document"], top_k=5)
    assert len(batch) == 1 and len(batch[0].results) <= 2
