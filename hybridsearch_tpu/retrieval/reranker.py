"""Cross-encoder reranking stage.

Parity with the reference reranker (reference reranker.py:50-140):
  - rerank(query, results, top_k): score (query, doc) pairs with the
    cross-encoder, sort by CE score;
  - rerank_with_fusion: min-max normalize both the original and CE scores
    and blend 0.3 * original + 0.7 * CE (reference reranker.py:91-140);
  - create_reranker factory (reference reranker.py:171-194).

The CE forward runs batched on device (models/minilm.py). Candidate counts
are padded to buckets inside the model wrapper, so variable funnel widths
don't recompile.

The reference's "colbert" option is a placeholder that returns its input
unchanged (reference reranker.py:158-168); here LateInteractionReranker
implements real MaxSim late interaction over the bi-encoder's token states.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np

SearchResult = Tuple[float, str, int]


def _minmax(x: np.ndarray) -> np.ndarray:
    if x.size == 0:
        return x
    mn, mx = float(x.min()), float(x.max())
    if mx - mn < 1e-12:
        return np.ones_like(x)
    return (x - mn) / (mx - mn)


class CrossEncoderReranker:
    def __init__(self, model=None, model_name: str = "ms-marco-MiniLM-L-6-v2") -> None:
        self._model = model
        self.model_name = model_name

    @property
    def model(self):
        # lazy model loading (reference reranker.py:41-48 convention)
        if self._model is None:
            from hybridsearch_tpu.models.minilm import MiniLMCrossEncoder

            self._model = MiniLMCrossEncoder(name=self.model_name)
        return self._model

    def rerank(
        self,
        query: str,
        results: Sequence[SearchResult],
        top_k: Optional[int] = None,
    ) -> List[SearchResult]:
        """Sort candidates by cross-encoder score (reference reranker.py:50-89)."""
        if not results:
            return []
        pairs = [(query, content) for _score, content, _id in results]
        ce = self.model.predict(pairs)
        order = np.argsort(-ce, kind="stable")
        out = [
            (float(ce[i]), results[i][1], results[i][2]) for i in order
        ]
        return out[: top_k if top_k is not None else len(out)]

    def rerank_with_fusion(
        self,
        query: str,
        results: Sequence[SearchResult],
        top_k: Optional[int] = None,
        original_weight: float = 0.3,
        ce_weight: float = 0.7,
    ) -> List[SearchResult]:
        """0.3 * minmax(orig) + 0.7 * minmax(CE) (reference reranker.py:91-140)."""
        if not results:
            return []
        pairs = [(query, content) for _s, content, _i in results]
        ce = _minmax(self.model.predict(pairs))
        orig = _minmax(np.asarray([s for s, _c, _i in results], dtype=np.float32))
        fused = original_weight * orig + ce_weight * ce
        order = np.argsort(-fused, kind="stable")
        out = [(float(fused[i]), results[i][1], results[i][2]) for i in order]
        return out[: top_k if top_k is not None else len(out)]


class LateInteractionReranker:
    """ColBERT-style MaxSim reranker: score = sum over query tokens of the
    max cosine against doc tokens. Implemented as one batched device einsum
    over the bi-encoder trunk's token states (a real implementation of what
    the reference stubs out at reranker.py:158-168)."""

    def __init__(self, encoder=None) -> None:
        self._encoder = encoder

    @property
    def encoder(self):
        if self._encoder is None:
            from hybridsearch_tpu.models.minilm import MiniLMEncoder

            self._encoder = MiniLMEncoder()
        return self._encoder

    def _token_states(self, texts: Sequence[str]) -> Tuple[np.ndarray, np.ndarray]:
        import jax
        import jax.numpy as jnp

        enc = self.encoder
        ids, mask = enc.tokenizer.batch_encode(list(texts), enc.max_seq_len)
        # Run the trunk directly for per-token states.
        from hybridsearch_tpu.models.bert import BertEncoder

        trunk = BertEncoder(enc.cfg)
        bert_params = {"params": enc.params["params"]["bert"]}
        states = trunk.apply(bert_params, jnp.asarray(ids), jnp.asarray(mask))
        states = np.asarray(jax.device_get(states), dtype=np.float32)
        norms = np.linalg.norm(states, axis=-1, keepdims=True)
        states = states / np.maximum(norms, 1e-12)
        return states, mask

    def rerank(
        self,
        query: str,
        results: Sequence[SearchResult],
        top_k: Optional[int] = None,
    ) -> List[SearchResult]:
        if not results:
            return []
        q_states, q_mask = self._token_states([query])
        d_states, d_mask = self._token_states([c for _s, c, _i in results])
        # MaxSim: [C, Lq, Ld] -> max over Ld -> sum over Lq
        sim = np.einsum("qd,cld->cql", q_states[0], d_states)
        sim = np.where(d_mask[:, None, :] > 0, sim, -np.inf)
        maxsim = sim.max(axis=2)  # [C, Lq]
        maxsim = np.where(q_mask[0][None, :] > 0, maxsim, 0.0)
        scores = maxsim.sum(axis=1)
        order = np.argsort(-scores, kind="stable")
        out = [(float(scores[i]), results[i][1], results[i][2]) for i in order]
        return out[: top_k if top_k is not None else len(out)]


def create_reranker(kind: str = "cross_encoder", **kwargs):
    """Factory (reference reranker.py:171-194)."""
    table = {
        "cross_encoder": CrossEncoderReranker,
        "colbert": LateInteractionReranker,
        "late_interaction": LateInteractionReranker,
    }
    if kind not in table:
        raise ValueError(f"unknown reranker kind: {kind!r}")
    return table[kind](**kwargs)
