"""Contrastive fine-tuning of the bi-encoder (in-batch negatives).

The reference lists encoder fine-tuning as an unimplemented roadmap item
("20-40% relevance improvement", reference README.md:385); here it is a
first-class mesh-sharded training step:

  - loss: symmetric InfoNCE over in-batch negatives — the standard
    sentence-transformers MultipleNegativesRankingLoss recipe;
  - parallelism: batch sharded over the "data" mesh axis (DP); encoder
    FFN/attention projections sharded over "model" (TP) via the
    nn.with_partitioning annotations in models/bert.py; XLA inserts the
    psum/all_gather collectives;
  - the in-batch similarity matrix requires globally-replicated embeddings;
    jit handles this from the sharding annotations.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from hybridsearch_tpu.models.bert import BertConfig, BiEncoder
from hybridsearch_tpu.parallel.mesh import DATA_AXIS


def info_nce_loss(q_emb: jax.Array, d_emb: jax.Array,
                  temperature: float = 0.05) -> jax.Array:
    """Symmetric InfoNCE with in-batch negatives. Embeddings are already
    L2-normalized by the BiEncoder head."""
    logits = jnp.dot(q_emb, d_emb.T, preferred_element_type=jnp.float32)
    logits = logits / temperature
    labels = jnp.arange(logits.shape[0])
    loss_qd = optax.softmax_cross_entropy_with_integer_labels(logits, labels)
    loss_dq = optax.softmax_cross_entropy_with_integer_labels(logits.T, labels)
    return jnp.mean(loss_qd + loss_dq) * 0.5


def make_train_step(
    model: BiEncoder,
    optimizer: optax.GradientTransformation,
    temperature: float = 0.05,
) -> Callable:
    """Returns train_step(params, opt_state, batch) -> (params, opt_state,
    loss). batch = (q_ids, q_mask, d_ids, d_mask)."""

    def loss_fn(params, batch):
        q_ids, q_mask, d_ids, d_mask = batch
        q_emb = model.apply(params, q_ids, q_mask)
        d_emb = model.apply(params, d_ids, d_mask)
        return info_nce_loss(q_emb, d_emb, temperature)

    def train_step(params, opt_state, batch):
        loss, grads = jax.value_and_grad(loss_fn)(params, batch)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return train_step


def param_shardings(mesh: Mesh, params) -> Any:
    """Derive a NamedSharding tree from the nn.with_partitioning annotations
    carried in the param tree (models/bert.py)."""
    specs = nn.get_partition_spec(params)
    return jax.tree.map(
        lambda spec: NamedSharding(mesh, spec),
        specs,
        is_leaf=lambda x: isinstance(x, P),
    )


class ContrastiveTrainer:
    """Mesh-sharded trainer for the bi-encoder."""

    def __init__(
        self,
        cfg: Optional[BertConfig] = None,
        mesh: Optional[Mesh] = None,
        learning_rate: float = 2e-5,
        temperature: float = 0.05,
        seed: int = 0,
    ) -> None:
        self.cfg = cfg or BertConfig()
        self.mesh = mesh
        self.model = BiEncoder(self.cfg)
        self.optimizer = optax.adamw(learning_rate)
        ids = jnp.zeros((1, 8), jnp.int32)
        mask = jnp.ones((1, 8), jnp.int32)
        params = self.model.init(jax.random.PRNGKey(seed), ids, mask)
        opt_state = self.optimizer.init(params)
        step = make_train_step(self.model, self.optimizer, temperature)

        if mesh is not None:
            p_shard = param_shardings(mesh, params)
            batch_spec = NamedSharding(mesh, P(DATA_AXIS, None))
            self.params = jax.device_put(params, p_shard)
            # opt_state leaves inherit the param shardings through init, so
            # jit can take their placement as-is (in_shardings None).
            self.opt_state = self.optimizer.init(self.params)
            self._step = jax.jit(
                step,
                in_shardings=(p_shard, None, (batch_spec,) * 4),
                out_shardings=(p_shard, None, None),
                donate_argnums=(0, 1),
            )
        else:
            self.params = params
            self.opt_state = opt_state
            self._step = jax.jit(step, donate_argnums=(0, 1))

    def train_step(self, batch: Tuple[np.ndarray, np.ndarray, np.ndarray,
                                      np.ndarray]) -> float:
        arrs = tuple(jnp.asarray(b) for b in batch)
        self.params, self.opt_state, loss = self._step(
            self.params, self.opt_state, arrs
        )
        return float(loss)
