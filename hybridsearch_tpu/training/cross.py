"""Pointwise fine-tuning of the cross-encoder reranker.

The reference serves a downloaded ms-marco-MiniLM-L-6-v2 cross-encoder
(reference reranker.py:19) trained with a pointwise BCE objective on
MS MARCO (query, passage, relevant?) triples. This is the TPU-native
trainer for the same recipe: relevant and non-relevant (query, doc)
pairs scored by models/bert.py CrossEncoder, sigmoid BCE on the logit,
batch sharded over the "data" mesh axis and the trunk's TP annotations
handled by jit exactly as in training/contrastive.py.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from hybridsearch_tpu.models.bert import BertConfig, CrossEncoder
from hybridsearch_tpu.parallel.mesh import DATA_AXIS
from hybridsearch_tpu.training.contrastive import param_shardings


def pointwise_bce_loss(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """Sigmoid binary cross-entropy on relevance logits ([B] each)."""
    return jnp.mean(optax.sigmoid_binary_cross_entropy(
        logits, labels.astype(jnp.float32)))


def make_cross_train_step(
    model: CrossEncoder,
    optimizer: optax.GradientTransformation,
) -> Callable:
    """train_step(params, opt_state, batch) -> (params, opt_state, loss);
    batch = (ids, mask, type_ids, labels)."""

    def loss_fn(params, batch):
        ids, mask, types, labels = batch
        logits = model.apply(params, ids, mask, types)
        return pointwise_bce_loss(logits, labels)

    def train_step(params, opt_state, batch):
        loss, grads = jax.value_and_grad(loss_fn)(params, batch)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return train_step


class CrossEncoderTrainer:
    """Mesh-sharded trainer for the (query, doc) relevance head."""

    def __init__(
        self,
        cfg: Optional[BertConfig] = None,
        mesh: Optional[Mesh] = None,
        learning_rate: float = 2e-5,
        seed: int = 0,
    ) -> None:
        self.cfg = cfg or BertConfig()
        self.mesh = mesh
        self.model = CrossEncoder(self.cfg)
        self.optimizer = optax.adamw(learning_rate)
        ids = jnp.zeros((1, 8), jnp.int32)
        one = jnp.ones((1, 8), jnp.int32)
        params = self.model.init(jax.random.PRNGKey(seed), ids, one,
                                 jnp.zeros((1, 8), jnp.int32))
        step = make_cross_train_step(self.model, self.optimizer)

        if mesh is not None:
            p_shard = param_shardings(mesh, params)
            batch_spec = NamedSharding(mesh, P(DATA_AXIS, None))
            lbl_spec = NamedSharding(mesh, P(DATA_AXIS))
            self.params = jax.device_put(params, p_shard)
            self.opt_state = self.optimizer.init(self.params)
            self._step = jax.jit(
                step,
                in_shardings=(p_shard, None,
                              (batch_spec, batch_spec, batch_spec, lbl_spec)),
                out_shardings=(p_shard, None, None),
                donate_argnums=(0, 1),
            )
        else:
            self.params = params
            self.opt_state = self.optimizer.init(params)
            self._step = jax.jit(step, donate_argnums=(0, 1))

    def train_step(self, batch: Tuple[np.ndarray, np.ndarray, np.ndarray,
                                      np.ndarray]) -> float:
        arrs = tuple(jnp.asarray(b) for b in batch)
        self.params, self.opt_state, loss = self._step(
            self.params, self.opt_state, arrs)
        return float(loss)
