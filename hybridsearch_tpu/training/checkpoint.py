"""Training / encoder checkpointing via orbax.

SURVEY §5.4 requires persistable model state alongside the index shards:
  - save/restore of bi-encoder params + optimizer state (resume training);
  - exporting fine-tuned params into a MiniLMEncoder so the serving path
    picks up the improved embeddings.
"""

from __future__ import annotations

import os
from typing import Any, Optional, Tuple


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer()


def _unbox(tree: Any) -> Any:
    """Strip flax Partitioned metadata boxes (nn.with_partitioning) so the
    checkpoint is a plain array tree; apply() accepts unboxed params."""
    from flax.core import meta

    return meta.unbox(tree)


def save_train_state(directory: str, params: Any, opt_state: Any,
                     step: int = 0) -> None:
    """Persist params + optimizer state + step."""
    import jax

    ckpt = _checkpointer()
    path = os.path.abspath(directory)
    params_host = jax.device_get(_unbox(params))
    opt_host = jax.device_get(_unbox(opt_state))
    ckpt.save(os.path.join(path, "train_state"),
              {"params": params_host, "opt_state": opt_host, "step": step},
              force=True)


def restore_train_state(directory: str) -> Tuple[Any, Any, int]:
    ckpt = _checkpointer()
    restored = ckpt.restore(os.path.join(os.path.abspath(directory),
                                         "train_state"))
    return restored["params"], restored["opt_state"], int(restored["step"])


def save_encoder_params(directory: str, params: Any) -> None:
    """Persist just the bi-encoder params (serving checkpoint)."""
    import jax

    ckpt = _checkpointer()
    ckpt.save(os.path.join(os.path.abspath(directory), "encoder_params"),
              jax.device_get(_unbox(params)), force=True)


def load_encoder(directory: str, cfg=None, name: str = "finetuned-minilm"):
    """Build a MiniLMEncoder serving the fine-tuned params."""
    from hybridsearch_tpu.models.bert import BertConfig
    from hybridsearch_tpu.models.minilm import MiniLMEncoder

    ckpt = _checkpointer()
    params = ckpt.restore(os.path.join(os.path.abspath(directory),
                                       "encoder_params"))
    cfg = cfg or BertConfig()
    enc = MiniLMEncoder(dim=cfg.hidden_dim, cfg=cfg, name=name)
    enc.params = params
    enc.pretrained = True
    return enc
