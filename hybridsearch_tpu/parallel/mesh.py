"""Device mesh construction and shardings.

The reference has no distributed execution at all (SURVEY §2-P); scaling in
this framework is a first-class TPU design: the document axis of both
indexes is sharded across a `jax.sharding.Mesh` and queries are replicated,
so the dense query kernel runs per-shard and only k candidates per shard
cross the ICI (parallel/collectives.py).

Axes:
  data  — document-axis sharding for serving; batch axis for training.
  model — tensor-parallel axis for encoder weights (training/bulk encode).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def build_mesh(
    n_data: int = -1,
    n_model: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a (data, model) mesh. n_data == -1 uses all remaining devices."""
    devs = list(devices) if devices is not None else jax.devices()
    if n_data == -1:
        n_data = len(devs) // n_model
    n = n_data * n_model
    if n > len(devs):
        raise ValueError(f"mesh {n_data}x{n_model} needs {n} devices, have {len(devs)}")
    grid = np.array(devs[:n]).reshape(n_data, n_model)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def doc_sharding(mesh: Mesh) -> NamedSharding:
    """[N, D] document matrix sharded along docs, replicated along dim."""
    return NamedSharding(mesh, P(DATA_AXIS, None))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_count(mesh: Mesh) -> int:
    return mesh.shape[DATA_AXIS]


def pad_to_shards(n: int, n_shards: int, multiple: int = 8) -> int:
    """Round n up so it divides evenly into n_shards shards, each a multiple
    of `multiple` rows (sublane-aligned)."""
    per = -(-n // n_shards)
    per = ((per + multiple - 1) // multiple) * multiple
    return per * n_shards
