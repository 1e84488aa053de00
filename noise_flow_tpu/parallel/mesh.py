"""Device mesh + sharding helpers.

The reference had no distributed runtime at all (hogwild Python threads on one
device, ref:train_noise_flow.py:30-77; SURVEY.md §2.6). Here data parallelism
is first-class: a 1-D ``data`` mesh (extensible to ('data','model')), batches
sharded along it, parameters replicated, and XLA inserting the gradient
all-reduce over ICI when the jitted train step consumes sharded inputs.
Multi-host: call jax.distributed.initialize() before make_mesh and feed each
host its own batch shard (see data.pipeline.host_shard).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: Optional[int] = None, axis: str = "data") -> Mesh:
    devices = jax.devices()
    if n_data is None:
        n_data = len(devices)
    return Mesh(np.asarray(devices[:n_data]).reshape(n_data), (axis,))


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    return NamedSharding(mesh, P(axis))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch, axis: str = "data"):
    """Place a host-local batch pytree with leading dim sharded over the mesh."""
    sh = batch_sharding(mesh, axis)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)


def shard_batch_stacked(mesh: Mesh, batch, axis: str = "data"):
    """Place a [K, B, ...] stack of K batches: dim 0 is the scan (step) axis,
    dim 1 (the per-step batch) is sharded over the mesh."""
    sh = NamedSharding(mesh, P(None, axis))
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)


def replicate(mesh: Mesh, tree):
    sh = replicated_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)
