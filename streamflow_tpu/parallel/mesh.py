"""Device mesh + sharding layout.

The reference's entire distributed story is single-process nn.DataParallel
over <=8 GPUs (train_mf.py:146): batch scattered, module replicated, outputs
gathered every step. The TPU-native equivalent is SPMD over a jax mesh:

- axis "data": batch sharding; XLA inserts the gradient all-reduce over ICI.
- axis "seq" (optional): shards the H*W token axis of the quadratic-memory
  stages (correlation volume rows, GMA attention queries) for 1080p+ inputs —
  the parallel analogue of the reference's tiled inference
  (evaluate_mf.py:887-916).

Params are replicated; batches are sharded on their leading axis. Collectives
are never hand-written — shardings constrain the program and XLA lowers to
psum/all-gather over ICI (SURVEY §5.8).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_data: Optional[int] = None,
    n_seq: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_seq
    assert n_data * n_seq <= len(devices), (
        f"need {n_data}x{n_seq} devices, have {len(devices)}"
    )
    grid = np.asarray(devices[: n_data * n_seq]).reshape(n_data, n_seq)
    return Mesh(grid, axis_names=("data", "seq"))


def data_sharding(mesh: Mesh, ndim: int, axis: int = 0) -> NamedSharding:
    spec = [None] * ndim
    spec[axis] = "data"
    return NamedSharding(mesh, P(*spec))


def shard_batch(mesh: Mesh, batch):
    """Shard every array in a pytree along its leading axis over 'data'."""
    def put(x):
        return jax.device_put(x, data_sharding(mesh, np.ndim(x)))

    return jax.tree_util.tree_map(put, batch)


def replicate(mesh: Mesh, tree):
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)
