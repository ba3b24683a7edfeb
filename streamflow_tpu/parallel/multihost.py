"""Multi-host (multi-process) execution entry.

The reference is strictly single-process (train_mf.py:146 — nn.DataParallel;
no torch.distributed anywhere, SURVEY §5.8). On TPU pods, training spans
multiple hosts, each owning a slice of the chips; the TPU-native recipe is:

1. every process calls ``jax.distributed.initialize`` (coordination service),
2. one GLOBAL mesh is built over ``jax.devices()`` (all processes' chips),
3. each host loads only its shard of the data (``DataLoader(process_index=,
   process_count=)`` — a shared-seed permutation sliced per host),
4. per-host numpy batches are assembled into one global sharded jax.Array
   with ``jax.make_array_from_process_local_data``; the jit'd train step is
   unchanged — XLA emits gradient all-reduces over ICI within a slice and
   DCN across slices.

Everything here is a thin wiring layer: no hand-written collectives.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None,
               local_device_ids=None) -> tuple[int, int]:
    """Initialize the jax distributed runtime when running multi-process.

    With no arguments, relies on the environment (TPU pod metadata or the
    JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID variables);
    a single-process run (nothing configured) is a no-op. Returns
    (process_index, process_count)."""
    explicit = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if explicit or num_processes not in (None, 1):
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
            local_device_ids=local_device_ids,
        )
    return jax.process_index(), jax.process_count()


def global_batch_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    spec = [None] * ndim
    spec[0] = "data"
    return NamedSharding(mesh, P(*spec))


def form_global_batch(mesh: Mesh, batch):
    """Assemble per-host numpy batches into global jax.Arrays sharded over
    the mesh's 'data' axis. The global batch size is
    per_host_batch * process_count; each host contributes the rows its mesh
    devices own. Works unchanged in single-process mode (where it is
    equivalent to parallel.shard_batch)."""
    def put(x):
        x = np.asarray(x)
        return jax.make_array_from_process_local_data(
            global_batch_sharding(mesh, x.ndim), x)

    return jax.tree_util.tree_map(put, batch)


def is_primary() -> bool:
    """True on the process that should own logging/plots (host 0)."""
    return jax.process_index() == 0


def barrier(name: str, timeout_s: int = 600) -> None:
    """Block until every process reaches this barrier, via the coordination
    service (plain RPC — no device collectives). Use after per-process
    compilation and before the first collective: gloo/ICI context setup has
    a short handshake timeout, and compile-time skew between hosts
    (cache hits vs misses) otherwise breaks it. No-op single-process."""
    from jax._src import distributed

    client = distributed.global_state.client
    if client is not None and jax.process_count() > 1:
        client.wait_at_barrier(name, timeout_s * 1000)
