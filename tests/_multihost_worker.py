"""Worker process for the 2-process multi-host smoke test (not a test file).

Usage: python tests/_multihost_worker.py <process_id> <num_processes> <port>

Each process owns ONE virtual CPU device; together they form a 2-device
global 'data' mesh. Runs one data-parallel train step on a deterministic
global batch and prints the resulting loss/epe as one JSON line, so the
parent can assert cross-process agreement and equality with the
single-process step.
"""

import json
import os
import sys

pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
# both workers live on this machine; gloo must rendezvous over loopback
# (the default interface pick can be a non-routable container address)
os.environ.setdefault("GLOO_SOCKET_IFNAME", "lo")
sys.path[:] = [p for p in sys.path if ".axon_site" not in p]
os.environ.pop("PALLAS_AXON_REMOTE_COMPILE", None)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_streamflow")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

from streamflow_tpu.parallel import make_mesh, multihost  # noqa: E402

idx, cnt = multihost.initialize(f"127.0.0.1:{port}", nproc, pid)
assert (idx, cnt) == (pid, nproc), (idx, cnt)
assert len(jax.devices()) == nproc and jax.local_device_count() == 1

from streamflow_tpu.config import StreamFlowConfig  # noqa: E402
from streamflow_tpu.data.loader import DataLoader  # noqa: E402
from streamflow_tpu.models import create_model  # noqa: E402
from streamflow_tpu.training.optim import make_optimizer  # noqa: E402
from streamflow_tpu.training.state import TrainState  # noqa: E402
from streamflow_tpu.training.step import (  # noqa: E402
    make_train_step, shard_train_step,
)

B, T, H, W = nproc, 4, 64, 64
cfg = StreamFlowConfig(T=T, iters=1, mixed_precision=False)
model = create_model("streamflow", cfg=cfg)

# Deterministic GLOBAL batch; this host keeps only its row (the loader's
# per-host sharding contract: same permutation, strided slice).
rng = np.random.default_rng(0)
gbatch = {
    "images": rng.integers(0, 255, (B, T, H, W, 3)).astype(np.float32),
    "flows": (0.1 * rng.standard_normal((B, T - 1, H, W, 2))
              ).astype(np.float32),
    "valids": np.ones((B, T - 1, H, W), np.float32),
}
local = {k: v[pid::nproc] for k, v in gbatch.items()}

mesh = make_mesh(n_data=nproc, devices=jax.devices())
params = jax.jit(lambda k, x: model.init(k, x, iters=1))(
    jax.random.PRNGKey(0), jnp.zeros((B, T, H, W, 3), jnp.float32))
tx = make_optimizer(1e-4, 100)
state = TrainState.create(params, tx)

with mesh:
    repl = NamedSharding(mesh, P())
    state = jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(repl, np.asarray(x)),
        state)
    batch = multihost.form_global_batch(mesh, local)
    step = shard_train_step(make_train_step(model, tx, 0.85, iters=1), mesh)
    # AOT-compile BEFORE the first collective: compilation is minutes on a
    # cold CPU cache, and the gloo context init (triggered by the first
    # collective execution) times out after ~30s if the peers' first
    # collectives are skewed by compile time. Compiling first bounds the
    # skew at the collective to the compile-time difference.
    compiled = step.lower(state, batch).compile()
    # coordination-service barrier so both processes enter the first
    # collective together (gloo context setup has a ~30s handshake timeout,
    # far shorter than possible compile-time skew)
    multihost.barrier("post_compile")
    # tiny collective to initialize the gloo context
    ones = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P("data")), np.ones((1,), np.float32))
    assert float(jnp.sum(ones)) == float(nproc)
    state, metrics = compiled(state, batch)
    jax.block_until_ready(metrics)

print(json.dumps({"process": pid,
                  "loss": float(metrics["loss"]),
                  "epe": float(metrics["epe"])}), flush=True)
