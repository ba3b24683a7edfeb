"""Multi-host execution: loader per-host sharding and a real 2-process CPU
smoke test (jax.distributed coordination service + gloo collectives) whose
data-parallel step must produce the SAME loss as the single-process step on
the same global batch."""

import json
import os
import socket
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def test_loader_host_sharding_disjoint_and_complete():
    """Two hosts with the same seed cover the dataset disjointly, with equal
    batch counts; single-host behavior is unchanged."""
    from streamflow_tpu.data.loader import DataLoader

    class Idx:
        def __len__(self):
            return 23

        def load(self, i, rng=None):
            return {"i": np.array([i])}

    ds = Idx()
    full = DataLoader(ds, 2, num_workers=1, seed=7)
    h0 = DataLoader(ds, 2, num_workers=1, seed=7,
                    process_index=0, process_count=2)
    h1 = DataLoader(ds, 2, num_workers=1, seed=7,
                    process_index=1, process_count=2)
    assert len(h0) == len(h1)

    def seen(loader):
        out = []
        for b in loader.epoch(3):
            out += [int(v) for v in b["i"].reshape(-1)]
        return out

    s0, s1 = seen(h0), seen(h1)
    assert not set(s0) & set(s1), "hosts must load disjoint clips"
    assert len(s0) == len(s1)
    # together they are a subset of one epoch with no duplicates
    assert len(set(s0 + s1)) == len(s0 + s1)
    assert set(s0 + s1) <= set(seen(full) + list(range(23)))


@pytest.mark.slow
def test_two_process_step_matches_single_process(tmp_path):
    """Spawn 2 real processes (1 CPU device each) via jax.distributed; their
    shared data-parallel step must agree with each other AND with the
    unsharded single-process step on the same global batch."""
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    worker = os.path.join(os.path.dirname(__file__), "_multihost_worker.py")
    env = dict(os.environ)
    procs = [
        subprocess.Popen([sys.executable, worker, str(i), "2", str(port)],
                         stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                         text=True, env=env)
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, f"worker failed:\n{err[-4000:]}"
        outs.append(json.loads(out.strip().splitlines()[-1]))

    assert {o["process"] for o in outs} == {0, 1}
    np.testing.assert_allclose(outs[0]["loss"], outs[1]["loss"], rtol=1e-6)
    np.testing.assert_allclose(outs[0]["epe"], outs[1]["epe"], rtol=1e-6)

    # single-process reference on the identical global batch
    from streamflow_tpu.config import StreamFlowConfig
    from streamflow_tpu.models import create_model
    from streamflow_tpu.training.optim import make_optimizer
    from streamflow_tpu.training.state import TrainState
    from streamflow_tpu.training.step import make_train_step

    B, T, H, W = 2, 4, 64, 64
    rng = np.random.default_rng(0)
    batch = {
        "images": jnp.asarray(
            rng.integers(0, 255, (B, T, H, W, 3)).astype(np.float32)),
        "flows": jnp.asarray(
            (0.1 * rng.standard_normal((B, T - 1, H, W, 2))
             ).astype(np.float32)),
        "valids": jnp.ones((B, T - 1, H, W), jnp.float32),
    }
    cfg = StreamFlowConfig(T=T, iters=1, mixed_precision=False)
    model = create_model("streamflow", cfg=cfg)
    params = jax.jit(lambda k, x: model.init(k, x, iters=1))(
        jax.random.PRNGKey(0), jnp.zeros((B, T, H, W, 3), jnp.float32))
    tx = make_optimizer(1e-4, 100)
    step = jax.jit(make_train_step(model, tx, 0.85, iters=1))
    _, metrics = step(TrainState.create(params, tx), batch)
    np.testing.assert_allclose(outs[0]["loss"], float(metrics["loss"]),
                               rtol=1e-5)
    np.testing.assert_allclose(outs[0]["epe"], float(metrics["epe"]),
                               rtol=1e-5)
