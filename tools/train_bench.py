"""Hardware training-step benchmark: short synthetic-data training runs of
the flagship at the canonical stage-2 shape (432x960, T=4 — the reference's
scripts/train_sintel_kitti.sh stage), measuring compile time, steps/s, and
which dw path wins under autodiff.

The reference's primary artifact is the 3-stage training pipeline
(train_mf.py:224-257); this records the TPU-side evidence that the full
fwd+bwd+AdamW step compiles and performs on the real toolchain.

Usage:
    python tools/train_bench.py [spec ...] [--steps N] [--height H]
        [--width W] [--batch B] [--iters N]

Each spec is a tools/sweep_e2e.py-style override list applied on top of the
training configuration (mixed_precision + remat + scan_unroll=1), e.g.:

    python tools/train_bench.py default dw=banded_mxu dw=xla --steps 20

Results append to /tmp/train_bench_results.txt as well as stdout.
"""

import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tools.sweep_e2e import parse_spec  # noqa: E402


def main():
    args = [a for a in sys.argv[1:]]

    def opt(name, default, cast=int):
        if name in args:
            i = args.index(name)
            v = cast(args[i + 1])
            del args[i:i + 2]
            return v
        return default

    steps = opt("--steps", 12)
    H = opt("--height", 432)
    W = opt("--width", 960)
    B = opt("--batch", 1)
    iters = opt("--iters", 12)
    T = opt("--T", 4)
    specs = args or ["default"]

    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(__file__)), ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    import jax.numpy as jnp

    from streamflow_tpu.config import StreamFlowConfig
    from streamflow_tpu.models import create_model
    from streamflow_tpu.training.optim import make_optimizer
    from streamflow_tpu.training.state import TrainState
    from streamflow_tpu.training.step import make_train_step

    rng = np.random.default_rng(0)

    def make_batch(nb, bidir):
        b = {
            "images": jnp.asarray(rng.integers(0, 255, (nb, T, H, W, 3)),
                                  dtype=jnp.float32),
            "flows": jnp.asarray(rng.standard_normal((nb, T - 1, H, W, 2))
                                 * 4.0, dtype=jnp.float32),
            "valids": jnp.ones((nb, T - 1, H, W), jnp.float32),
        }
        if bidir:
            b["flows_bw"] = jnp.asarray(
                rng.standard_normal((nb, T - 1, H, W, 2)) * 4.0,
                dtype=jnp.float32)
            b["valids_bw"] = jnp.ones((nb, T - 1, H, W), jnp.float32)
        return b

    out_path = Path("/tmp/train_bench_results.txt")
    print(f"train_bench: {B}x{T}x{H}x{W}, iters={iters}, {steps} steps, "
          f"backend={jax.default_backend()}")

    for spec in specs:
        over = parse_spec(spec)
        bidir = over.pop("bidir", False)
        nb = over.pop("B", B)
        # Training defaults: bf16 + remat, sequential scan (the unrolled
        # scan multiplies bwd activation memory), canonical iter count.
        kw = dict(T=T, iters=iters, mixed_precision=True, remat=True,
                  scan_unroll=1)
        kw.update(over)
        cfg = StreamFlowConfig(**kw)
        batch_s = make_batch(nb, bidir)
        model = create_model("streamflow", cfg=cfg)
        tx = make_optimizer(lr=2.5e-4, num_steps=max(steps, 100))

        t0 = time.perf_counter()
        params = jax.jit(lambda k, x: model.init(k, x, iters=1))(
            jax.random.PRNGKey(0), batch_s["images"][:, :, :64, :96])
        # init at a small spatial size (params are shape-independent),
        # then the real-step compile below is the number that matters
        state = TrainState.create(params, tx)
        step = jax.jit(make_train_step(model, tx, gamma=0.85, iters=iters,
                                       bidirectional=bidir),
                       donate_argnums=(0,))
        try:
            state, metrics = step(state, batch_s)
            jax.block_until_ready(metrics["loss"])
        except Exception as e:
            line = f"  {spec:24s} FAILED compile/first-step: {type(e).__name__}: {e}"
            print(line)
            with out_path.open("a") as f:
                f.write(line + "\n")
            continue
        t_compile = time.perf_counter() - t0

        # chained timing: each step's batch depends on the previous metrics
        # via a device scalar, so steps serialize on-device.
        t0 = time.perf_counter()
        for _ in range(steps):
            eps = metrics["loss"] * 1e-12
            b2 = dict(batch_s, images=batch_s["images"] + eps)
            state, metrics = step(state, b2)
        loss = float(metrics["loss"])
        total = time.perf_counter() - t0
        sps = steps / total
        line = (f"  {spec:24s} {1e3 * total / steps:9.1f} ms/step "
                f"({sps:5.3f} steps/s, {nb * sps:6.3f} clips/s) "
                f"compile+first {t_compile:6.1f}s  loss={loss:.3f} "
                f"grad_norm={float(metrics['grad_norm']):.3f}")
        print(line, flush=True)
        with out_path.open("a") as f:
            f.write(f"{nb}x{T}x{H}x{W} it{iters} {line}\n")
        assert np.isfinite(loss), f"non-finite loss for {spec}"


if __name__ == "__main__":
    main()
