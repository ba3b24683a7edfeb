"""bf16 end-to-end divergence calibration (VERDICT r4 item 8).

On RANDOM weights the refinement dynamics diverge (|flow| ~1e3 px after one
iteration — BASELINE.md "Accuracy guard calibration"), so any summation-order
change produces O(px) iteration chaos and the f32-vs-bf16 comparison is
meaningless. Real released checkpoints are not obtainable in this
environment (no egress). This probe makes the comparison on the nearest
obtainable thing to trained weights: it trains the flagship for a few
hundred steps on synthetic data (enough for the GRU to learn damped updates
— the flow iterates contract to the supervision scale), then runs the SAME
fixed clip through the f32 XLA composite and the bf16 TPU kernel set at the
full 12 iterations, test mode, and reports flow-field deltas.

  python tools/probe_bf16.py [--steps 400] [--height 288] [--width 512]
      [--eval_height 436] [--eval_width 1024]

Results append to /tmp/probe_bf16.txt.
"""

from __future__ import annotations

import argparse
import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=400)
    p.add_argument("--height", type=int, default=288)
    p.add_argument("--width", type=int, default=512)
    p.add_argument("--eval_height", type=int, default=436)
    p.add_argument("--eval_width", type=int, default=1024)
    p.add_argument("--T", type=int, default=4)
    p.add_argument("--iters", type=int, default=12)
    args = p.parse_args()

    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    import jax.numpy as jnp

    from streamflow_tpu.config import StreamFlowConfig
    from streamflow_tpu.models import create_model
    from streamflow_tpu.ops.padding import InputPadder
    from streamflow_tpu.training.optim import make_optimizer
    from streamflow_tpu.training.state import TrainState
    from streamflow_tpu.training.step import make_train_step

    T, H, W = args.T, args.height, args.width
    rng = np.random.default_rng(0)

    # --- short training run (synthetic smooth-ish data) -------------------
    # Piecewise-smooth images + small smooth flows: enough signal for the
    # update block to learn contraction (the probe's purpose), fast to make.
    def synth_batch(seed):
        g = np.random.default_rng(seed)
        base = g.integers(0, 255, (1, 1, H // 8, W // 8, 3)).astype(np.float32)
        imgs = np.repeat(np.repeat(base, 8, axis=2), 8, axis=3)
        imgs = np.repeat(imgs, T, axis=1)
        imgs += g.normal(0, 8, imgs.shape)
        flow = np.repeat(np.repeat(
            g.normal(0, 2.0, (1, T - 1, H // 32, W // 32, 2)),
            32, axis=2), 32, axis=3).astype(np.float32)
        return {
            "images": jnp.asarray(np.clip(imgs, 0, 255), jnp.float32),
            "flows": jnp.asarray(flow),
            "valids": jnp.ones((1, T - 1, H, W), jnp.float32),
        }

    cfg_train = StreamFlowConfig(T=T, iters=args.iters, mixed_precision=True,
                                 remat=True, scan_unroll=1)
    model = create_model("streamflow", cfg=cfg_train)
    tx = make_optimizer(lr=2.5e-4, num_steps=args.steps + 100)
    params = jax.jit(lambda k, x: model.init(k, x, iters=1))(
        jax.random.PRNGKey(0), synth_batch(0)["images"][:, :, :64, :96])
    state = TrainState.create(params, tx)
    step = jax.jit(make_train_step(model, tx, gamma=0.85, iters=args.iters),
                   donate_argnums=(0,))

    t0 = time.time()
    for i in range(args.steps):
        state, metrics = step(state, synth_batch(i + 1))
        if i % 50 == 0 or i == args.steps - 1:
            print(f"step {i:4d}: loss={float(metrics['loss']):9.3f} "
                  f"epe={float(metrics['epe']):7.3f} "
                  f"({time.time() - t0:.0f}s)", flush=True)
    trained = jax.device_get(state.params)
    del state, step

    # --- f32 composite vs bf16 kernel set at full iters, fixed clip -------
    eh, ew = args.eval_height, args.eval_width
    clip = jnp.asarray(rng.integers(0, 255, (1, T, eh, ew, 3)), jnp.float32)
    padder = InputPadder((eh, ew, 3), mode="sintel")
    clip = padder.pad(clip.reshape(T, eh, ew, 3)).reshape(
        1, T, *padder.padded_shape, 3)

    def flows_of(cfg):
        m = create_model("streamflow", cfg=cfg)
        out = jax.jit(lambda p, x: m.apply(p, x, test_mode=True))(
            trained, clip)
        return np.asarray(jax.device_get(out), np.float64)

    f32_ref = flows_of(StreamFlowConfig(
        T=T, iters=args.iters, mixed_precision=False, corr_impl="xla",
        attn_impl="full", dw_impl="xla", lga_impl="xla",
        twins_ffn_fused=False, ffn_gelu="erf"))
    f32_fast = flows_of(StreamFlowConfig(
        T=T, iters=args.iters, mixed_precision=False))
    bf16_fast = flows_of(StreamFlowConfig(
        T=T, iters=args.iters, mixed_precision=True))

    mag = np.sqrt((f32_ref ** 2).sum(-1))
    lines = [f"probe_bf16: {args.steps} steps at {H}x{W}, eval {eh}x{ew} "
             f"T={T} iters={args.iters}; |flow| mean {mag.mean():.2f} "
             f"max {mag.max():.2f} px"]
    for name, f in (("f32 kernels vs f32 composite", f32_fast),
                    ("bf16 kernels vs f32 composite", bf16_fast)):
        epe = np.sqrt(((f - f32_ref) ** 2).sum(-1))
        lines.append(f"  {name}: EPE mean {epe.mean():.4f} px, "
                     f"p99 {np.percentile(epe, 99):.4f}, max {epe.max():.4f}")
    out = "\n".join(lines)
    print(out, flush=True)
    with open("/tmp/probe_bf16.txt", "a") as f:
        f.write(out + "\n")


if __name__ == "__main__":
    main()
