"""High-resolution memory stress (reference test_memory.py: 1440x2560, T=4,
flash-attention, repeated inference). Exercises the three high-memory
strategies: Pallas flash attention, chunked/fused correlation (no (N,N)
volume), and chunked Twins GSA.

  python tools/test_memory.py --height 1440 --width 2560 --iters 15 --loops 3
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--height", type=int, default=1440)
    p.add_argument("--width", type=int, default=2560)
    p.add_argument("--T", type=int, default=4)
    p.add_argument("--iters", type=int, default=15)
    p.add_argument("--loops", type=int, default=3)
    p.add_argument("--corr_impl", default="chunked",
                   choices=["xla", "chunked", "pallas"])
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from streamflow_tpu.config import StreamFlowConfig
    from streamflow_tpu.models import create_model
    from streamflow_tpu.ops.padding import InputPadder

    cfg = StreamFlowConfig(T=args.T, iters=args.iters, mixed_precision=True,
                           attn_impl="flash", corr_impl=args.corr_impl,
                           gsa_flash=True)
    model = create_model("streamflow", cfg=cfg)

    rng = np.random.default_rng(0)
    imgs = jnp.asarray(
        rng.integers(0, 255, (1, args.T, args.height, args.width, 3)),
        dtype=jnp.float32)
    padder = InputPadder((args.height, args.width, 3))
    imgs = padder.pad(imgs.reshape(args.T, *imgs.shape[2:])).reshape(
        1, args.T, *padder.padded_shape, 3)
    print(f"input {imgs.shape}, corr={args.corr_impl}, attn=flash")

    params = jax.jit(lambda k, x: model.init(k, x, test_mode=True))(
        jax.random.PRNGKey(0), imgs)

    @jax.jit
    def fwd(p_, x, eps):
        return jnp.mean(model.apply(p_, x + eps, test_mode=True)) * 1e-9

    t0 = time.time()
    e = jnp.float32(0.0)
    for i in range(args.loops):
        e = fwd(params, imgs, e)
        print(f"loop {i}: running (val {float(e):.3e})", flush=True)
    print(f"OK: {args.loops} loops at {imgs.shape[2]}x{imgs.shape[3]} in "
          f"{time.time() - t0:.1f}s (incl. compile)")


if __name__ == "__main__":
    main()
