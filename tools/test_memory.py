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
    p.add_argument("--spec", default="",
                   help="extra sweep_e2e-style config overrides, e.g. "
                        "'lga=xla,tffn=0'")
    args = p.parse_args()

    import os

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

    kw = dict(T=args.T, iters=args.iters, mixed_precision=True,
              attn_impl="flash", corr_impl=args.corr_impl, gsa_flash=True)
    if args.spec:
        from tools.sweep_e2e import parse_spec

        kw.update(parse_spec(args.spec))
    cfg = StreamFlowConfig(**kw)
    model = create_model("streamflow", cfg=cfg)

    rng = np.random.default_rng(0)
    imgs = jnp.asarray(
        rng.integers(0, 255, (1, args.T, args.height, args.width, 3)),
        dtype=jnp.float32)
    padder = InputPadder((args.height, args.width, 3))
    imgs = padder.pad(imgs.reshape(args.T, *imgs.shape[2:])).reshape(
        1, args.T, *padder.padded_shape, 3)
    print(f"input {imgs.shape}, corr={args.corr_impl}, attn=flash")

    # init at a small spatial size: params are shape-independent, and the
    # full-size init would itself be a minutes-long whole-model compile
    params = jax.jit(lambda k, x: model.init(k, x, test_mode=True, iters=1))(
        jax.random.PRNGKey(0), imgs[:, :, :64, :96])

    @jax.jit
    def fwd(p_, x, eps):
        return jnp.mean(model.apply(p_, x + eps, test_mode=True)) * 1e-9

    t0 = time.time()
    e = jnp.float32(0.0)
    t_loop = []
    for i in range(args.loops):
        e = fwd(params, imgs, e)
        float(e)
        t_loop.append(time.time() - t0 - sum(t_loop))
        print(f"loop {i}: {t_loop[-1]:.2f}s (val {float(e):.3e})", flush=True)
    print(f"OK: {args.loops} loops at {imgs.shape[2]}x{imgs.shape[3]} in "
          f"{time.time() - t0:.1f}s (incl. compile); "
          f"warm {min(t_loop):.2f}s/clip")
    stats = getattr(jax.local_devices()[0], "memory_stats", lambda: None)()
    if stats:
        gb = 2.0 ** 30
        print(f"HBM: peak {stats.get('peak_bytes_in_use', 0) / gb:.2f} GiB, "
              f"limit {stats.get('bytes_limit', 0) / gb:.2f} GiB")


if __name__ == "__main__":
    main()
