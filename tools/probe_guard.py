"""Diagnose the bench accuracy-guard blowup (r5s2: f32 default kernel set vs
f32 XLA composite = 5.2e7 px max EPE at 12 iters).

Hypothesis: random-weight iteration chaos — the untrained GRU amplifies any
per-op difference exponentially, so a 12-iteration comparison cannot
distinguish kernel corruption from legitimate rounding. Controls:

  A. composite(imgs) vs composite(imgs + 1e-4): same executable, same
     weights — any blowup is pure input-sensitivity (chaos), no kernels
     involved.
  B. default-vs-composite max EPE at iters = 1, 2, 4, 8, 12: chaos shows
     exponential growth with iteration count; a kernel bug shows a large
     delta already at iters=1.

Usage: python tools/probe_guard.py [--height H] [--width W]
"""

import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  str(Path(__file__).resolve().parent.parent / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import jax.numpy as jnp  # noqa: E402

from streamflow_tpu.config import StreamFlowConfig  # noqa: E402
from streamflow_tpu.models import create_model  # noqa: E402
from streamflow_tpu.ops.padding import InputPadder  # noqa: E402


def main():
    args = sys.argv[1:]

    def opt(name, default):
        if name in args:
            i = args.index(name)
            v = int(args[i + 1])
            del args[i:i + 2]
            return v
        return default

    H = opt("--height", 436)
    W = opt("--width", 1024)

    B, T = 1, 4
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.integers(0, 255, (B, T, H, W, 3)), jnp.float32)
    padder = InputPadder((H, W, 3), mode="sintel")
    imgs = padder.pad(imgs.reshape(B * T, H, W, 3)).reshape(
        B, T, *padder.padded_shape, 3)

    COMPOSITE = dict(corr_impl="xla", attn_impl="full", dw_impl="xla",
                     lga_impl="xla", twins_ffn_fused=False, ffn_gelu="erf")

    def flows_of(iters, x, **kw):
        cfg = StreamFlowConfig(T=T, iters=iters, mixed_precision=False, **kw)
        model = create_model("streamflow", cfg=cfg)
        params = jax.jit(lambda k, a: model.init(k, a, test_mode=True))(
            jax.random.PRNGKey(0), x)
        return jax.jit(
            lambda p, a: model.apply(p, a, test_mode=True))(params, x)

    def stats(name, a, b):
        epe = jnp.sqrt(jnp.sum((a - b) ** 2, axis=-1))
        print(f"  {name}: max_epe={float(jnp.max(epe)):.6g} "
              f"mean_epe={float(jnp.mean(epe)):.6g} "
              f"|a|max={float(jnp.max(jnp.abs(a))):.4g} "
              f"|b|max={float(jnp.max(jnp.abs(b))):.4g}", flush=True)

    print("A. input-perturbation control (composite, iters=2/12):")
    for it in (2, 12):
        t0 = time.time()
        f0 = flows_of(it, imgs, **COMPOSITE)
        f1 = flows_of(it, imgs + 1e-4, **COMPOSITE)
        stats(f"iters={it} +1e-4 input", f0, f1)
        print(f"    ({time.time() - t0:.0f}s)")

    print("B. default kernel set vs composite, by iteration count:")
    for it in (1, 2, 4, 12):
        t0 = time.time()
        fa = flows_of(it, imgs)
        fb = flows_of(it, imgs, **COMPOSITE)
        stats(f"iters={it}", fa, fb)
        print(f"    ({time.time() - t0:.0f}s)")


if __name__ == "__main__":
    main()
