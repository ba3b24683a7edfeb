"""Standalone probe: column-major (C-major) FFN-pair Pallas kernel rate.

Go/no-go for a C-major SK-block layout (ROADMAP r4): the banded-MXU dw
kernels beat the cond-shielded XLA convs (36.7 vs 42.0 ms/clip, r3s5) but
lose e2e to the C-minor<->C-major operand transposes (~15 ms). A whole-loop
C-major layout would eliminate those transposes — IF the FFN-pair kernels
(the MXU-rate anchor of the loop, ~158 TFLOP/s row-major) hold their rate
when operands are (C, N) instead of (N, C).

Measures, at the SK-block benchmark shapes:
  - row-major ffn_pair (the shipping kernel, _ffn_kernel.py)
  - a C-major twin (this file): h = gelu(W1^T @ x + b1); y = W2^T @ h + b2,
    with x (C, N) blocked over columns.

Usage: python tools/probe_cmajor_ffn.py  (on the live TPU)
"""

import functools
import math
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

# erf has no direct Mosaic lowering in this toolchain; the package ships a
# VPU-exact polynomial (used by every shipping kernel).
from streamflow_tpu.ops.pallas._ffn_kernel import _gelu


def _kernel_cm(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref, *, residual):
    x = x_ref[...]                                   # (C, bn)
    dt = x.dtype
    h = jax.lax.dot_general(
        w1_ref[...].astype(dt), x, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)          # (Ch, bn)
    h = _gelu(h + b1_ref[...].astype(jnp.float32)).astype(dt)
    y = jax.lax.dot_general(
        w2_ref[...].astype(dt), h, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)          # (Co, bn)
    y = y + b2_ref[...].astype(jnp.float32)
    if residual:
        y = _gelu(x.astype(jnp.float32) + y)
    o_ref[...] = y.astype(dt)


@functools.partial(jax.jit,
                   static_argnames=("residual", "block_n", "interpret"))
def ffn_pair_cmajor(x, w1, b1, w2, b2, residual=True, block_n=512,
                    interpret=False):
    """x: (C, N); w1 (C, Ch); w2 (Ch, Co); b (Ch,)/(Co,). Returns (Co, N)."""
    c, n = x.shape
    ch = w1.shape[1]
    co = w2.shape[1]
    assert n % block_n == 0
    return pl.pallas_call(
        functools.partial(_kernel_cm, residual=residual),
        interpret=interpret,
        grid=(n // block_n,),
        in_specs=[
            pl.BlockSpec((c, block_n), lambda i: (0, i)),
            pl.BlockSpec((c, ch), lambda i: (0, 0)),
            pl.BlockSpec((ch, 1), lambda i: (0, 0)),
            pl.BlockSpec((ch, co), lambda i: (0, 0)),
            pl.BlockSpec((co, 1), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((co, block_n), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((co, n), x.dtype),
    )(x, w1, b1.reshape(ch, 1), w2, b2.reshape(co, 1))


def time_fn(fn, x, reps=30):
    """Chained on-device timing: one jit of `reps` dependent applications —
    per-call host dispatch through the axon tunnel is 0.3-3.7 ms noisy
    (measured), so unchained per-call timing is meaningless here. Requires
    fn output shape == x shape (residual pairs)."""

    @jax.jit
    def loop(x0):
        def body(_, v):
            return fn(v) * 0.01 + x0
        return jax.lax.fori_loop(0, reps, body, x0)

    jax.block_until_ready(loop(x))
    t0 = time.perf_counter()
    out = loop(x)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def main():
    from streamflow_tpu.ops.pallas._ffn_kernel import ffn_pair

    rng = np.random.default_rng(0)
    n = 3 * 55 * 128  # SK-block tokens at 436x1024 (3 pairs folded in batch)
    for c in (256, 384):
        ch = int(1.5 * c) // 128 * 128 + (128 if (int(1.5 * c) % 128) else 0)
        ch = math.ceil(1.5 * c / 128) * 128
        x_rm = jnp.asarray(rng.standard_normal((n, c)), jnp.bfloat16)
        w1 = jnp.asarray(rng.standard_normal((c, ch)) * 0.05, jnp.float32)
        b1 = jnp.zeros((ch,), jnp.float32)
        w2 = jnp.asarray(rng.standard_normal((ch, c)) * 0.05, jnp.float32)
        b2 = jnp.zeros((c,), jnp.float32)

        flops = 2 * n * (c * ch + ch * c)

        t_rm = time_fn(jax.jit(lambda x: ffn_pair(x, w1, b1, w2, b2, True)),
                       x_rm)
        x_cm = x_rm.T.copy()
        # In C-major the lanes are the token axis: blocks must be 128-lane
        # multiples that divide n (21120 = 128 * 165, 165 = 3*5*11).
        cands = [m * 128 for m in (5, 15) if n % (m * 128) == 0]
        for bn in cands:
            try:
                f = jax.jit(lambda x, bn=bn: ffn_pair_cmajor(
                    x, w1, b1, w2, b2, True, bn))
                # numerics check vs row-major
                y_rm = np.asarray(ffn_pair(x_rm, w1, b1, w2, b2, True),
                                  np.float32)
                y_cm = np.asarray(f(x_cm), np.float32).T
                err = np.max(np.abs(y_rm - y_cm))
                t_cm = time_fn(f, x_cm)
                print(f"C={c} ch={ch}: row-major {t_rm*1e3:.3f} ms "
                      f"({flops/t_rm/1e12:.1f} T) | cmajor bn={bn} "
                      f"{t_cm*1e3:.3f} ms ({flops/t_cm/1e12:.1f} T) "
                      f"err={err:.4f}", flush=True)
            except Exception as e:
                print(f"C={c} bn={bn}: FAIL {type(e).__name__}: "
                      f"{str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
