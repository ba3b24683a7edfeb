"""Fused SK depthwise-conv chain as one Pallas kernel.

Computes the SKBlock conv stack (reference PCBlock4_Deep_nopool_res,
core/update.py:30-36): for each kernel size k in k_conv,

    x = gelu(x + dwconv_k(x) + b_k)          (SAME zero padding)

in a single VMEM-resident pass per (batch, channel-tile) grid cell.

Why a custom kernel (r2 trace data, 440x1024/T4/12it):
- XLA's depthwise convs run at ~3.4 TFLOP/s on the v5e VPU — one shift + one
  FMA per tap (2 vector ops/tap). This kernel pre-shifts each dx column
  offset ONCE into a slab scratch and reuses it across all k row offsets
  (row offsets are free vreg addressing), giving ~1.1 vector ops/tap.
- The gelu residuals between stages never round-trip to HBM.
- It removes `convolution` ops from the refinement-loop HLO: the Mosaic
  custom-call for the fused corr lookup otherwise wrecks XLA's conv layout
  assignment for the entire scan body (measured: flow_head dw15 4 -> 65
  ms/clip from the kernel's mere presence).

Constraints (asserted): C % 128 == 0, every stage except the last has k == 1
(the canonical chains are [1, 15] and [1, 7]), bf16/f32 io. Falls back to the
XLA composite elsewhere (see layers/sk.py).

Accumulation is fp32; inter-stage values are stored in the io dtype
(matching the XLA composite's precision under mixed precision).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CP = 8          # left column pad inside the A scratch (>= max radius + 1)
STRIP = 16      # rows processed per strip (bounds VMEM temporaries)


_ERF_ALPHA = (2.2905065861350646e-4, 3.4082910107109506e-3,
              5.0955695062380861e-2, 1.8520832239976145e-1,
              1.128379143519084e0)
_ERF_BETA = (-1.1791602954361697e-7, 2.3547966471313185e-5,
             1.0179625278914885e-3, 1.4070470171167667e-2,
             1.1098505178285362e-1, 4.9746925110067538e-1, 1.0)


def _poly(x, coeffs):
    acc = jnp.full(x.shape, coeffs[0], x.dtype)
    for c in coeffs[1:]:
        acc = acc * x + c
    return acc


def _erf_f32(x):
    """XLA's F32 Erf (clamped rational polynomial) — Mosaic has no erf
    lowering; this reproduces the same minimax approximation in-kernel."""
    x = jnp.clip(x, -4.0, 4.0)
    x2 = x * x
    return x * _poly(x2, _ERF_ALPHA) / _poly(x2, _ERF_BETA)


def _gelu_f32(x, _erf=None):
    """Exact (erf) GELU evaluated in fp32."""
    xf = x.astype(jnp.float32)
    erf = _erf or jax.lax.erf
    return xf * 0.5 * (1.0 + erf(xf * (1.0 / math.sqrt(2.0))))


def chain_xla(x, stages):
    """Reference XLA composite: the exact math the kernel implements.

    x: (B, H, W, C); stages: [(w (k,k,C), b (C,)), ...].
    """
    dt = x.dtype
    for w, b in stages:
        k = w.shape[0]
        if k == 1:
            y = x * w[0, 0].astype(dt) + b.astype(dt)
        else:
            y = jax.lax.conv_general_dilated(
                x, w[:, :, None, :].astype(dt), (1, 1),
                [(k // 2, k // 2)] * 2,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=x.shape[-1],
                preferred_element_type=dt,
            ) + b.astype(dt)
        x = _gelu_f32(x + y).astype(dt)
    return x


def _kernel(x_ref, *refs, ks, H, W, Wp, rmax, strip):
    n = len(ks)
    w_refs = refs[:n]
    b_refs = refs[n:2 * n]
    out_ref = refs[2 * n]
    a_ref = refs[2 * n + 1]      # (Hp, Wp, 128) io-dtype scratch, zero pads
    s_ref = refs[2 * n + 2]      # (strip + 2*rmax, W, 128) shifted slab

    dt = a_ref.dtype
    a_ref[...] = jnp.zeros(a_ref.shape, dt)

    # x -> A core, applying every k == 1 stage pointwise (gelu(x*(1+w)+b)).
    # Strip-wise: Mosaic materializes whole-expression temporaries in VMEM,
    # so unbounded elementwise chains on (H, W, 128) f32 blow the scoped
    # vmem limit.
    n_strips = (H + strip - 1) // strip
    for s in range(n_strips):
        s0 = min(s * strip, H - strip) if H >= strip else 0
        sh = min(strip, H)
        core = x_ref[0, pl.ds(s0, sh)].astype(jnp.float32)
        for i, k in enumerate(ks[:-1]):
            wv = w_refs[i][0, 0][None, None].astype(jnp.float32)
            bv = b_refs[i][0][None, None].astype(jnp.float32)
            core = _gelu_f32(core * (1.0 + wv) + bv, _erf=_erf_f32)
        a_ref[pl.ds(s0 + rmax, sh), CP:CP + W] = core.astype(dt)

    # Final conv stage, accumulated in output strips.
    k = ks[-1]
    r = k // 2
    w_ref = w_refs[-1]
    bv = b_refs[-1][0][None, None].astype(jnp.float32)
    at = jnp.float32
    for s in range(n_strips):
        s0 = min(s * strip, H - strip) if H >= strip else 0
        sh = min(strip, H)
        # dx statically unrolled: Mosaic only lowers *static* unaligned
        # sublane offsets. Per dx: ONE shift pass into the slab scratch,
        # then pure VALUE accumulation — scratch read-modify-write per step
        # measured ~15x slower than value chains (.bench/mosaic_probe.py);
        # 4 independent partial sums avoid one serial FMA dependency chain.
        parts = [None] * 4
        for dx in range(k):
            s_ref[:sh + 2 * r] = a_ref[
                pl.ds(s0 + rmax - r, sh + 2 * r),
                dx - r + CP:dx - r + CP + W].astype(s_ref.dtype)
            for dy in range(k):
                wv = w_ref[dy, dx:dx + 1, :][None].astype(at)
                p = s_ref[pl.ds(dy, sh)] * wv
                i = (dx * k + dy) % 4
                parts[i] = p if parts[i] is None else parts[i] + p
        parts = [q for q in parts if q is not None]
        while len(parts) > 1:
            parts = [a + b for a, b in zip(parts[::2], parts[1::2])] + (
                [parts[-1]] if len(parts) % 2 else [])
        prev = a_ref[pl.ds(s0 + rmax, sh), CP:CP + W].astype(jnp.float32)
        out_ref[0, pl.ds(s0, sh)] = _gelu_f32(
            prev + parts[0].astype(jnp.float32) + bv,
            _erf=_erf_f32).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("ks", "interpret"))
def _dw_chain_fwd(x, weights, biases, ks, interpret=False):
    b, h, w, c = x.shape
    assert c % 128 == 0, c
    assert all(k == 1 for k in ks[:-1]), ks
    rmax = ks[-1] // 2
    wp = CP + w + rmax
    wp += (-wp) % 8
    hp = h + 2 * rmax
    strip = min(STRIP, h)

    biases = tuple(bb.reshape(1, c) for bb in biases)
    grid = (b, c // 128)
    kern = functools.partial(_kernel, ks=ks, H=h, W=w, Wp=wp, rmax=rmax,
                             strip=strip)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((b, h, w, c), x.dtype),
        grid=grid,
        in_specs=[pl.BlockSpec((1, h, w, 128), lambda bi, ci: (bi, 0, 0, ci))]
        + [pl.BlockSpec((k, k, 128), lambda bi, ci: (0, 0, ci))
           for k in ks]
        + [pl.BlockSpec((1, 128), lambda bi, ci: (0, ci)) for _ in ks],
        out_specs=pl.BlockSpec((1, h, w, 128), lambda bi, ci: (bi, 0, 0, ci)),
        scratch_shapes=[
            pltpu.VMEM((hp, wp, 128), x.dtype),
            # slab in f32: the per-tap mul then needs no bf16->f32 convert
            # pass (the shift write converts once per dx)
            pltpu.VMEM((strip + 2 * rmax, w, 128), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=100 * 2 ** 20,
        ),
        interpret=interpret,
    )(x, *weights, *biases)


def vmem_estimate(h, w, ks, dtype_bytes=2):
    """Rough per-cell VMEM need (bytes) for the gating decision."""
    rmax = ks[-1] // 2
    wp = CP + w + rmax
    wp += (-wp) % 8
    strip = min(STRIP, h)
    return 128 * (
        (h + 2 * rmax) * wp * dtype_bytes       # A (io dtype)
        + (strip + 2 * rmax) * w * 4            # S slab scratch is always f32
        + 4 * strip * w * 4                     # per-strip f32 partial sums
        + strip * w * 4                         # acc
        + 2 * h * w * dtype_bytes * 2           # in/out blocks (dbl-buffered)
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def dw_chain(x, weights, biases, ks):
    """Fused gelu-residual depthwise chain. weights: tuple of (k,k,C);
    biases: tuple of (C,); ks: static tuple of kernel sizes."""
    return _dw_chain_fwd(x, weights, biases, ks)


def _fwd(x, weights, biases, ks):
    return dw_chain(x, weights, biases, ks), (x, weights, biases)


def _bwd(ks, res, g):
    x, weights, biases = res

    def f(x_, ws, bs):
        return chain_xla(x_, tuple(zip(ws, bs)))

    _, vjp = jax.vjp(f, x, weights, biases)
    return vjp(g)


dw_chain.defvjp(_fwd, _bwd)
