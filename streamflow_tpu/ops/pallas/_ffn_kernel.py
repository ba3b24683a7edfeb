"""Fused FFN pair as a Pallas TPU kernel (MXU matmul chain, VMEM-resident).

Computes the SKBlock FFN patterns (reference PCBlock4_Deep_nopool_res,
core/update.py:12-36) in one pass over the token axis:

    residual=True :  y = gelu(x + gelu(x @ W1 + b1) @ W2 + b2)
    residual=False:  y =         gelu(x @ W1 + b1) @ W2 + b2

The hidden activation (1.5x wide) and the residual re-read never touch HBM:
traffic is one read of x and one write of y, vs five array passes for the
XLA composite. Both matmuls are MXU-shaped ((block_n, C) @ (C, Ch)); weights
are VMEM-resident across the whole grid.

Used on the corr_impl='pallas' path, whose scan body must stay free of
convolution HLOs anyway (see _dw_conv_kernel.py for the disease notes);
gated by layers/sk.py. fp32 accumulation via preferred_element_type.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from streamflow_tpu.ops.pallas._dw_conv_kernel import _erf_f32


def _gelu(x):
    return x * 0.5 * (1.0 + _erf_f32(x * (1.0 / math.sqrt(2.0))))


def ffn_pair_xla(x, w1, b1, w2, b2, residual=True, wp=None, bp=None):
    """Reference XLA composite (exact math of the kernel)."""
    dt = x.dtype
    if wp is not None:
        p = jax.lax.dot_general(
            x, wp.astype(dt), (((x.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        x = _gelu(x.astype(jnp.float32) + p
                  + bp.astype(jnp.float32)).astype(dt)
    h = jax.lax.dot_general(x, w1.astype(dt), (((x.ndim - 1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    h = _gelu(h + b1.astype(jnp.float32)).astype(dt)
    y = jax.lax.dot_general(h, w2.astype(dt), (((h.ndim - 1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    y = y + b2.astype(jnp.float32)
    if residual:
        y = _gelu(x.astype(jnp.float32) + y)
    return y.astype(dt)


def _pair_tail(x, w1_ref, b1_ref, w2_ref, b2_ref, o_ref, residual):
    """Shared FFN-pair math: o = [gelu(x +)] gelu(x@W1+b1)@W2+b2."""
    dt = x.dtype
    h = jax.lax.dot_general(
        x, w1_ref[...].astype(dt), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    h = _gelu(h + b1_ref[...].astype(jnp.float32)).astype(dt)
    y = jax.lax.dot_general(
        h, w2_ref[...].astype(dt), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    y = y + b2_ref[...].astype(jnp.float32)
    if residual:
        y = _gelu(x.astype(jnp.float32) + y)
    o_ref[...] = y.astype(o_ref.dtype)


def _kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref, *, residual):
    _pair_tail(x_ref[...], w1_ref, b1_ref, w2_ref, b2_ref, o_ref, residual)


def _kernel_pw(x_ref, wp_ref, bp_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref,
               *, residual):
    """Pointwise-residual pre-stage fused ahead of the FFN pair:
    x' = gelu(x + x @ Wp + bp), then the pair on x'. Saves the HBM round
    trip of x' between the SK block's pw conv and its second FFN."""
    x = x_ref[...]
    dt = x.dtype
    p = jax.lax.dot_general(
        x, wp_ref[...].astype(dt), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    x = _gelu(x.astype(jnp.float32) + p
              + bp_ref[...].astype(jnp.float32)).astype(dt)
    _pair_tail(x, w1_ref, b1_ref, w2_ref, b2_ref, o_ref, residual)


@functools.partial(jax.jit,
                   static_argnames=("residual", "block_n", "interpret"))
def _ffn_pair_fwd(x, w1, b1, w2, b2, wp=None, bp=None, residual=True,
                  block_n: int = 1024, interpret: bool = False):
    """x: (..., C); w1 (C, Ch); w2 (Ch, Co); optional pw pre-stage wp (C, C).
    residual requires Co == C."""
    orig_shape = x.shape
    c = x.shape[-1]
    ch = w1.shape[1]
    co = w2.shape[1]
    assert not residual or co == c
    n = math.prod(orig_shape[:-1])
    x2 = x.reshape(n, c)
    pad = (-n) % block_n
    if pad:
        x2 = jnp.pad(x2, ((0, pad), (0, 0)))
    nt = n + pad

    if wp is None:
        kern = functools.partial(_kernel, residual=residual)
        extra = []
        extra_specs = []
    else:
        kern = functools.partial(_kernel_pw, residual=residual)
        extra = [wp, bp.reshape(1, c)]
        extra_specs = [
            pl.BlockSpec((c, c), lambda i: (0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
        ]

    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((nt, co), x.dtype),
        grid=(nt // block_n,),
        in_specs=[pl.BlockSpec((block_n, c), lambda i: (i, 0))]
        + extra_specs
        + [
            pl.BlockSpec((c, ch), lambda i: (0, 0)),
            pl.BlockSpec((1, ch), lambda i: (0, 0)),
            pl.BlockSpec((ch, co), lambda i: (0, 0)),
            pl.BlockSpec((1, co), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((block_n, co), lambda i: (i, 0)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=100 * 2 ** 20,
        ),
        interpret=interpret,
    )(x2, *extra, w1, b1.reshape(1, ch), w2, b2.reshape(1, co))
    return out[:n].reshape(*orig_shape[:-1], co)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def ffn_pair(x, w1, b1, w2, b2, residual=True):
    """Fused FFN pair; backward recomputes through the XLA composite."""
    return _ffn_pair_fwd(x, w1, b1, w2, b2, residual=residual)


def _fwd(x, w1, b1, w2, b2, residual):
    return ffn_pair(x, w1, b1, w2, b2, residual), (x, w1, b1, w2, b2)


def _bwd(residual, res, g):
    x, w1, b1, w2, b2 = res
    _, vjp = jax.vjp(
        lambda *a: ffn_pair_xla(*a, residual=residual), x, w1, b1, w2, b2)
    return vjp(g)


ffn_pair.defvjp(_fwd, _bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7,))
def pw_ffn_pair(x, wp, bp, w1, b1, w2, b2, residual=True):
    """gelu(x + x@Wp + bp) pointwise-residual stage fused ahead of the FFN
    pair (the SK block's pw conv + second FFN in one kernel); backward
    recomputes through the XLA composite."""
    return _ffn_pair_fwd(x, w1, b1, w2, b2, wp=wp, bp=bp, residual=residual)


def _pw_fwd(x, wp, bp, w1, b1, w2, b2, residual):
    return (pw_ffn_pair(x, wp, bp, w1, b1, w2, b2, residual),
            (x, wp, bp, w1, b1, w2, b2))


def _pw_bwd(residual, res, g):
    x, wp, bp, w1, b1, w2, b2 = res
    _, vjp = jax.vjp(
        lambda xx, pp, pb, *a: ffn_pair_xla(
            xx, *a, residual=residual, wp=pp, bp=pb),
        x, wp, bp, w1, b1, w2, b2)
    return vjp(g)


pw_ffn_pair.defvjp(_pw_fwd, _pw_bwd)
