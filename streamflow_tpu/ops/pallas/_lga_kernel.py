"""Fused locally-grouped (windowed) attention as a Pallas TPU kernel.

Twins-SVT's LocallyGroupedAttn (reference: timm twins, used by
core/encoders/twins_csc.py via timm.create_model) partitions the token grid
into non-overlapping ws x ws windows and runs MHA within each window. The
XLA composite (layers/twins.py::LocallyGroupedAttn) spells that as a pair of
6-D reshape/transposes around the qkv/proj matmuls — at stage-1 scale
(440x256 tokens at 440x1024 input) those relayouts plus the un-fused
softmax cost several ms of fixed encoder time per clip.

This kernel processes one ws-tall row of windows per grid cell, entirely in
VMEM: window partition (in-register transposes), qkv projection, per-window
per-head softmax attention, head merge, and the output projection — one HBM
read of x, one write of out. Math matches the composite exactly: qkv and
proj matmuls in io dtype (f32 MXU accumulation), logits/softmax in f32,
q pre-scaled by hd^-0.5, and zero-padded edge tokens contributing
bias-valued keys/values exactly as the composite's pad-then-Dense does.

Shapes: x (B, H, W, C) already padded to window multiples; weights
wqkv (C, 3C), bqkv (3C,), wproj (C, C), bproj (C,).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, wqkv_ref, bqkv_ref, wproj_ref, bproj_ref, o_ref, *,
            ws: int, nh: int):
    xt = x_ref[0]                     # (ws, Wp, C)
    dt = xt.dtype
    wp, c = xt.shape[1], xt.shape[2]
    gw = wp // ws
    hd = c // nh
    s = ws * ws

    # window partition: (ws, gw, ws, C) -> (gw, ws*ws, C) token-major
    xw = xt.reshape(ws, gw, ws, c).transpose(1, 0, 2, 3).reshape(gw * s, c)

    qkv = jax.lax.dot_general(
        xw, wqkv_ref[...].astype(dt), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dt) + bqkv_ref[0].astype(dt)
    qkv = qkv.reshape(gw, s, 3, nh, hd)

    def heads(i):
        # (gw, s, nh, hd) -> (gw*nh, s, hd)
        t = qkv[:, :, i].transpose(0, 2, 1, 3)
        return t.reshape(gw * nh, s, hd)

    q = heads(0) * jnp.asarray(hd ** -0.5, dt)
    k = heads(1)
    v = heads(2)

    logits = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)        # (gw*nh, s, s)
    attn = jax.nn.softmax(logits, axis=-1).astype(dt)
    out = jax.lax.dot_general(
        attn, v, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32).astype(dt)  # (gw*nh, s, hd)

    out = out.reshape(gw, nh, s, hd).transpose(0, 2, 1, 3).reshape(gw * s, c)
    out = jax.lax.dot_general(
        out, wproj_ref[...].astype(dt), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dt) + bproj_ref[0].astype(dt)

    # back to grid layout: (gw, ws, ws, C) -> (ws, Wp, C)
    o_ref[0] = out.reshape(gw, ws, ws, c).transpose(1, 0, 2, 3).reshape(
        ws, wp, c)


@functools.partial(jax.jit, static_argnames=("ws", "nh", "interpret"))
def lga_attention(x, wqkv, bqkv, wproj, bproj, *, ws: int, nh: int,
                  interpret: bool = False):
    """x: (B, Hp, Wp, C) with Hp, Wp multiples of ws. Returns (B, Hp, Wp, C).
    Gradients recompute through the XLA composite (see layers/twins.py)."""
    b, hp, wp, c = x.shape
    assert hp % ws == 0 and wp % ws == 0
    gh = hp // ws

    return pl.pallas_call(
        functools.partial(_kernel, ws=ws, nh=nh),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        grid=(b, gh),
        in_specs=[
            pl.BlockSpec((1, ws, wp, c), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((c, 3 * c), lambda i, j: (0, 0)),
            # biases as (1, C) rows — Mosaic's preferred layout for
            # broadcast operands (matches _ffn_kernel / _dw_conv_kernel)
            pl.BlockSpec((1, 3 * c), lambda i, j: (0, 0)),
            pl.BlockSpec((c, c), lambda i, j: (0, 0)),
            pl.BlockSpec((1, c), lambda i, j: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, ws, wp, c), lambda i, j: (i, j, 0, 0)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=100 * 2 ** 20,
        ),
        interpret=interpret,
    )(x, wqkv, bqkv.reshape(1, 3 * c), wproj, bproj.reshape(1, c))
