"""Fused locally-grouped (windowed) attention — head-major Pallas TPU kernel.

Twins-SVT's LocallyGroupedAttn (reference: timm twins, used by
core/encoders/twins_csc.py via timm.create_model) partitions the token grid
into non-overlapping ws x ws windows and runs MHA within each window. The
XLA composite (layers/twins.py::lga_xla) spells that as a pair of 6-D
reshape/transposes around the qkv/proj matmuls plus an un-fused softmax —
several ms of fixed encoder cost per clip at stage-1 scale.

v1 history (r3s4): a whole-block kernel (qkv matmul + per-head attention +
proj in one pass) passed interpret mode but was REJECTED by the real Mosaic
toolchain — the 5-D head-split reshape (.., 3, nh, hd) splits the 128-lane
dimension below one lane tile ("infer-vector-layout: unsupported shape
cast", hd=32). This v2 is head-major and never reshapes the lane dim:

- The qkv and proj Dense matmuls STAY IN XLA (they are MXU-shaped and fuse
  with the surrounding LayerNorms); the kernel consumes the already-
  projected qkv grid (B, Hp, Wp, 3C) and emits the pre-proj attention
  output (B, Hp, Wp, C). One grid cell = one ws-tall row of windows.
- Per-head q/k/v extraction is a LANE MASK (iota compare on lane//hd), not
  a reshape. Keys/values of head h are zero-masked copies padded to a
  128-row block; stacking the nh blocks gives K_big/V_big
  (gw, nh*128, C), so
    logits = q . K_big^T   (one batched MXU matmul, all heads at once)
  puts head h's scores in lane tile h of (gw, s, nh*128) — per-head
  softmax is then a STATIC TILE SLICE [h*128:(h+1)*128], never a sub-tile
  shape cast. Padded key rows produce logit 0; an additive -1e30 lane bias
  removes them from the softmax exactly (their exp underflows to 0, the
  max over valid lanes is unaffected).
- out = sum_h softmax_h . V_h accumulates disjoint lane sets (V masked), so
  the sum is an exact lane-concat.

The masked-matmul trick pays nh * (128/s) extra MXU flops (~10-20x) on
attention matmuls that are a tiny fraction of the model's FLOPs (~34 GFLOP
per stage-1 call at 440x1024 T=4 vs the encoder's TFLOPs) to keep the whole
window pipeline in VMEM and the lane layout tile-legal end to end.

Numerics match lga_xla bit-for-bit on TPU: q scaled in io dtype, logits
f32, softmax f32 (same max/exp/normalize), PV product f32-accumulated and
rounded to io dtype.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(qkv_ref, o_ref, *, ws: int, nh: int, c: int):
    xt = qkv_ref[0]                   # (ws, Wp, 3C)
    dt = xt.dtype
    wp = xt.shape[1]
    gw = wp // ws
    hd = c // nh
    s = ws * ws

    # window partition: (ws, gw, ws, 3C) -> (gw, ws, ws, 3C) -> (gw, s, 3C)
    xw = xt.reshape(ws, gw, ws, 3 * c).transpose(1, 0, 2, 3)
    xw = xw.reshape(gw, s, 3 * c)

    q = xw[:, :, :c] * jnp.asarray(hd ** -0.5, dt)
    k = xw[:, :, c:2 * c]
    v = xw[:, :, 2 * c:]

    head_of = jax.lax.broadcasted_iota(jnp.int32, (1, 1, c), 2) // hd

    def head_block(src, h):
        # zero-mask head h's lanes, pad the token rows s -> 128
        m = jnp.where(head_of == h, src, jnp.zeros((), dt))
        return jnp.pad(m, ((0, 0), (0, 128 - s), (0, 0)))

    k_big = jnp.concatenate([head_block(k, h) for h in range(nh)], axis=1)

    logits = jax.lax.dot_general(
        q, k_big, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)        # (gw, s, nh*128)

    # padded key rows -> logit 0; push them to -inf so softmax ignores them
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, nh * 128), 2)
    logits = jnp.where(lane % 128 < s, logits, -1e30)

    out = jnp.zeros((gw, s, c), dt)
    for h in range(nh):
        lg = logits[:, :, h * 128:(h + 1) * 128]   # static tile slice
        mx = jnp.max(lg, axis=-1, keepdims=True)
        e = jnp.exp(lg - mx)
        attn = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(dt)
        vh = head_block(v, h)                      # (gw, 128, C)
        out = out + jax.lax.dot_general(
            attn, vh, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32).astype(dt)

    # inverse partition: (gw, ws, ws, C) -> (ws, gw, ws, C) -> (ws, Wp, C)
    o_ref[0] = out.reshape(gw, ws, ws, c).transpose(1, 0, 2, 3).reshape(
        ws, wp, c)


@functools.partial(jax.jit, static_argnames=("ws", "nh", "interpret"))
def lga_attention(qkv, *, ws: int, nh: int, interpret: bool = False):
    """Windowed per-head attention on an already-projected qkv grid.

    qkv: (B, Hp, Wp, 3C) with Hp, Wp multiples of ws; returns the pre-proj
    attention output (B, Hp, Wp, C). Gradients recompute through the XLA
    composite (see layers/twins.py)."""
    b, hp, wp, c3 = qkv.shape
    c = c3 // 3
    assert hp % ws == 0 and wp % ws == 0
    assert ws * ws <= 128, "window token count exceeds one lane tile"
    assert c % nh == 0
    gh = hp // ws

    return pl.pallas_call(
        functools.partial(_kernel, ws=ws, nh=nh, c=c),
        out_shape=jax.ShapeDtypeStruct((b, hp, wp, c), qkv.dtype),
        grid=(b, gh),
        in_specs=[
            pl.BlockSpec((1, ws, wp, 3 * c), lambda i, j: (i, j, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, ws, wp, c), lambda i, j: (i, j, 0, 0)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=100 * 2 ** 20,
        ),
        interpret=interpret,
    )(qkv)
