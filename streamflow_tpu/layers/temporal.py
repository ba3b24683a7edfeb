"""Temporal Attention Module (reference core/update.py:453-513).

A zero-initialized ViT block applied along the T axis, treating each pixel's
T-frame trajectory as a length-T token sequence. ``zero_module`` in the
reference zeroes *every* parameter of the block (including LayerNorm scales),
so the module is an exact identity at initialization; gradients flow because
the residual adds see nonzero upstream signal.

TPU note: T is 3 for the canonical T=4 model, so the attention is a tiny
(T x T) matmul batched over B*H*W pixels — pure VPU/MXU batch work, no
flash kernel needed. We keep the tokens in (B*H*W, T, C) layout only
logically; physically the einsums below run on (B, H, W, T, C) to avoid
reshuffling HBM.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from streamflow_tpu.layers.common import Mlp, gelu  # noqa: F401 (gelu used by Mlp)


def _zeros(key, shape, dtype=jnp.float32):
    return jnp.zeros(shape, dtype)


class TinyAttention(nn.Module):
    """timm-style self-attention (qkv no bias, out-proj with bias), operating
    on (..., T, C). ``zero_init=True`` zeroes every parameter (the reference's
    zero_module gating trick); ``zero_init=False`` gives the standard init
    (used where a zero-init temporal_fc after it does the gating, e.g.
    Res18_3D, core/extractor.py:242-245)."""

    dim: int
    num_heads: int = 1
    zero_init: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        d = self.dim
        hd = d // self.num_heads
        w_init = _zeros if self.zero_init else nn.initializers.lecun_normal()
        qkv_w = self.param("qkv_kernel", w_init, (d, 3 * d))
        proj_w = self.param("proj_kernel", w_init, (d, d))
        proj_b = self.param("proj_bias", _zeros, (d,))
        dt = x.dtype
        qkv = x @ qkv_w.astype(dt)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads(t):
            return t.reshape(*t.shape[:-1], self.num_heads, hd)

        q, k, v = heads(q), heads(k), heads(v)
        scale = hd ** -0.5
        attn = jnp.einsum("...qhd,...khd->...hqk", q * scale, k)
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(dt)
        out = jnp.einsum("...hqk,...khd->...qhd", attn, v)
        out = out.reshape(x.shape)
        return out @ proj_w.astype(dt) + proj_b.astype(dt)


class ZeroMlp(nn.Module):
    """Zero-initialized 2-layer MLP (timm Mlp with GELU). ``zero_init=False``
    gives timm's standard init (lecun-normal kernels, zero biases) for the
    un-gated TemporalLayer_noinit variant (reference core/update.py:516-527)."""

    dim: int
    hidden: int
    zero_init: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        w_init = _zeros if self.zero_init else nn.initializers.lecun_normal()
        w1 = self.param("fc1_kernel", w_init, (self.dim, self.hidden))
        b1 = self.param("fc1_bias", _zeros, (self.hidden,))
        w2 = self.param("fc2_kernel", w_init, (self.hidden, self.dim))
        b2 = self.param("fc2_bias", _zeros, (self.dim,))
        dt = x.dtype
        x = gelu(x @ w1.astype(dt) + b1.astype(dt))
        return x @ w2.astype(dt) + b2.astype(dt)


class ZeroLayerNorm(nn.Module):
    """LayerNorm whose scale AND bias start at zero (an artifact of the
    reference's zero_module blanket-zeroing; preserved for checkpoint
    compatibility). ``zero_init=False`` restores the standard ones-scale."""

    epsilon: float = 1e-5
    zero_init: bool = True

    @nn.compact
    def __call__(self, x):
        s_init = _zeros if self.zero_init else nn.initializers.ones
        scale = self.param("scale", s_init, (x.shape[-1],))
        bias = self.param("bias", _zeros, (x.shape[-1],))
        mean = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.var(x, axis=-1, keepdims=True)
        y = (x - mean) * jax.lax.rsqrt(var + self.epsilon)
        return y * scale.astype(x.dtype) + bias.astype(x.dtype)


class TransformerBlock(nn.Module):
    """Pre-norm ViT block, fully zero-init (reference TransformerBlock wrapped
    in zero_module, core/update.py:459-484 + :453-457). mlp_ratio=2.
    ``zero_init=False`` is the bare (standard-init) block used by
    TemporalLayer_noinit (core/update.py:516-527)."""

    dim: int
    num_heads: int = 1
    mlp_ratio: int = 2
    zero_init: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        z = self.zero_init
        x = x + TinyAttention(self.dim, self.num_heads, zero_init=z,
                              dtype=self.dtype, name="attn")(
            ZeroLayerNorm(zero_init=z, name="norm1")(x)
        )
        x = x + ZeroMlp(self.dim, self.dim * self.mlp_ratio, zero_init=z,
                        dtype=self.dtype, name="mlp")(
            ZeroLayerNorm(zero_init=z, name="norm2")(x)
        )
        return x


class TemporalLayer(nn.Module):
    """Apply the zero-init transformer along T (reference TemporalLayer2,
    core/update.py:502-513); ``zero_init=False`` is TemporalLayer_noinit
    (core/update.py:516-527), identical graph with live (standard) init.

    Input/output: (B, T, H, W, C) — each (b, h, w) pixel is a T-token sequence.
    """

    dim: int
    zero_init: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        b, t, h, w, c = x.shape
        tokens = x.transpose(0, 2, 3, 1, 4)  # (B, H, W, T, C)
        tokens = TransformerBlock(self.dim, zero_init=self.zero_init,
                                  dtype=self.dtype, name="block")(tokens)
        return tokens.transpose(0, 3, 1, 2, 4)
