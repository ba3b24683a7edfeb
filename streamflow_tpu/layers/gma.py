"""GMA global motion aggregation (reference core/gma.py:34-137).

- ``GMAAttention``: 1x1-conv q/k projection + full softmax attention map over
  the H*W tokens of the context features; computed once per forward pass.
- ``GMAAggregate``: 1x1-conv value projection, attention-weighted aggregation
  of motion features, zero-init gamma-gated residual.
- ``TemporalAggregate``: the temporal-attention variant (core/gma.py:107-137).

Two execution modes:
- "full": materialize the (N, N) attention map — exact reference semantics,
  reused across refinement iterations.
- "flash": keep only q, k and fuse softmax(q k^T) v per iteration with a
  blocked (flash) attention — the reference's flash-attn path
  (demo.py:240-254); O(N) memory for 1080p inputs. On TPU this dispatches to
  the Pallas kernel in ops/pallas/attention.py.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from streamflow_tpu.layers.common import conv2d


class GMAAttention(nn.Module):
    """Returns either the materialized attention map (mode='full') or the
    (q, k) tensors (mode='flash')."""

    heads: int = 1
    dim_head: int = 128
    mode: str = "full"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, fmap):
        b, h, w, c = fmap.shape
        inner = self.heads * self.dim_head
        qk = conv2d(inner * 2, 1, use_bias=False, dtype=self.dtype, name="to_qk")(fmap)
        q, k = jnp.split(qk, 2, axis=-1)
        # (B, heads, N, dim_head)
        q = q.reshape(b, h * w, self.heads, self.dim_head).transpose(0, 2, 1, 3)
        k = k.reshape(b, h * w, self.heads, self.dim_head).transpose(0, 2, 1, 3)
        scale = self.dim_head ** -0.5
        q = q * scale
        if self.mode == "flash":
            return q, k
        sim = jnp.einsum(
            "bhnd,bhmd->bhnm", q, k,
            preferred_element_type=jnp.float32,
        )
        attn = jax.nn.softmax(sim, axis=-1)
        # Under mixed precision the reused (N, N) map is stored bf16: halves
        # the 600MB/iteration HBM traffic of the aggregate matmul at 440x1024
        # (logits + softmax stay fp32).
        if self.dtype is not None:
            attn = attn.astype(self.dtype)
        return attn


class GMAAggregate(nn.Module):
    """out = fmap + gamma * project(attn @ v(fmap)); gamma zero-init
    (core/gma.py:68-104)."""

    heads: int = 1
    dim_head: int = 128
    mode: str = "full"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, attn, fmap):
        b, h, w, c = fmap.shape
        inner = self.heads * self.dim_head
        v = conv2d(inner, 1, use_bias=False, dtype=self.dtype, name="to_v")(fmap)
        v = v.reshape(b, h * w, self.heads, self.dim_head).transpose(0, 2, 1, 3)

        if self.mode == "flash":
            from streamflow_tpu.ops.pallas.attention import flash_attention

            q, k = attn
            out = flash_attention(q, k, v, scaled=True)
        else:
            out = jnp.einsum(
                "bhnm,bhmd->bhnd", attn, v.astype(attn.dtype),
                preferred_element_type=jnp.float32,
            )
        out = out.transpose(0, 2, 1, 3).reshape(b, h, w, inner).astype(fmap.dtype)

        if inner != c:
            out = conv2d(c, 1, use_bias=False, dtype=self.dtype, name="project")(out)

        gamma = self.param("gamma", nn.initializers.zeros, (1,), jnp.float32)
        return fmap + gamma.astype(fmap.dtype) * out


class TemporalAttentionMap(nn.Module):
    """Cross-frame attention map: q/k projected from the channel-concat of
    all T-1 frames, softmax over the joint spatial grid (reference
    TemporalAttention, core/gma.py:195-212).

    x: (B, F, H, W, C) -> (B, 1, H*W, H*W) fp32 attention.
    """

    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        b, f, h, w, c = x.shape
        joint = x.transpose(0, 2, 3, 1, 4).reshape(b, h, w, f * c)
        qk = conv2d(2 * f * c, 1, use_bias=False, dtype=self.dtype,
                    name="to_qk")(joint)
        q, k = jnp.split(qk, 2, axis=-1)
        q = q * ((f * c) ** -0.5)
        sim = jnp.einsum(
            "bxyc,buvc->bxyuv", q.astype(jnp.float32), k.astype(jnp.float32),
            preferred_element_type=jnp.float32,
        ).reshape(b, h * w, h * w)
        return jax.nn.softmax(sim, axis=-1)[:, None]


class TemporalAggregate(nn.Module):
    """Temporal-attention aggregate (core/gma.py:107-137): like GMAAggregate
    but with an unconditional projection and its own zero-init gamma."""

    heads: int = 1
    dim_head: int = 128
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, temporal_attn, fmap):
        b, h, w, c = fmap.shape
        inner = self.heads * self.dim_head
        v = conv2d(inner, 1, use_bias=False, dtype=self.dtype, name="to_v")(fmap)
        v = v.reshape(b, h * w, self.heads, self.dim_head).transpose(0, 2, 1, 3)
        out = jnp.einsum("bhnm,bhmd->bhnd", temporal_attn, v.astype(temporal_attn.dtype))
        out = out.transpose(0, 2, 1, 3).reshape(b, h, w, inner).astype(fmap.dtype)
        out = conv2d(c, 1, use_bias=False, dtype=self.dtype, name="temporal_project")(out)
        gamma = self.param("temporal_gamma", nn.initializers.zeros, (1,), jnp.float32)
        return fmap + gamma.astype(fmap.dtype) * out
