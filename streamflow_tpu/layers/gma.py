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


class SpatioTemporalAggregate(nn.Module):
    """Spatial GMA aggregation + temporal re-aggregation of the result, each
    behind its own zero-init gamma (reference SpatioTemporalAggregate,
    core/gma.py:140-191). Identity at init.

    ``temporal_attn=None`` skips the temporal half (reference guards the
    same way); ``temporal_project=False`` mirrors args.no_temporal_project.
    """

    heads: int = 1
    dim_head: int = 128
    temporal_project: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, attn, temporal_attn, fmap):
        b, h, w, c = fmap.shape
        inner = self.heads * self.dim_head
        v = conv2d(inner, 1, use_bias=False, dtype=self.dtype, name="to_v")(fmap)
        v = v.reshape(b, h * w, self.heads, self.dim_head).transpose(0, 2, 1, 3)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, v.astype(attn.dtype),
                         preferred_element_type=jnp.float32)
        out = out.transpose(0, 2, 1, 3).reshape(b, h, w, inner).astype(fmap.dtype)
        if inner != c:
            out = conv2d(c, 1, use_bias=False, dtype=self.dtype,
                         name="project")(out)
        gamma = self.param("gamma", nn.initializers.zeros, (1,), jnp.float32)
        out = fmap + gamma.astype(fmap.dtype) * out

        if temporal_attn is not None:
            t = out.reshape(b, h * w, self.heads,
                            out.shape[-1] // self.heads).transpose(0, 2, 1, 3)
            t = jnp.einsum("bhnm,bhmd->bhnd", temporal_attn,
                           t.astype(temporal_attn.dtype),
                           preferred_element_type=jnp.float32)
            t = t.transpose(0, 2, 1, 3).reshape(b, h, w, -1).astype(out.dtype)
            if self.temporal_project:
                t = conv2d(c, 1, use_bias=False, dtype=self.dtype,
                           name="temporal_project")(t)
            tg = self.param("temporal_gamma", nn.initializers.zeros, (1,),
                            jnp.float32)
            out = out + tg.astype(out.dtype) * t
        return out


class SpatioTemporalAggregate2(nn.Module):
    """Joint-grid variant (reference SpatioTemporalAggregate2,
    core/gma.py:214-256): the T-1 frames are unfolded into one (H, T*W)
    token grid before the spatial aggregation, so ``attn`` spans all frames
    jointly. fmap: (B*F, H, W, C) with F static."""

    num_frames: int
    heads: int = 1
    dim_head: int = 128
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, attn, fmap):
        bf, h, w, c = fmap.shape
        f = self.num_frames
        b = bf // f
        inner = self.heads * self.dim_head
        v = conv2d(inner, 1, use_bias=False, dtype=self.dtype, name="to_v")(fmap)
        # (B*F, H, W, C) -> (B, H, F*W, C): frames side by side along width
        v = v.reshape(b, f, h, w, inner).transpose(0, 2, 1, 3, 4)
        v = v.reshape(b, h, f * w, inner)
        v = v.reshape(b, h * f * w, self.heads,
                      self.dim_head).transpose(0, 2, 1, 3)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, v.astype(attn.dtype),
                         preferred_element_type=jnp.float32)
        out = out.transpose(0, 2, 1, 3).reshape(b, h, f * w, inner)
        out = out.reshape(b, h, f, w, inner).transpose(0, 2, 1, 3, 4)
        out = out.reshape(bf, h, w, inner).astype(fmap.dtype)
        if inner != c:
            out = conv2d(c, 1, use_bias=False, dtype=self.dtype,
                         name="project")(out)
        gamma = self.param("gamma", nn.initializers.zeros, (1,), jnp.float32)
        return fmap + gamma.astype(fmap.dtype) * out


class TMMAggregate(nn.Module):
    """Temporal-motion-module aggregate (reference TMMAggregate,
    core/gma.py:261-300): spatial aggregation per frame, then a temporal
    aggregation over the channel-concat of all F frames, both zero-init
    gamma gated. fmap: (B*F, H, W, C)."""

    num_frames: int
    heads: int = 1
    dim_head: int = 128
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, attn, temporal_attn, fmap):
        bf, h, w, c = fmap.shape
        f = self.num_frames
        b = bf // f
        inner = self.heads * self.dim_head
        v = conv2d(inner, 1, use_bias=False, dtype=self.dtype, name="to_v")(fmap)
        v = v.reshape(bf, h * w, self.heads, self.dim_head).transpose(0, 2, 1, 3)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, v.astype(attn.dtype),
                         preferred_element_type=jnp.float32)
        out = out.transpose(0, 2, 1, 3).reshape(bf, h, w, inner).astype(fmap.dtype)
        gamma = self.param("gamma", nn.initializers.zeros, (1,), jnp.float32)
        out = fmap + gamma.astype(fmap.dtype) * out

        # temporal: channel-concat of the F frames as one token grid
        joint = out.reshape(b, f, h, w, c).transpose(0, 2, 3, 1, 4)
        joint = joint.reshape(b, h * w, f * c)
        per_head = (f * c) // self.heads
        t = joint.reshape(b, h * w, self.heads, per_head).transpose(0, 2, 1, 3)
        t = jnp.einsum("bhnm,bhmd->bhnd", temporal_attn,
                       t.astype(temporal_attn.dtype),
                       preferred_element_type=jnp.float32)
        t = t.transpose(0, 2, 1, 3).reshape(b, h * w, f * c).astype(out.dtype)
        tg = self.param("temporal_gamma", nn.initializers.zeros, (1,),
                        jnp.float32)
        joint = joint + tg.astype(joint.dtype) * t
        joint = joint.reshape(b, h, w, f, c).transpose(0, 3, 1, 2, 4)
        return joint.reshape(bf, h, w, c)
