"""UMT video ViT encoder (reference core/encoders/umt.py:209-368): the first
4 blocks of a VideoMAE/UMT-style ViT-B/16 with joint space-time attention
over all T*h*w tokens (tubelet size 1), model ratio 16.

The reference hard-loads `b16_ptk710_ftk710_ftk700_f8_res224.pth`
(core/encoders/umt.py:285-292); here weights come through the generic
converter path. Experimental encoder (reference uses it only in ablations);
selecting it implies cfg.ratio == 16 and a 768-channel feature space.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from streamflow_tpu.layers.common import Mlp, conv2d


class _ViTBlock(nn.Module):
    dim: int = 768
    num_heads: int = 12
    mlp_ratio: int = 4
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        b, n, c = x.shape
        nh = self.num_heads
        hd = c // nh
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(x)
        # qkv carries a bias like the reference's qkv_bias=True path
        # (core/encoders/umt.py:69-85: learned q_bias/v_bias, k bias pinned
        # to zero — a softmax no-op; here one zero-init (3C,) vector, with the
        # converter assembling [q_bias, 0, v_bias] from VideoMAE checkpoints)
        qkv = nn.Dense(3 * c, dtype=self.dtype, name="qkv")(y)
        q, k, v = jnp.split(qkv.reshape(b, n, 3, nh, hd).transpose(2, 0, 3, 1, 4),
                            3, axis=0)
        q, k, v = q[0], k[0], v[0]
        from streamflow_tpu.ops.pallas.attention import flash_attention

        out = flash_attention(q, k, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, n, c)
        x = x + nn.Dense(c, dtype=self.dtype, name="proj")(out)
        norm2 = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")
        x = x + Mlp(c * self.mlp_ratio, c, dtype=self.dtype,
                    name="mlp")(norm2(x))
        return x


class UMT(nn.Module):
    """(B, T, H, W, 3) -> (B, T, H/16, W/16, 768)."""

    depth: int = 4
    dim: int = 768
    num_heads: int = 12
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        b, t, h, w, c = x.shape
        y = conv2d(self.dim, 16, stride=16, padding="VALID", dtype=self.dtype,
                   name="patch_embed")(x.reshape(b * t, h, w, c))
        hp, wp = y.shape[1], y.shape[2]
        tokens = y.reshape(b, t * hp * wp, self.dim)
        for i in range(self.depth):
            tokens = _ViTBlock(self.dim, self.num_heads, dtype=self.dtype,
                               name=f"block{i}")(tokens)
        return tokens.reshape(b, t, hp, wp, self.dim)
