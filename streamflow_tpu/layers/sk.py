"""SKFlow large-kernel block (reference PCBlock4_Deep_nopool_res,
core/update.py:12-36).

Structure: FFN(1.5x) residual -> stack of depthwise convs with kernel sizes
``k_conv`` (canonical [1, 15]) residual -> pointwise residual -> FFN(1.5x)
projection, with exact GELU after every residual.

TPU notes:
- Parameters keep the exact reference shapes (324-channel corr input etc.)
  so checkpoints map 1:1, but at apply time the working channel count is
  zero-padded up to a multiple of 128 lanes (``align=True``): zero input
  channels with zero weight rows/bias contribute exactly nothing, and the
  depthwise 15x15 conv — the VPU-bound hot op of the refinement loop — runs
  ~2.8x faster on a whole number of lane tiles (the 324-channel convc1
  instance was the single most expensive conv in the r2 trace).
- The 1x1 convs are MXU matmuls that XLA fuses with the surrounding GELUs.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from streamflow_tpu.layers.common import gelu


def _ceil128(n: int) -> int:
    return -(-n // 128) * 128


class _PadConv(nn.Module):
    """1x1 (or depthwise kxk) conv whose PARAMETERS have the reference shape
    (in_dim[/groups] x out_dim) but whose execution is zero-padded to the
    lane-aligned widths ``in_pad``/``out_pad``. Exactness: zero weight rows
    kill padded input channels; padded output channels get zero weight
    columns and zero bias."""

    in_dim: int
    out_dim: int
    in_pad: int
    out_pad: int
    kernel: int = 1
    depthwise: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        k = self.kernel
        cin_g = 1 if self.depthwise else self.in_dim
        w = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (k, k, cin_g, self.out_dim),
            jnp.float32,
        )
        b = self.param("bias", nn.initializers.zeros, (self.out_dim,),
                       jnp.float32)
        dt = self.dtype or x.dtype
        w = w.astype(dt)
        b = b.astype(dt)
        x = x.astype(dt)

        if self.depthwise:
            # (k,k,1,C) padded along the channel axis
            w = jnp.pad(w, ((0, 0), (0, 0), (0, 0),
                            (0, self.out_pad - self.out_dim)))
            groups = self.out_pad
        else:
            w = jnp.pad(w, ((0, 0), (0, 0),
                            (0, self.in_pad - self.in_dim),
                            (0, self.out_pad - self.out_dim)))
            groups = 1
        b = jnp.pad(b, (0, self.out_pad - self.out_dim))

        pad = k // 2
        y = jax.lax.conv_general_dilated(
            x, w, (1, 1), [(pad, pad), (pad, pad)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=groups,
            preferred_element_type=dt,
        )
        return y + b


class SKBlock(nn.Module):
    out_dim: int
    k_conv: Sequence[int] = (1, 15)
    dtype: Optional[jnp.dtype] = None
    align: bool = True

    @nn.compact
    def __call__(self, x):
        c_in = x.shape[-1]
        hidden = int(1.5 * c_in)
        cp = _ceil128(c_in) if self.align else c_in
        hp = _ceil128(hidden) if self.align else hidden
        op = _ceil128(self.out_dim) if self.align else self.out_dim

        if self.dtype is not None:
            x = x.astype(self.dtype)
        if cp != c_in:
            x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, cp - c_in)])

        def conv(name, in_dim, out_dim, in_pad, out_pad, k=1, dw=False):
            return _PadConv(in_dim, out_dim, in_pad, out_pad, kernel=k,
                            depthwise=dw, dtype=self.dtype, name=name)

        h = gelu(conv("ffn1_in", c_in, hidden, cp, hp)(x))
        x = gelu(x + conv("ffn1_out", hidden, c_in, hp, cp)(h))

        for i, k in enumerate(self.k_conv):
            dwc = conv(f"dw{i}_k{k}", c_in, c_in, cp, cp, k=k, dw=True)(x)
            x = gelu(x + dwc)

        x = gelu(x + conv("pw", c_in, c_in, cp, cp)(x))

        h = gelu(conv("ffn2_in", c_in, hidden, cp, hp)(x))
        x = conv("ffn2_out", hidden, self.out_dim, hp, op)(h)
        if op != self.out_dim:
            x = x[..., : self.out_dim]
        return x
