"""SKFlow large-kernel block (reference PCBlock4_Deep_nopool_res,
core/update.py:12-36).

Structure: FFN(1.5x) residual -> stack of depthwise convs with kernel sizes
``k_conv`` (canonical [1, 15]) residual -> pointwise residual -> FFN(1.5x)
projection, with exact GELU after every residual.

TPU notes: the 15x15 depthwise conv is the one op XLA lowers well on its own
(depthwise convs map to the VPU with an implicit im2col-free schedule); the
1x1s are matmuls that XLA fuses with the surrounding elementwise GELUs. All
convs run in the module dtype (bf16 under mixed precision).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp
import flax.linen as nn

from streamflow_tpu.layers.common import conv2d, gelu


class SKBlock(nn.Module):
    out_dim: int
    k_conv: Sequence[int] = (1, 15)
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        c_in = x.shape[-1]
        hidden = int(1.5 * c_in)

        ffn1 = conv2d(c_in, 1, dtype=self.dtype, name="ffn1_out")(
            gelu(conv2d(hidden, 1, dtype=self.dtype, name="ffn1_in")(x))
        )
        x = gelu(x + ffn1)

        for i, k in enumerate(self.k_conv):
            dw = conv2d(
                c_in, k, padding=k // 2, groups=c_in, dtype=self.dtype,
                name=f"dw{i}_k{k}",
            )(x)
            x = gelu(x + dw)

        x = gelu(x + conv2d(c_in, 1, dtype=self.dtype, name="pw")(x))

        x = conv2d(self.out_dim, 1, dtype=self.dtype, name="ffn2_out")(
            gelu(conv2d(hidden, 1, dtype=self.dtype, name="ffn2_in")(x))
        )
        return x
