"""Bilinear sampling at pixel coordinates, matching torch
``F.grid_sample(align_corners=True, padding_mode='zeros', mode='bilinear')``
as wrapped by the reference's bilinear_sampler (core/utils/utils.py:65-79).

Channel-last: ``img`` is (B, H, W, C); ``coords`` is (B, ..., 2) in *pixel*
units with channel 0 = x (along W), channel 1 = y (along H). Samples outside
the image contribute zero (grid_sample zero padding).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def bilinear_sampler(img: jax.Array, coords: jax.Array, mask: bool = False):
    b, h, w, c = img.shape
    cshape = coords.shape
    assert cshape[0] == b and cshape[-1] == 2
    pts = coords.reshape(b, -1, 2)
    x = pts[..., 0].astype(jnp.float32)
    y = pts[..., 1].astype(jnp.float32)

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    x1 = x0 + 1.0
    y1 = y0 + 1.0
    wx = x - x0
    wy = y - y0

    def tap(yi, xi):
        valid = (xi >= 0) & (xi <= w - 1) & (yi >= 0) & (yi <= h - 1)
        xi_c = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        yi_c = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        flat = yi_c * w + xi_c  # (B, N)
        vals = jnp.take_along_axis(
            img.reshape(b, h * w, c), flat[..., None], axis=1
        )
        return vals * valid[..., None].astype(img.dtype)

    out = (
        tap(y0, x0) * ((1 - wy) * (1 - wx))[..., None]
        + tap(y0, x1) * ((1 - wy) * wx)[..., None]
        + tap(y1, x0) * (wy * (1 - wx))[..., None]
        + tap(y1, x1) * (wy * wx)[..., None]
    )
    out = out.reshape(*cshape[:-1], c)
    if mask:
        # In-bounds mask in normalized-coordinate terms (reference returns
        # (xgrid > -1) & (ygrid > -1) & (xgrid < 1) & (ygrid < 1)).
        m = (x > 0) & (x < w - 1) & (y > 0) & (y < h - 1)
        return out, m.reshape(cshape[:-1]).astype(img.dtype)
    return out
