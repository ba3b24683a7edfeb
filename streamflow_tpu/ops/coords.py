"""Coordinate grids and flow rescaling (reference core/utils/utils.py:82-139).

All arrays are channel-last. A flow/coordinate field has shape (..., H, W, 2)
with channel 0 = x (along W) and channel 1 = y (along H), matching the
reference's coords_grid ordering (core/utils/utils.py:82-85).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def coords_grid(batch: int, ht: int, wd: int, dtype=jnp.float32) -> jax.Array:
    """Identity coordinate grid, shape (batch, ht, wd, 2), channels (x, y)."""
    ys = jax.lax.broadcasted_iota(dtype, (ht, wd), 0)
    xs = jax.lax.broadcasted_iota(dtype, (ht, wd), 1)
    grid = jnp.stack([xs, ys], axis=-1)
    return jnp.broadcast_to(grid[None], (batch, ht, wd, 2))


def _interp_bilinear(x: jax.Array, new_hw: tuple[int, int]) -> jax.Array:
    """Bilinear resize with align_corners=True semantics over (B, H, W, C)
    (matches torch F.interpolate(mode='bilinear', align_corners=True), the mode
    used by the reference's upflow/downflow helpers)."""
    b, h, w, c = x.shape
    nh, nw = new_hw
    # align_corners: output i maps to input i * (H-1)/(nH-1)
    ys = jnp.linspace(0.0, h - 1.0, nh)
    xs = jnp.linspace(0.0, w - 1.0, nw)
    y0 = jnp.clip(jnp.floor(ys), 0, h - 1).astype(jnp.int32)
    x0 = jnp.clip(jnp.floor(xs), 0, w - 1).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, h - 1)
    x1 = jnp.minimum(x0 + 1, w - 1)
    wy = (ys - y0.astype(ys.dtype))[None, :, None, None]
    wx = (xs - x0.astype(xs.dtype))[None, None, :, None]
    g = lambda yi, xi: x[:, yi][:, :, xi]
    top = g(y0, x0) * (1 - wx) + g(y0, x1) * wx
    bot = g(y1, x0) * (1 - wx) + g(y1, x1) * wx
    return top * (1 - wy) + bot * wy


def upflow(flow: jax.Array, factor: int = 8) -> jax.Array:
    """Upsample a flow field by `factor` and scale its magnitude accordingly
    (reference upflow8/4/2, core/utils/utils.py:117-129)."""
    b, h, w, c = flow.shape
    return factor * _interp_bilinear(flow, (factor * h, factor * w))


def downflow(flow: jax.Array, factor: int = 8) -> jax.Array:
    """Downsample a flow field by `factor` (reference downflow8/4)."""
    b, h, w, c = flow.shape
    return _interp_bilinear(flow, (h // factor, w // factor)) / factor


def resize_flow(flow: jax.Array, new_hw: tuple[int, int]) -> jax.Array:
    """Resize flow to an arbitrary size, rescaling the vectors."""
    b, h, w, c = flow.shape
    nh, nw = new_hw
    out = _interp_bilinear(flow, new_hw)
    scale = jnp.array([nw / w, nh / h], dtype=flow.dtype)
    return out * scale
