"""All-pairs correlation volume: construction, pyramid, and radius-window
lookup (reference core/corr.py:6-54), re-designed for TPU.

Differences from the CUDA/torch composite:

- The volume is built with a single batched matmul in fp32 on the MXU and kept
  in the layout (B, N1, H2, W2) with N1 = H1*W1 query pixels.
- The pyramid is exact 2x2/stride-2 average pooling (torch ``avg_pool2d(2,2)``
  drops trailing odd rows/cols; we reproduce that with a VALID reduce_window).
- The lookup exploits that the (2r+1)^2 sample offsets are integers: all 81
  bilinear samples of one query share a single fractional weight, so the
  gather collapses to one (2r+2)^2 integer-tap window per query per level,
  combined with 4 bilinear weights. Out-of-range taps contribute zero
  (grid_sample zero padding).
- Channel ordering of the 324-dim output matches the reference exactly:
  levels outermost, then the window flattened **x-major** (the reference adds
  delta[...,0] to x, core/corr.py:33-37 + utils.py:68).

A fused Pallas kernel that never materializes the full-rank volume lives in
``streamflow_tpu.ops.pallas.corr`` and is selected with ``corr_impl='pallas'``.
"""

from __future__ import annotations

import math
from typing import List, NamedTuple

import jax
import jax.numpy as jnp


def corr_volume(fmap1: jax.Array, fmap2: jax.Array) -> jax.Array:
    """All-pairs correlation <f1_i, f2_j> / sqrt(C).

    fmap1, fmap2: (B, H, W, C) -> (B, H*W, H, W) fp32.
    """
    b, h, w, c = fmap1.shape
    f1 = fmap1.reshape(b, h * w, c)
    f2 = fmap2.reshape(b, h * w, c)
    vol = jax.lax.dot_general(
        f1,
        f2,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    return (vol / math.sqrt(c)).reshape(b, h * w, h, w)


def _avg_pool2(x: jax.Array) -> jax.Array:
    """2x2 stride-2 average pooling over the trailing two spatial dims of
    (B, N, H, W), VALID padding (drops odd remainders, as torch avg_pool2d)."""
    s = jax.lax.reduce_window(
        x,
        0.0,
        jax.lax.add,
        window_dimensions=(1, 1, 2, 2),
        window_strides=(1, 1, 2, 2),
        padding="VALID",
    )
    return s * 0.25


def corr_pyramid(vol: jax.Array, num_levels: int = 4) -> List[jax.Array]:
    """Average-pool pyramid over the *target* dims (reference core/corr.py:19-21)."""
    pyr = [vol]
    for _ in range(num_levels - 1):
        pyr.append(_avg_pool2(pyr[-1]))
    return pyr


def _lookup_level(corr_l: jax.Array, coords: jax.Array, level: int, radius: int) -> jax.Array:
    """Sample one pyramid level at a (2r+1)^2 window around coords / 2**level.

    corr_l: (B, N, Hl, Wl); coords: (B, N, 2) pixel xy at level 0.
    Returns (B, N, (2r+1)**2), window flattened x-major.
    """
    b, n, hl, wl = corr_l.shape
    r = radius
    k = 2 * r + 1
    ctr = coords.astype(jnp.float32) / (2.0 ** level)
    cx, cy = ctr[..., 0], ctr[..., 1]
    x0 = jnp.floor(cx)
    y0 = jnp.floor(cy)
    fx = cx - x0  # shared fractional weight across all integer offsets
    fy = cy - y0

    # Integer taps: (2r+2) consecutive coords starting at floor(c) - r.
    offs = jnp.arange(-r, r + 2, dtype=jnp.float32)  # length 2r+2
    tx = x0[..., None] + offs[None, None, :]  # (B, N, 2r+2)
    ty = y0[..., None] + offs[None, None, :]

    vx = (tx >= 0) & (tx <= wl - 1)
    vy = (ty >= 0) & (ty <= hl - 1)
    ix = jnp.clip(tx, 0, wl - 1).astype(jnp.int32)
    iy = jnp.clip(ty, 0, hl - 1).astype(jnp.int32)

    # Gather the (2r+2)x(2r+2) integer window per query.
    flat_idx = (iy[..., :, None] * wl + ix[..., None, :]).reshape(b, n, -1)
    vals = jnp.take_along_axis(corr_l.reshape(b, n, hl * wl), flat_idx, axis=2)
    vals = vals.reshape(b, n, 2 * r + 2, 2 * r + 2)  # [.., y-tap, x-tap]
    valid = (vy[..., :, None] & vx[..., None, :]).astype(vals.dtype)
    vals = vals * valid

    # Bilinear combine: out[y_off, x_off] over the k x k window.
    wyy = fy[..., None, None]
    wxx = fx[..., None, None]
    out = (
        vals[..., :k, :k] * (1 - wyy) * (1 - wxx)
        + vals[..., :k, 1:] * (1 - wyy) * wxx
        + vals[..., 1:, :k] * wyy * (1 - wxx)
        + vals[..., 1:, 1:] * wyy * wxx
    )  # (B, N, k, k) indexed [y_off, x_off]

    # Reference flattening is x-major (delta[...,0] is added to x): transpose.
    out = out.transpose(0, 1, 3, 2).reshape(b, n, k * k)
    return out


class CorrPyramid(NamedTuple):
    """Precomputed correlation pyramid for one frame pair.

    Functional analogue of the reference's CorrBlock object
    (core/corr.py:6-44): build once per forward pass, look up per iteration.
    """

    levels: tuple  # tuple of (B, N, Hl, Wl) arrays
    radius: int
    h: int
    w: int

    @classmethod
    def build(
        cls,
        fmap1: jax.Array,
        fmap2: jax.Array,
        num_levels: int = 4,
        radius: int = 4,
    ) -> "CorrPyramid":
        b, h, w, c = fmap1.shape
        vol = corr_volume(fmap1, fmap2)
        return cls(levels=tuple(corr_pyramid(vol, num_levels)), radius=radius, h=h, w=w)

    def lookup(self, coords: jax.Array) -> jax.Array:
        """coords: (B, H, W, 2) pixel xy -> (B, H, W, L*(2r+1)^2) fp32."""
        b, h, w, _ = coords.shape
        pts = coords.reshape(b, h * w, 2)
        outs = [
            _lookup_level(lvl, pts, i, self.radius)
            for i, lvl in enumerate(self.levels)
        ]
        out = jnp.concatenate(outs, axis=-1)
        return out.reshape(b, h, w, -1).astype(jnp.float32)


def corr_lookup(
    fmap1: jax.Array,
    fmap2: jax.Array,
    coords: jax.Array,
    num_levels: int = 4,
    radius: int = 4,
) -> jax.Array:
    """One-shot build + lookup (convenience for tests)."""
    return CorrPyramid.build(fmap1, fmap2, num_levels, radius).lookup(coords)
