"""Convex upsampling of low-resolution flow (reference
core/models/streamflow.py:82-93: softmax over a 9-way mask, combined with the
3x3 neighborhood of the x8 flow extracted via F.unfold).

Channel-last. ``flow`` is (B, h, w, 2); ``mask`` is (B, h, w, 9*ratio*ratio)
with channel index k*ratio*ratio + i*ratio + j, where k = ki*3 + kj indexes the
3x3 kernel position (row-major, matching F.unfold) and (i, j) the sub-pixel.
This layout matches the torch ``mask.view(N, 1, 9, r, r, H, W)`` exactly so
that converted checkpoints drop in.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _neighborhood3x3(x: jax.Array) -> jax.Array:
    """Extract zero-padded 3x3 neighborhoods: (B,h,w,C) -> (B,h,w,9,C),
    k = ki*3+kj row-major (same ordering as torch F.unfold with padding=1)."""
    b, h, w, c = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    patches = [
        xp[:, ki : ki + h, kj : kj + w, :] for ki in range(3) for kj in range(3)
    ]
    return jnp.stack(patches, axis=3)


def convex_upsample(flow: jax.Array, mask: jax.Array, ratio: int = 8) -> jax.Array:
    """(B,h,w,2), (B,h,w,9*r*r) -> (B, h*r, w*r, 2)."""
    b, h, w, _ = flow.shape
    r = ratio
    m = mask.reshape(b, h, w, 9, r, r).astype(jnp.float32)
    m = jax.nn.softmax(m, axis=3)
    nb = _neighborhood3x3(ratio * flow.astype(jnp.float32))  # (B,h,w,9,2)
    up = jnp.einsum("bhwkij,bhwkc->bhwijc", m, nb)  # (B,h,w,r,r,2)
    up = up.transpose(0, 1, 3, 2, 4, 5)  # (B,h,r,w,r,2)
    return up.reshape(b, h * r, w * r, 2)
