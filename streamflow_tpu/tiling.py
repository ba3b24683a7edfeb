"""Tiled high-resolution inference: overlapping train-size patches blended
with Gaussian weights (reference evaluate_mf.py:887-916, 985-1053) — the
reference's answer to the quadratic corr/attention memory at >1080p, kept
here alongside the flash-attention path as the second high-memory strategy.

TPU notes: every tile has the same static shape, so the whole tile sweep is
one jitted forward reused across tiles; the blend runs as a scatter-add of
weighted tiles on device.
"""

from __future__ import annotations

import math
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

TRAIN_SIZE = (432, 960)


def compute_grid_indices(image_shape: Sequence[int],
                         patch_size: Sequence[int] = TRAIN_SIZE,
                         min_overlap: int = 20) -> List[Tuple[int, int]]:
    """Top-left corners of overlapping patches; final row/col flush with the
    boundary (reference :887-895)."""
    if min_overlap >= patch_size[0] or min_overlap >= patch_size[1]:
        raise ValueError("min_overlap must be smaller than the patch")
    hs = list(range(0, image_shape[0], patch_size[0] - min_overlap))
    ws = list(range(0, image_shape[1], patch_size[1] - min_overlap))
    hs[-1] = image_shape[0] - patch_size[0]
    ws[-1] = image_shape[1] - patch_size[1]
    return [(h, w) for h in hs for w in ws]


def gaussian_patch_weight(patch_size: Sequence[int] = TRAIN_SIZE,
                          sigma: float = 0.05) -> np.ndarray:
    """Radial Gaussian over the patch, peaked at the center (reference
    compute_weight, :898-916)."""
    ph, pw = patch_size
    h = (np.arange(ph) / ph - 0.5)[:, None]
    w = (np.arange(pw) / pw - 0.5)[None, :]
    r = np.sqrt(h ** 2 + w ** 2) / sigma
    denorm = 1.0 / (sigma * math.sqrt(2 * math.pi))
    out = denorm * np.exp(-0.5 * r ** 2)
    # exp(-100) at the corners underflows to subnormals that devices flush to
    # zero -> 0/0 at pixels covered by a single patch corner. Floor the weight
    # (relative blend behavior unchanged).
    return np.maximum(out, 1e-12 * out.max()).astype(np.float32)


def tiled_forward(fwd, images: jax.Array,
                  patch_size: Sequence[int] = TRAIN_SIZE,
                  min_overlap: int = 20, sigma: float = 0.05) -> jax.Array:
    """Run ``fwd`` (jitted (B,T,ph,pw,3) -> (B,F,ph,pw,2)) over overlapping
    tiles of (B, T, H, W, 3) and blend with Gaussian weights.

    Returns (B, F, H, W, 2).
    """
    b, t, hh, ww, _ = images.shape
    ph, pw = patch_size
    assert hh >= ph and ww >= pw, "image smaller than the tile"
    hws = compute_grid_indices((hh, ww), patch_size, min_overlap)
    wpatch = jnp.asarray(gaussian_patch_weight(patch_size, sigma))

    flow_sum = None
    weight_sum = jnp.zeros((hh, ww), jnp.float32)
    for (h, w) in hws:
        tile = jax.lax.dynamic_slice(
            images, (0, 0, h, w, 0), (b, t, ph, pw, images.shape[-1]))
        flows = fwd(tile)  # (B, F, ph, pw, 2)
        f = flows.shape[1]
        if flow_sum is None:
            flow_sum = jnp.zeros((b, f, hh, ww, 2), jnp.float32)
        padded = jnp.zeros_like(flow_sum)
        padded = jax.lax.dynamic_update_slice(
            padded, flows * wpatch[None, None, :, :, None], (0, 0, h, w, 0))
        flow_sum = flow_sum + padded
        wpad = jnp.zeros_like(weight_sum)
        wpad = jax.lax.dynamic_update_slice(wpad, wpatch, (h, w))
        weight_sum = weight_sum + wpad
    return flow_sum / weight_sum[None, None, :, :, None]
