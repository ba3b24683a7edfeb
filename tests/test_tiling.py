"""Tiled inference: grid construction and Gaussian blending invariants."""

import jax.numpy as jnp
import numpy as np

from streamflow_tpu.tiling import (
    compute_grid_indices,
    gaussian_patch_weight,
    tiled_forward,
)


def test_grid_indices_cover_and_flush():
    hws = compute_grid_indices((432, 1242), (432, 960), 20)
    assert hws[0] == (0, 0)
    assert hws[-1] == (0, 1242 - 960)
    hws2 = compute_grid_indices((1080, 1920), (432, 960), 20)
    assert max(h for h, _ in hws2) == 1080 - 432
    assert max(w for _, w in hws2) == 1920 - 960


def test_gaussian_weight_peak_center():
    w = gaussian_patch_weight((32, 48), sigma=0.05)
    assert w.shape == (32, 48)
    assert w[16, 24] == w.max()
    assert w.min() > 0


def test_tiled_forward_blends_constant_flow_exactly():
    """If every tile predicts the same constant flow, blending must return
    that constant everywhere regardless of overlaps."""
    B, T, H, W = 1, 4, 64, 96
    patch = (32, 48)
    images = jnp.zeros((B, T, H, W, 3))

    const = jnp.asarray([1.5, -2.0])

    def fwd(tile):
        b = tile.shape[0]
        return jnp.broadcast_to(const, (b, T - 1, *patch, 2))

    out = tiled_forward(fwd, images, patch_size=patch, min_overlap=8)
    assert out.shape == (B, T - 1, H, W, 2)
    np.testing.assert_allclose(np.asarray(out),
                               np.broadcast_to(np.asarray(const),
                                               (B, T - 1, H, W, 2)),
                               atol=1e-5, rtol=1e-5)


def test_tiled_forward_spatially_varying():
    """Tiles that echo their input must reconstruct a smooth field up to
    blending (exact where only one tile contributes)."""
    B, T, H, W = 1, 4, 64, 96
    patch = (32, 48)
    base = np.zeros((B, T, H, W, 3), np.float32)
    base[..., 0] = np.linspace(0, 1, W)[None, None, None, :]
    images = jnp.asarray(base)

    def fwd(tile):
        # "flow" = first two channels of the first frame
        return jnp.repeat(tile[:, None, 0, :, :, :2], T - 1, axis=1)

    out = np.asarray(tiled_forward(fwd, images, patch_size=patch,
                                   min_overlap=8))
    # The input's x-gradient field should be reproduced exactly: every tile
    # sees the same global values at the same positions.
    np.testing.assert_allclose(out[0, 0, :, :, 0], base[0, 0, :, :, 0],
                               atol=1e-5)
