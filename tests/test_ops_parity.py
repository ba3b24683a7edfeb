"""Golden-parity tests of the flow primitives against torch oracles.

The reference implements these ops as compositions of torch primitives
(grid_sample / avg_pool2d / unfold / matmul); we verify our TPU-native
implementations reproduce those semantics bit-for-bit (up to fp32 rounding).
"""

import math

import numpy as np
import pytest
import torch
import torch.nn.functional as TF
import jax.numpy as jnp

from streamflow_tpu.ops import (
    bilinear_sampler,
    coords_grid,
    corr_lookup,
    corr_volume,
    corr_pyramid,
    convex_upsample,
    upflow,
    InputPadder,
)

RNG = np.random.default_rng(0)


def torch_bilinear_sampler(img_nchw, coords_xy):
    """Reference semantics: pixel coords -> normalized grid_sample
    (core/utils/utils.py:65-79)."""
    H, W = img_nchw.shape[-2:]
    xgrid = 2 * coords_xy[..., 0:1] / (W - 1) - 1
    ygrid = 2 * coords_xy[..., 1:2] / (H - 1) - 1
    grid = torch.cat([xgrid, ygrid], dim=-1)
    return TF.grid_sample(img_nchw, grid, align_corners=True)


@pytest.mark.parametrize("hw", [(16, 24), (9, 13)])
def test_bilinear_sampler_matches_grid_sample(hw):
    H, W = hw
    B, C = 2, 5
    img = RNG.standard_normal((B, H, W, C)).astype(np.float32)
    # Coords intentionally spill outside the image to exercise zero padding.
    coords = (RNG.random((B, 7, 11, 2)).astype(np.float32) * np.array([W + 6, H + 6]) - 3.0).astype(np.float32)

    ours = np.asarray(bilinear_sampler(jnp.asarray(img), jnp.asarray(coords)))

    timg = torch.from_numpy(img).permute(0, 3, 1, 2)
    tout = torch_bilinear_sampler(timg, torch.from_numpy(coords))
    theirs = tout.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-5, rtol=1e-5)


def test_coords_grid():
    g = np.asarray(coords_grid(2, 4, 6))
    assert g.shape == (2, 4, 6, 2)
    assert g[0, 2, 3, 0] == 3  # x = column
    assert g[0, 2, 3, 1] == 2  # y = row


@pytest.mark.parametrize("hw", [(12, 16), (11, 15)])
def test_corr_volume_and_pyramid(hw):
    H, W = hw
    B, C = 2, 32
    f1 = RNG.standard_normal((B, H, W, C)).astype(np.float32)
    f2 = RNG.standard_normal((B, H, W, C)).astype(np.float32)

    vol = np.asarray(corr_volume(jnp.asarray(f1), jnp.asarray(f2)))
    t1 = torch.from_numpy(f1).reshape(B, H * W, C)
    t2 = torch.from_numpy(f2).reshape(B, H * W, C)
    tvol = (t1 @ t2.transpose(1, 2) / math.sqrt(C)).reshape(B, H * W, H, W)
    np.testing.assert_allclose(vol, tvol.numpy(), atol=1e-4, rtol=1e-4)

    pyr = corr_pyramid(jnp.asarray(vol), num_levels=4)
    tcur = tvol.reshape(B * H * W, 1, H, W)
    for lvl in range(1, 4):
        tcur = TF.avg_pool2d(tcur, 2, stride=2)
        ours_l = np.asarray(pyr[lvl]).reshape(B * H * W, 1, *pyr[lvl].shape[-2:])
        np.testing.assert_allclose(ours_l, tcur.numpy(), atol=1e-4, rtol=1e-4)


def torch_corr_lookup(f1, f2, coords_xy, num_levels=4, radius=4):
    """Oracle reproducing CorrBlock.__call__ semantics (core/corr.py:23-44)."""
    B, H, W, C = f1.shape
    t1 = torch.from_numpy(f1).reshape(B, H * W, C)
    t2 = torch.from_numpy(f2).reshape(B, H * W, C)
    corr = (t1 @ t2.transpose(1, 2) / math.sqrt(C)).reshape(B * H * W, 1, H, W)
    pyramid = [corr]
    for _ in range(num_levels - 1):
        pyramid.append(TF.avg_pool2d(pyramid[-1], 2, stride=2))

    r = radius
    coords = torch.from_numpy(coords_xy)  # (B, H, W, 2)
    out_pyramid = []
    for i, c in enumerate(pyramid):
        dx = torch.linspace(-r, r, 2 * r + 1)
        dy = torch.linspace(-r, r, 2 * r + 1)
        delta = torch.stack(torch.meshgrid(dy, dx, indexing="ij"), axis=-1)
        centroid = coords.reshape(B * H * W, 1, 1, 2) / 2**i
        lvl_coords = centroid + delta.view(1, 2 * r + 1, 2 * r + 1, 2)
        sampled = torch_bilinear_sampler(c, lvl_coords)
        out_pyramid.append(sampled.view(B, H, W, -1))
    return torch.cat(out_pyramid, dim=-1).numpy()


# Sizes keep every pyramid level >= 2 px (grid_sample's align_corners
# normalization divides by (dim-1); a 1-px level is degenerate even in torch).
@pytest.mark.parametrize("hw", [(16, 16), (20, 26)])
def test_corr_lookup_matches_reference(hw):
    H, W = hw
    B, C = 1, 16
    f1 = RNG.standard_normal((B, H, W, C)).astype(np.float32)
    f2 = RNG.standard_normal((B, H, W, C)).astype(np.float32)
    base = np.asarray(coords_grid(B, H, W))
    coords = (base + RNG.standard_normal(base.shape) * 3.0).astype(np.float32)

    ours = np.asarray(
        corr_lookup(jnp.asarray(f1), jnp.asarray(f2), jnp.asarray(coords))
    )
    theirs = torch_corr_lookup(f1, f2, coords)
    assert ours.shape == theirs.shape == (B, H, W, 4 * 81)
    np.testing.assert_allclose(ours, theirs, atol=2e-4, rtol=2e-4)


def torch_convex_upsample(flow_nchw, mask_nchw, ratio=8):
    """Oracle for upsample_flow (core/models/streamflow.py:82-93)."""
    N, _, H, W = flow_nchw.shape
    mask = mask_nchw.view(N, 1, 9, ratio, ratio, H, W)
    mask = torch.softmax(mask, dim=2)
    up_flow = TF.unfold(ratio * flow_nchw, [3, 3], padding=1)
    up_flow = up_flow.view(N, 2, 9, 1, 1, H, W)
    up_flow = torch.sum(mask * up_flow, dim=2)
    up_flow = up_flow.permute(0, 1, 4, 2, 5, 3)
    return up_flow.reshape(N, 2, ratio * H, ratio * W)


@pytest.mark.parametrize("ratio", [8, 4])
def test_convex_upsample_matches_reference(ratio):
    B, H, W = 2, 6, 7
    flow = RNG.standard_normal((B, H, W, 2)).astype(np.float32) * 4
    mask = RNG.standard_normal((B, H, W, 9 * ratio * ratio)).astype(np.float32)

    ours = np.asarray(
        convex_upsample(jnp.asarray(flow), jnp.asarray(mask), ratio=ratio)
    )
    tflow = torch.from_numpy(flow).permute(0, 3, 1, 2)
    tmask = torch.from_numpy(mask).permute(0, 3, 1, 2)
    theirs = torch_convex_upsample(tflow, tmask, ratio).permute(0, 2, 3, 1).numpy()
    # fp32 softmax/einsum accumulation-order differences only
    np.testing.assert_allclose(ours, theirs, atol=1e-4, rtol=1e-3)


def test_upflow_matches_interpolate():
    B, H, W = 1, 5, 9
    flow = RNG.standard_normal((B, H, W, 2)).astype(np.float32)
    ours = np.asarray(upflow(jnp.asarray(flow), 8))
    t = torch.from_numpy(flow).permute(0, 3, 1, 2)
    theirs = (
        8 * TF.interpolate(t, size=(8 * H, 8 * W), mode="bilinear", align_corners=True)
    ).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-5, rtol=1e-5)


def test_input_padder_roundtrip():
    x = jnp.asarray(RNG.standard_normal((2, 436, 1024, 3)).astype(np.float32))
    padder = InputPadder(x.shape, mode="sintel")
    xp = padder.pad(x)
    assert xp.shape[1] % 8 == 0 and xp.shape[2] % 8 == 0
    back = padder.unpad(xp)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))
    # replicate-pad edges match torch
    t = torch.from_numpy(np.asarray(x)).permute(0, 3, 1, 2)
    l, r, tt, bb = padder._pad
    tp = TF.pad(t, (l, r, tt, bb), mode="replicate").permute(0, 2, 3, 1).numpy()
    np.testing.assert_array_equal(np.asarray(xp), tp)


def test_int8_volume_quantization_error():
    """int8-stored pyramid (CorrPyramid.build(quantize=True)): the lookup
    must match the fp32 lookup within the quantization bound (scale/2 per
    tap; bilinear taps are convex combinations so the window error stays
    below ~scale). This is the accuracy gate for corr_store='int8'."""
    from streamflow_tpu.ops.corr import CorrPyramid

    rng = np.random.default_rng(11)
    b, h, w, c = 2, 16, 24, 64
    f1 = jnp.asarray(rng.standard_normal((b, h, w, c)), jnp.float32)
    f2 = jnp.asarray(rng.standard_normal((b, h, w, c)), jnp.float32)
    coords = jnp.asarray(
        np.stack(np.meshgrid(np.arange(w), np.arange(h), indexing="xy"),
                 axis=-1)[None].repeat(b, 0)
        + 2.5 * rng.standard_normal((b, h, w, 2)), jnp.float32)

    ref = CorrPyramid.build(f1, f2, 4, 4)
    q8 = CorrPyramid.build(f1, f2, 4, 4, quantize=True)
    assert all(lvl.dtype == jnp.int8 for lvl in q8.levels)
    assert len(q8.scales) == 4

    out_ref = np.asarray(ref.lookup(coords))
    out_q = np.asarray(q8.lookup(coords))
    # worst-case per-tap error is scale/2; bilinear mixing keeps it there
    bound = float(np.max([np.asarray(s).max() for s in q8.scales]))
    err = np.abs(out_q - out_ref)
    assert err.max() <= bound * 1.01, (err.max(), bound)
    # and the volume is genuinely informative after dequant (not collapsed)
    assert np.corrcoef(out_q.reshape(-1), out_ref.reshape(-1))[0, 1] > 0.9999
