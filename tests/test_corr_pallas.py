"""Fused Pallas correlation lookup vs the XLA composite (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from streamflow_tpu.ops import coords_grid, corr_lookup
from streamflow_tpu.ops.pallas._corr_kernel import corr_lookup_fused

RNG = np.random.default_rng(0)


@pytest.mark.parametrize("disp_scale", [0.0, 3.0, 50.0])
def test_fused_corr_matches_xla(disp_scale):
    B, H, W, C = 1, 16, 24, 32
    f1 = jnp.asarray(RNG.standard_normal((B, H, W, C)), jnp.float32)
    f2 = jnp.asarray(RNG.standard_normal((B, H, W, C)), jnp.float32)
    base = coords_grid(B, H, W)
    coords = base + disp_scale * jnp.asarray(
        RNG.standard_normal(base.shape), jnp.float32)

    want = np.asarray(corr_lookup(f1, f2, coords))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(corr_lookup_fused(f1, f2, coords, block_q=128))
    assert got.shape == want.shape == (B, H, W, 324)
    # bf16 features in the fused kernel (fp32 accumulate)
    np.testing.assert_allclose(got, want, atol=5e-2, rtol=2e-2)


def test_model_pallas_corr_matches_xla_corr():
    """corr_impl='pallas' (CPU fallback path: pooled-features matmul per
    level) must equal corr_impl='xla' (volume-then-pool) exactly — pooling
    commutes with the dot product."""
    from streamflow_tpu.config import StreamFlowConfig
    from streamflow_tpu.models import create_model

    B, T, H, W = 1, 4, 64, 96
    imgs = jnp.asarray(RNG.integers(0, 255, (B, T, H, W, 3)), jnp.float32)
    outs = {}
    for impl in ["xla", "pallas"]:
        cfg = StreamFlowConfig(T=T, iters=2, mixed_precision=False,
                               corr_impl=impl)
        m = create_model("streamflow", cfg=cfg)
        p = jax.jit(lambda k, x: m.init(k, x, test_mode=True))(
            jax.random.PRNGKey(0), imgs)
        outs[impl] = np.asarray(
            jax.jit(lambda p_, x: m.apply(p_, x, test_mode=True))(p, imgs))
    # fp32 contraction-order noise, amplified through the refinement GRU
    np.testing.assert_allclose(outs["xla"], outs["pallas"], atol=2e-3,
                               rtol=2e-3)


def test_chunked_corr_matches_full():
    """ChunkedCorr (memory-bounded lax.map sweep) equals the full-volume
    pyramid lookup."""
    from streamflow_tpu.ops.corr import ChunkedCorr, CorrPyramid
    from streamflow_tpu.ops import coords_grid

    B, H, W, C = 2, 16, 24, 32
    f1 = jnp.asarray(RNG.standard_normal((B, H, W, C)), jnp.float32)
    f2 = jnp.asarray(RNG.standard_normal((B, H, W, C)), jnp.float32)
    coords = coords_grid(B, H, W) + 2.5 * jnp.asarray(
        RNG.standard_normal((B, H, W, 2)), jnp.float32)

    want = np.asarray(CorrPyramid.build(f1, f2).lookup(coords))
    got = np.asarray(ChunkedCorr.build(f1, f2, chunk=96).lookup(coords))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-4)


def test_window_lookup_kernel_interpret():
    """v3 window-lookup kernel (padded prebuilt pyramid) vs the XLA lookup."""
    from streamflow_tpu.ops.corr import CorrPyramid
    from streamflow_tpu.ops import coords_grid
    from streamflow_tpu.ops.pallas._corr_window_kernel import (
        build_padded_pyramid, window_lookup_tpu,
    )

    B, H, W, C = 1, 16, 24, 32
    f1 = jnp.asarray(RNG.standard_normal((B, H, W, C)), jnp.float32)
    f2 = jnp.asarray(RNG.standard_normal((B, H, W, C)), jnp.float32)
    coords = coords_grid(B, H, W) + 30.0 * jnp.asarray(
        RNG.standard_normal((B, H, W, 2)), jnp.float32)

    pyr = CorrPyramid.build(f1, f2)
    want = np.asarray(pyr.lookup(coords))

    padded, meta = build_padded_pyramid(list(pyr.levels), dtype=jnp.float32)
    from jax.experimental.pallas import tpu as pltpu

    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(window_lookup_tpu(padded, meta, coords, block_q=128))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-4)


def test_model_window_corr_matches_xla():
    from streamflow_tpu.config import StreamFlowConfig
    from streamflow_tpu.models import create_model

    B, T, H, W = 1, 4, 64, 96
    imgs = jnp.asarray(RNG.integers(0, 255, (B, T, H, W, 3)), jnp.float32)
    outs = {}
    for impl in ["xla", "pallas_window"]:
        cfg = StreamFlowConfig(T=T, iters=2, mixed_precision=False,
                               corr_impl=impl)
        m = create_model("streamflow", cfg=cfg)
        p = jax.jit(lambda k, x: m.init(k, x, test_mode=True))(
            jax.random.PRNGKey(0), imgs)
        outs[impl] = np.asarray(
            jax.jit(lambda p_, x: m.apply(p_, x, test_mode=True))(p, imgs))
    # identical math at matched (fp32) volume storage
    np.testing.assert_allclose(outs["xla"], outs["pallas_window"], atol=2e-3,
                               rtol=2e-3)
