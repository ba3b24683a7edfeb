"""Fused Pallas correlation lookup (volume recompute + window extraction,
ops/pallas/_fused_lookup_kernel.py) vs the XLA composite, in interpret mode.

Reference semantics under test: core/corr.py:23-44 (pyramid lookup with
grid_sample zero padding), via the torch-oracle-verified XLA path
(tests/test_ops_parity.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from streamflow_tpu.ops import coords_grid, corr_lookup
from streamflow_tpu.ops.pallas._fused_lookup_kernel import (
    fused_corr_lookup,
    pool_pyramid,
)

RNG = np.random.default_rng(0)


@pytest.mark.parametrize("rows", ["dynamic", "full"])
@pytest.mark.parametrize("disp_scale", [0.0, 3.0, 50.0])
def test_fused_lookup_matches_xla(disp_scale, rows):
    B, H, W, C = 2, 16, 24, 32
    f1 = jnp.asarray(RNG.standard_normal((B, H, W, C)), jnp.float32)
    f2 = jnp.asarray(RNG.standard_normal((B, H, W, C)), jnp.float32)
    base = coords_grid(B, H, W)
    coords = base + disp_scale * jnp.asarray(
        RNG.standard_normal(base.shape), jnp.float32)

    want = np.asarray(corr_lookup(f1, f2, coords))
    got = np.asarray(fused_corr_lookup(
        f1, tuple(pool_pyramid(f2, 4)), coords, radius=4, block_q=128,
        interpret=True, rows=rows))
    assert got.shape == want.shape == (B, H, W, 324)
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_fused_lookup_extreme_coords():
    """Far out-of-range windows must be exactly zero (grid_sample zero
    padding), including the clamp path for huge coordinates."""
    B, H, W, C = 1, 16, 24, 16
    f1 = jnp.asarray(RNG.standard_normal((B, H, W, C)), jnp.float32)
    f2 = jnp.asarray(RNG.standard_normal((B, H, W, C)), jnp.float32)
    coords = jnp.tile(jnp.asarray([1e7, -1e7], jnp.float32), (B, H, W, 1))

    got = np.asarray(fused_corr_lookup(
        f1, tuple(pool_pyramid(f2, 4)), coords, radius=4, block_q=128,
        interpret=True))
    np.testing.assert_array_equal(got, np.zeros_like(got))


def test_fused_lookup_bf16_out():
    B, H, W, C = 1, 16, 24, 32
    f1 = jnp.asarray(RNG.standard_normal((B, H, W, C)), jnp.float32)
    f2 = jnp.asarray(RNG.standard_normal((B, H, W, C)), jnp.float32)
    coords = coords_grid(B, H, W)
    got = fused_corr_lookup(f1, tuple(pool_pyramid(f2, 4)), coords,
                            radius=4, block_q=128, interpret=True,
                            out_dtype=jnp.bfloat16)
    assert got.dtype == jnp.bfloat16
    want = np.asarray(corr_lookup(f1, f2, coords))
    np.testing.assert_allclose(np.asarray(got, np.float32), want,
                               atol=3e-2, rtol=3e-2)


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


def test_pallas_corr_grads():
    """The custom-vjp backward (XLA recompute) produces finite grads for
    both feature maps through the fused path."""
    from streamflow_tpu.ops.pallas.corr import PallasCorr

    B, H, W, C = 1, 8, 16, 16
    f1 = jnp.asarray(RNG.standard_normal((B, H, W, C)), jnp.float32)
    f2 = jnp.asarray(RNG.standard_normal((B, H, W, C)), jnp.float32)
    coords = coords_grid(B, H, W)

    def loss(a, b):
        return jnp.sum(PallasCorr.build(a, b).lookup(coords) ** 2)

    g1, g2 = jax.grad(loss, argnums=(0, 1))(f1, f2)
    assert np.isfinite(np.asarray(g1)).all()
    assert np.isfinite(np.asarray(g2)).all()
    assert float(jnp.abs(g1).sum()) > 0 and float(jnp.abs(g2).sum()) > 0


def test_chunked_corr_matches_full():
    """ChunkedCorr (memory-bounded lax.map sweep) equals the full-volume
    pyramid lookup."""
    from streamflow_tpu.ops.corr import ChunkedCorr, CorrPyramid

    B, H, W, C = 2, 16, 24, 32
    f1 = jnp.asarray(RNG.standard_normal((B, H, W, C)), jnp.float32)
    f2 = jnp.asarray(RNG.standard_normal((B, H, W, C)), jnp.float32)
    coords = coords_grid(B, H, W) + 2.5 * jnp.asarray(
        RNG.standard_normal((B, H, W, 2)), jnp.float32)

    want = np.asarray(CorrPyramid.build(f1, f2).lookup(coords))
    got = np.asarray(ChunkedCorr.build(f1, f2, chunk=96).lookup(coords))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-4)


def test_fused_lookup_wide_level():
    """Level widths beyond two lane tiles (Spring 1080p: wl=240 -> wp=384):
    the per-tile gather/select chain must stay exact (regression for the
    2-tile cap that broke the for_resolution() high-res path)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from streamflow_tpu.ops.corr import CorrPyramid
    from streamflow_tpu.ops.pallas._fused_lookup_kernel import (
        fused_corr_lookup,
        pool_pyramid,
    )

    rng = np.random.default_rng(7)
    B, H, W, C = 1, 24, 240, 32
    f1 = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.float32)
    f2 = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.float32)
    gy, gx = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    coords = np.stack([gx, gy], -1)[None].astype(np.float32)
    coords = jnp.asarray(coords + rng.uniform(-3, 3, (B, H, W, 2)))
    ref = CorrPyramid.build(f1, f2, 4, 4).lookup(coords)
    out = fused_corr_lookup(f1, tuple(pool_pyramid(f2, 4)), coords, radius=4,
                            interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4,
                               rtol=1e-4)


def test_prepare_unprepare_roundtrip():
    """prepare_inputs pads the loop-invariant operands (block-padded f1 rows,
    PAD_L/tile/UNROLL-padded f2 levels); unprepare_inputs must slice the
    originals back out exactly, and the prepared lookup must equal the
    one-shot wrapper."""
    from streamflow_tpu.ops.pallas._fused_lookup_kernel import (
        fused_corr_lookup,
        fused_corr_lookup_prepared,
        pool_pyramid,
        prepare_inputs,
        unprepare_inputs,
    )

    rng = np.random.default_rng(11)
    B, H, W, C = 2, 12, 20, 32
    f1 = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.float32)
    f2 = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.float32)
    levels = tuple(pool_pyramid(f2, 4))
    f1p, f2p, meta = prepare_inputs(f1, levels, radius=4)
    f1r, levels_r = unprepare_inputs(f1p, f2p, meta, H, W)
    np.testing.assert_array_equal(np.asarray(f1r), np.asarray(f1))
    for a, b in zip(levels_r, levels):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    coords = coords_grid(B, H, W) + jnp.asarray(
        rng.uniform(-2, 2, (B, H, W, 2)), jnp.float32)
    out1 = fused_corr_lookup(f1, levels, coords, radius=4, interpret=True)
    out2 = fused_corr_lookup_prepared(f1p, f2p, coords, meta, radius=4,
                                      interpret=True)
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))


def test_fused_lookup_f2_major_c_matches_w():
    """C-major prepared levels (f2_major='c': per-row natively-oriented
    volume matmuls) must produce bit-identical output to the default 'w'
    layout, and unprepare must roundtrip the transposed storage."""
    from streamflow_tpu.ops.pallas._fused_lookup_kernel import (
        fused_corr_lookup_prepared,
        pool_pyramid,
        prepare_inputs,
        unprepare_inputs,
    )

    rng = np.random.default_rng(7)
    B, H, W, C = 2, 12, 20, 32
    f1 = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.float32)
    f2 = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.float32)
    levels = tuple(pool_pyramid(f2, 4))
    coords = coords_grid(B, H, W) + jnp.asarray(
        rng.uniform(-4, 4, (B, H, W, 2)), jnp.float32)

    f1w, f2w, meta = prepare_inputs(f1, levels, radius=4)
    f1c, f2c, meta_c = prepare_inputs(f1, levels, radius=4, f2_major="c")
    assert meta == meta_c
    for lw, lc in zip(f2w, f2c):
        assert lc.shape == (lw.shape[0], lw.shape[1], lw.shape[3],
                            lw.shape[2])

    f1r, levels_r = unprepare_inputs(f1c, f2c, meta, H, W, f2_major="c")
    np.testing.assert_array_equal(np.asarray(f1r), np.asarray(f1))
    for a, b in zip(levels_r, levels):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    out_w = fused_corr_lookup_prepared(f1w, f2w, coords, meta, radius=4,
                                       interpret=True)
    out_c = fused_corr_lookup_prepared(f1c, f2c, coords, meta, radius=4,
                                       interpret=True, f2_major="c")
    np.testing.assert_array_equal(np.asarray(out_w), np.asarray(out_c))


def test_model_pallas_corr_f2_major_c():
    """The cfg.lookup_f2_major='c' path through PallasCorr must match the
    default layout end-to-end (same kernel math, relayouted storage)."""
    from streamflow_tpu.ops.pallas.corr import PallasCorr

    rng = np.random.default_rng(3)
    B, H, W, C = 1, 12, 16, 32
    f1 = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.float32)
    f2 = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.float32)
    coords = coords_grid(B, H, W) + jnp.asarray(
        rng.uniform(-2, 2, (B, H, W, 2)), jnp.float32)

    pw = PallasCorr.build(f1, f2, 4, 4)
    pc = PallasCorr.build(f1, f2, 4, 4, f2_major="c")
    # off-TPU both route through the XLA equivalent via unprepare
    np.testing.assert_allclose(np.asarray(pw.lookup(coords)),
                               np.asarray(pc.lookup(coords)),
                               atol=1e-5, rtol=1e-5)
