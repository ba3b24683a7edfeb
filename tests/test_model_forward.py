"""End-to-end model smoke tests: init + jit-compiled forward on tiny shapes
(the automated analogue of the reference's __main__ smoke blocks, SURVEY §4).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from streamflow_tpu.config import StreamFlowConfig, RAFTConfig
from streamflow_tpu.models import create_model

# Tiny-but-structured shapes: H, W divisible by 8; 1/8-res dims stay >= 8 so
# all 4 pyramid levels are non-degenerate.
H, W, T = 64, 96, 4


@pytest.fixture(scope="module")
def sf_model_and_params():
    cfg = StreamFlowConfig(T=T, iters=2, mixed_precision=False)
    model = create_model("streamflow", cfg=cfg)
    imgs = jnp.asarray(
        np.random.default_rng(0).integers(0, 255, (1, T, H, W, 3)).astype(np.float32)
    )
    # init must be jitted: eager op-by-op dispatch is pathologically slow in
    # this environment (each op compiles separately).
    params = jax.jit(lambda k, x: model.init(k, x, test_mode=True))(
        jax.random.PRNGKey(0), imgs
    )
    return model, params, imgs


def test_streamflow_test_mode(sf_model_and_params):
    model, params, imgs = sf_model_and_params
    fwd = jax.jit(lambda p, x: model.apply(p, x, test_mode=True))
    flows = fwd(params, imgs)
    assert flows.shape == (1, T - 1, H, W, 2)
    assert np.isfinite(np.asarray(flows)).all()


@pytest.mark.slow
def test_streamflow_train_mode_emits_per_iter(sf_model_and_params):
    model, params, imgs = sf_model_and_params
    preds = model.apply(params, imgs, iters=2)
    assert preds.shape == (2, 1, T - 1, H, W, 2)
    assert np.isfinite(np.asarray(preds)).all()


def test_streamflow_warm_start(sf_model_and_params):
    model, params, imgs = sf_model_and_params
    finit = jnp.zeros((1, T - 1, H // 8, W // 8, 2))
    flows, lowres = model.apply(params, imgs, test_mode=True, flow_init=finit)
    assert flows.shape == (1, T - 1, H, W, 2)
    assert lowres.shape == (1, T - 1, H // 8, W // 8, 2)


def test_raft_forward():
    cfg = RAFTConfig(iters=2, mixed_precision=False)
    model = create_model("raft", cfg=cfg)
    rng = np.random.default_rng(1)
    im1 = jnp.asarray(rng.integers(0, 255, (1, H, W, 3)).astype(np.float32))
    im2 = jnp.asarray(rng.integers(0, 255, (1, H, W, 3)).astype(np.float32))
    params = jax.jit(lambda k, a, b: model.init(k, a, b, test_mode=True))(
        jax.random.PRNGKey(0), im1, im2
    )
    lowres, up = jax.jit(lambda p, a, b: model.apply(p, a, b, test_mode=True))(
        params, im1, im2
    )
    assert up.shape == (1, H, W, 2)
    assert lowres.shape == (1, H // 8, W // 8, 2)


def test_zero_init_temporal_block_is_identity():
    """zero_module semantics (reference core/update.py:453-457): at init the
    temporal transformer must be an exact identity."""
    from streamflow_tpu.layers.temporal import TemporalLayer

    x = jnp.asarray(np.random.default_rng(2).standard_normal((2, 3, 4, 5, 16)),
                    dtype=jnp.float32)
    layer = TemporalLayer(dim=16)
    params = layer.init(jax.random.PRNGKey(0), x)
    y = layer.apply(params, x)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(x))


def test_noinit_temporal_block_is_live_at_init():
    """TemporalLayer_noinit (reference core/update.py:516-527): the same
    graph with standard init — NOT an identity at init (no zero_module
    gating), which is the entire point of the ablation."""
    from streamflow_tpu.layers.temporal import TemporalLayer

    x = jnp.asarray(np.random.default_rng(2).standard_normal((2, 3, 4, 5, 16)),
                    dtype=jnp.float32)
    layer = TemporalLayer(dim=16, zero_init=False)
    params = layer.init(jax.random.PRNGKey(0), x)
    y = layer.apply(params, x)
    assert np.abs(np.asarray(y) - np.asarray(x)).max() > 1e-3
    # Same parameter tree as the zero-init variant (checkpoint-compatible).
    zp = TemporalLayer(dim=16).init(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(params) == \
        jax.tree_util.tree_structure(zp)


def test_update_block_variants_forward():
    """sk_tam_v1 (per-frame flow head) and sk_tam_v3_noinit wire through the
    full model (reference core/update.py:691-735, :787-832)."""
    from streamflow_tpu.config import StreamFlowConfig
    from streamflow_tpu.models import create_model

    for ub in ("sk_tam_v1", "sk_tam_v3_noinit"):
        cfg = StreamFlowConfig(T=4, iters=2, mixed_precision=False,
                               update_block=ub)
        model = create_model("streamflow", cfg=cfg)
        imgs = jnp.asarray(
            np.random.default_rng(0).integers(0, 255, (1, 4, 64, 64, 3)),
            dtype=jnp.float32)
        params = model.init(jax.random.PRNGKey(0), imgs, test_mode=True)
        flows = model.apply(params, imgs, test_mode=True)
        assert flows.shape == (1, 3, 64, 64, 2)
        assert np.isfinite(np.asarray(flows)).all()


def test_gma_aggregate_zero_gamma_is_identity():
    """gamma starts at zero (core/gma.py:84): aggregate(attn, x) == x at init."""
    from streamflow_tpu.layers.gma import GMAAttention, GMAAggregate

    rng = np.random.default_rng(3)
    fmap = jnp.asarray(rng.standard_normal((2, 6, 7, 16)), dtype=jnp.float32)
    att = GMAAttention(heads=1, dim_head=16)
    ap = att.init(jax.random.PRNGKey(1), fmap)
    attn = att.apply(ap, fmap)
    agg = GMAAggregate(heads=1, dim_head=16)
    gp = agg.init(jax.random.PRNGKey(2), attn, fmap)
    out = agg.apply(gp, attn, fmap)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(fmap))
