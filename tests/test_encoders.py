"""Encoder variants: output shapes + identity-at-init of temporal hooks."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from streamflow_tpu.layers.twins import (
    Twins,
    Twins1DConv,
    Twins3DConv,
    TwinsCSC,
    TwinsTemporalAttention,
)
from streamflow_tpu.layers.basic_encoder import BasicEncoder

RNG = np.random.default_rng(0)
B, T, H, W = 1, 3, 32, 48


def _run(enc, x):
    p = jax.jit(lambda k, a: enc.init(k, a))(jax.random.PRNGKey(0), x)
    return p, np.asarray(jax.jit(lambda p_, a: enc.apply(p_, a))(p, x))


@pytest.mark.parametrize("cls", [TwinsCSC, Twins, Twins1DConv,
                                 TwinsTemporalAttention, Twins3DConv])
def test_twins_variants_shape(cls):
    x = jnp.asarray(RNG.standard_normal((B, T, H, W, 3)), jnp.float32)
    _, y = _run(cls(), x)
    assert y.shape == (B, T, H // 8, W // 8, 256)
    assert np.isfinite(y).all()


def test_temporal_variants_identity_at_init():
    """dirac-init temporal Conv1d and zero-init temporal attention make those
    variants equal plain per-frame Twins at init (flax derives per-param rngs
    from paths, so shared layers get identical weights). Twins3DConv follows
    the reference exactly: dirac conv + residual DOUBLES the features at init
    (core/encoders/twins_3dconv.py:66-68: x = x + temporal_conv(x))."""
    x = jnp.asarray(RNG.standard_normal((B, T, H, W, 3)), jnp.float32)
    _, base = _run(Twins(), x)
    for cls in (Twins1DConv, TwinsTemporalAttention):
        _, y = _run(cls(), x)
        np.testing.assert_allclose(y, base, atol=1e-5, rtol=1e-5,
                                   err_msg=cls.__name__)
    _, y3 = _run(Twins3DConv(), x)
    np.testing.assert_allclose(y3, 2 * base, atol=1e-4, rtol=1e-4)


def test_basic_encoder_norms():
    x = jnp.asarray(RNG.standard_normal((2, H, W, 3)), jnp.float32)
    for norm in ["instance", "batch", "group", "none"]:
        enc = BasicEncoder(output_dim=256, norm_fn=norm)
        variables = jax.jit(lambda k, a: enc.init(k, a))(jax.random.PRNGKey(0), x)
        y = np.asarray(enc.apply(variables, x))
        assert y.shape == (2, H // 8, W // 8, 256)
        assert np.isfinite(y).all()


def test_umt_encoder_shape():
    from streamflow_tpu.layers.umt import UMT

    x = jnp.asarray(RNG.standard_normal((1, 3, 32, 48, 3)), jnp.float32)
    enc = UMT(depth=2)
    p = jax.jit(lambda k, a: enc.init(k, a))(jax.random.PRNGKey(0), x)
    y = np.asarray(jax.jit(lambda p_, a: enc.apply(p_, a))(p, x))
    assert y.shape == (1, 3, 2, 3, 768)
    assert np.isfinite(y).all()


def test_res18_3d_encoder():
    """Res18_3D (reference core/extractor.py:276-356): temporal-attention
    hooks are exact identity at init (zero temporal_fc), so the output must
    equal the plain per-frame CNN with the same spatial parameters' SHAPES;
    here we check shape, dtype and identity-at-init via the gate being zero."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from streamflow_tpu.layers.basic_encoder import Res18_3D

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 3, 32, 48, 3)), jnp.float32)
    enc = Res18_3D(output_dim=256, norm_fn="instance")
    p = jax.jit(enc.init)(jax.random.PRNGKey(0), x)
    y = jax.jit(enc.apply)(p, x)
    assert y.shape == (2, 3, 4, 6, 256)
    assert np.isfinite(np.asarray(y)).all()
    # temporal gate zero-init: permuting frames must permute outputs
    # identically (no temporal mixing at init)
    y2 = jax.jit(enc.apply)(p, x[:, ::-1])
    np.testing.assert_allclose(np.asarray(y2), np.asarray(y)[:, ::-1],
                               atol=1e-5)


def test_attn_basic_encoder():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from streamflow_tpu.layers.basic_encoder import AttnBasicEncoder

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((4, 32, 48, 3)), jnp.float32)  # 2B=4
    enc = AttnBasicEncoder(output_dim=128, norm_fn="instance")
    p = jax.jit(enc.init)(jax.random.PRNGKey(0), x)
    f1, f2, attn = jax.jit(enc.apply)(p, x)
    assert f1.shape == f2.shape == (2, 4, 6, 128)
    n = 8 * 12  # layer2 runs at 1/4 resolution
    assert attn.shape == (2, n, n)
    np.testing.assert_allclose(np.asarray(attn).sum(-1), 1.0, atol=1e-4)


def test_streamflow_res18_3d_forward():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from streamflow_tpu.config import StreamFlowConfig
    from streamflow_tpu.models import create_model

    cfg = StreamFlowConfig(T=4, iters=1, mixed_precision=False,
                           encoder="res18_3d")
    m = create_model("streamflow", cfg=cfg)
    imgs = jnp.asarray(np.random.default_rng(2).integers(
        0, 255, (1, 4, 32, 48, 3)), jnp.float32)
    p = jax.jit(lambda k, a: m.init(k, a, test_mode=True))(
        jax.random.PRNGKey(0), imgs)
    out = jax.jit(lambda p_, a: m.apply(p_, a, test_mode=True))(p, imgs)
    assert out.shape == (1, 3, 32, 48, 2)


def test_patchify_conv_matches_nn_conv():
    """conv2d's stride==kernel VALID dispatch (PatchifyConv: space-to-depth
    + matmul) is numerically and parameter-layout identical to nn.Conv,
    including the crop of rows/cols beyond the last whole patch (odd H)."""
    import flax.linen as nn
    import jax
    import jax.numpy as jnp
    import numpy as np
    from streamflow_tpu.layers.common import conv2d

    rng = np.random.default_rng(3)
    for (h, w, cin, k, feat) in [(16, 24, 3, 4, 32), (55, 36, 8, 2, 16),
                                 (33, 33, 4, 16, 24)]:
        x = jnp.asarray(rng.standard_normal((2, h, w, cin)), jnp.float32)
        fast = conv2d(feat, k, stride=k, padding="VALID", name="proj")
        from streamflow_tpu.layers.common import PatchifyConv

        assert isinstance(fast, PatchifyConv)
        ref = nn.Conv(feat, (k, k), strides=(k, k), padding="VALID")
        p = jax.jit(fast.init)(jax.random.PRNGKey(0), x)
        # identical parameter layout: nn.Conv params drop straight in
        y_fast = jax.jit(fast.apply)(p, x)
        y_ref = jax.jit(ref.apply)(p, x)
        assert y_fast.shape == y_ref.shape == (2, h // k, w // k, feat)
        np.testing.assert_allclose(np.asarray(y_fast), np.asarray(y_ref),
                                   atol=2e-5)
