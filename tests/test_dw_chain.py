"""Fused depthwise-chain Pallas kernel (ops/pallas/_dw_conv_kernel.py):
parity vs the XLA composite (interpret mode on CPU), gradient path, and the
SKBlock dispatch plumbing."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from streamflow_tpu.ops.pallas._dw_conv_kernel import (
    _dw_chain_fwd,
    chain_xla,
    dw_chain,
)


def _stages(rng, ks, c, dtype=jnp.float32):
    ws = tuple(jnp.asarray(0.3 * rng.standard_normal((k, k, c)), dtype)
               for k in ks)
    bs = tuple(jnp.asarray(0.1 * rng.standard_normal((c,)), dtype)
               for k in ks)
    return ws, bs


@pytest.mark.parametrize("shape,ks", [
    ((2, 20, 24, 128), (1, 15)),
    ((2, 55, 40, 256), (1, 7)),
    ((1, 9, 16, 128), (15,)),
    ((1, 33, 24, 128), (1, 15)),   # H not a strip multiple (tail overlap)
])
def test_dw_chain_matches_xla(shape, ks):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    ws, bs = _stages(rng, ks, shape[-1])
    ref = chain_xla(x, tuple(zip(ws, bs)))
    out = _dw_chain_fwd(x, ws, bs, ks, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-5,
                               rtol=5e-5)


def test_dw_chain_grad_matches_xla(monkeypatch):
    """jax.grad through the REAL dw_chain custom_vjp (_fwd/_bwd wiring, the
    path training with corr_impl='pallas' hits) matches autodiff of
    chain_xla. The Pallas forward runs in interpret mode on CPU."""
    import functools

    from streamflow_tpu.ops.pallas import _dw_conv_kernel as K

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((1, 12, 16, 128)), jnp.float32)
    ws, bs = _stages(rng, (1, 7), 128)

    monkeypatch.setattr(
        K, "_dw_chain_fwd", functools.partial(K._dw_chain_fwd, interpret=True)
    )

    def f_ref(x, ws, bs):
        return jnp.sum(chain_xla(x, tuple(zip(ws, bs))) ** 2)

    def f_kernel(x, ws, bs):
        return jnp.sum(K.dw_chain(x, ws, bs, (1, 7)) ** 2)

    v_ref, g_ref = jax.value_and_grad(f_ref, argnums=(0, 1, 2))(x, ws, bs)
    v_k, g_k = jax.value_and_grad(f_kernel, argnums=(0, 1, 2))(x, ws, bs)
    np.testing.assert_allclose(float(v_k), float(v_ref), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(g_k),
                    jax.tree_util.tree_leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4,
                                   rtol=1e-4)


def test_skblock_dispatch_param_compat():
    """SKBlock produces identical params and outputs for dw_impl xla/auto on
    CPU (pallas gate falls back off-TPU)."""
    from streamflow_tpu.layers.sk import SKBlock

    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((2, 10, 12, 324)), jnp.float32)
    m1 = SKBlock(256, (1, 15), dw_impl="xla")
    m2 = SKBlock(256, (1, 15), dw_impl="auto")
    p1 = m1.init(jax.random.PRNGKey(0), x)
    p2 = m2.init(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(p1) == jax.tree_util.tree_structure(p2)
    y1 = m1.apply(p1, x)
    y2 = m2.apply(p1, x)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=1e-6)


@pytest.mark.parametrize(
    "impl", ["shift", "xla_cond", "xla_cond_f32", "xla_cond_fence",
             "xla_cond_bfold", "xla_cond_cfold", "xla_cond_cfoldo",
             "banded", "banded_mxu", "banded_chain"])
def test_skblock_alt_dw_matches_xla(impl):
    """Alternate dw implementations — 'shift' (k^2 statically-shifted FMA
    taps, conv-HLO-free), 'xla_cond' (XLA conv shielded inside a lax.cond
    branch computation; the TPU default next to the Mosaic lookup), and its
    '_f32' (f32 conv accumulation) / '_fence' (optimization_barrier around
    each in-branch conv) variants — are
    numerically identical to the plain XLA depthwise conv path, params and
    grads included."""
    from streamflow_tpu.layers.sk import SKBlock

    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((2, 10, 12, 324)), jnp.float32)
    m_xla = SKBlock(256, (1, 15), dw_impl="xla")
    m_shift = SKBlock(256, (1, 15), dw_impl=impl)
    p = m_xla.init(jax.random.PRNGKey(0), x)
    assert (jax.tree_util.tree_structure(p)
            == jax.tree_util.tree_structure(
                m_shift.init(jax.random.PRNGKey(0), x)))
    y_xla = m_xla.apply(p, x)
    y_shift = m_shift.apply(p, x)
    np.testing.assert_allclose(np.asarray(y_shift), np.asarray(y_xla),
                               atol=2e-5, rtol=2e-5)

    g_xla = jax.grad(lambda p: jnp.sum(m_xla.apply(p, x) ** 2))(p)
    g_shift = jax.grad(lambda p: jnp.sum(m_shift.apply(p, x) ** 2))(p)
    for a, b in zip(jax.tree_util.tree_leaves(g_shift),
                    jax.tree_util.tree_leaves(g_xla)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-3,
                                   rtol=2e-3)


@pytest.mark.parametrize("shape,k", [
    ((3, 20, 24, 128), 15),
    ((1, 9, 16, 64), 7),
    ((2, 33, 24, 96), 15),
])
def test_banded_mxu_kernel_matches_conv(shape, k):
    """The VMEM-fused banded-MXU dw kernel (interpret mode on CPU) matches
    the plain depthwise conv and the XLA banded composite."""
    import jax.lax as lax

    from streamflow_tpu.ops.pallas._banded_dw_kernel import (
        _dw_banded_mxu_fwd,
        dw_banded_xla,
    )

    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    w = jnp.asarray(0.3 * rng.standard_normal((k, k, shape[-1])), jnp.float32)
    b = jnp.asarray(0.1 * rng.standard_normal((shape[-1],)), jnp.float32)

    ref = lax.conv_general_dilated(
        x, w[:, :, None, :], (1, 1), [(k // 2, k // 2)] * 2,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=shape[-1],
    ) + b
    np.testing.assert_allclose(np.asarray(dw_banded_xla(x, w, b)),
                               np.asarray(ref), atol=2e-4, rtol=2e-4)
    out = _dw_banded_mxu_fwd(x, w, b, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4,
                               rtol=2e-4)


def test_banded_mxu_grad_matches_xla(monkeypatch):
    """jax.grad through the real dw_banded_mxu custom_vjp (forward kernel in
    interpret mode) matches autodiff of the XLA banded composite."""
    import functools

    from streamflow_tpu.ops.pallas import _banded_dw_kernel as K

    rng = np.random.default_rng(8)
    x = jnp.asarray(rng.standard_normal((1, 10, 16, 64)), jnp.float32)
    w = jnp.asarray(0.3 * rng.standard_normal((7, 7, 64)), jnp.float32)
    b = jnp.asarray(0.1 * rng.standard_normal((64,)), jnp.float32)

    monkeypatch.setattr(
        K, "_dw_banded_mxu_fwd",
        functools.partial(K._dw_banded_mxu_fwd, interpret=True))

    f_ref = lambda *a: jnp.sum(K.dw_banded_xla(*a) ** 2)
    f_k = lambda *a: jnp.sum(K.dw_banded_mxu(*a) ** 2)
    v_ref, g_ref = jax.value_and_grad(f_ref, argnums=(0, 1, 2))(x, w, b)
    v_k, g_k = jax.value_and_grad(f_k, argnums=(0, 1, 2))(x, w, b)
    np.testing.assert_allclose(float(v_k), float(v_ref), rtol=1e-5)
    for a, bb in zip(jax.tree_util.tree_leaves(g_k),
                     jax.tree_util.tree_leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb), atol=1e-4,
                                   rtol=1e-4)


@pytest.mark.parametrize("shape,ks", [
    ((3, 20, 24, 128), (1, 15)),
    ((2, 12, 16, 64), (1, 7)),
    ((1, 9, 16, 64), (15,)),
])
def test_sk_chain_banded_kernel(shape, ks):
    """The fused SK dw-chain kernel (k1 elementwise + banded MXU conv +
    residual gelus, interpret mode) matches both the XLA banded composite
    and the plain gelu(x + conv(x)) stack."""
    import jax.lax as lax

    from streamflow_tpu.layers.common import gelu
    from streamflow_tpu.ops.pallas._banded_dw_kernel import (
        _sk_chain_banded_fwd,
        sk_chain_banded_xla,
    )

    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    ws = tuple(jnp.asarray(0.3 * rng.standard_normal((k, k, shape[-1])),
                           jnp.float32) for k in ks)
    bs = tuple(jnp.asarray(0.1 * rng.standard_normal((shape[-1],)),
                           jnp.float32) for k in ks)

    ref = x
    for w, b, k in zip(ws, bs, ks):
        y = lax.conv_general_dilated(
            ref, w[:, :, None, :], (1, 1), [(k // 2, k // 2)] * 2,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=shape[-1],
        ) + b
        ref = gelu(ref + y)

    comp = sk_chain_banded_xla(x, ws, bs, ks)
    np.testing.assert_allclose(np.asarray(comp), np.asarray(ref), atol=2e-4,
                               rtol=2e-4)
    out = _sk_chain_banded_fwd(x, ws, bs, ks, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4,
                               rtol=2e-4)


def test_sk_chain_banded_grad(monkeypatch):
    """jax.grad through sk_chain_banded's custom_vjp (interpret forward)
    matches autodiff of the XLA banded composite."""
    import functools

    from streamflow_tpu.ops.pallas import _banded_dw_kernel as K

    rng = np.random.default_rng(12)
    x = jnp.asarray(rng.standard_normal((1, 10, 16, 64)), jnp.float32)
    ks = (1, 7)
    ws = tuple(jnp.asarray(0.3 * rng.standard_normal((k, k, 64)), jnp.float32)
               for k in ks)
    bs = tuple(jnp.asarray(0.1 * rng.standard_normal((64,)), jnp.float32)
               for k in ks)

    monkeypatch.setattr(
        K, "_sk_chain_banded_fwd",
        functools.partial(K._sk_chain_banded_fwd, interpret=True))

    f_ref = lambda *a: jnp.sum(K.sk_chain_banded_xla(*a, ks) ** 2)
    f_k = lambda *a: jnp.sum(K.sk_chain_banded(*a, ks) ** 2)
    v_ref, g_ref = jax.value_and_grad(f_ref, argnums=(0, 1, 2))(x, ws, bs)
    v_k, g_k = jax.value_and_grad(f_k, argnums=(0, 1, 2))(x, ws, bs)
    np.testing.assert_allclose(float(v_k), float(v_ref), rtol=1e-5)
    for a, bb in zip(jax.tree_util.tree_leaves(g_k),
                     jax.tree_util.tree_leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb), atol=1e-4,
                                   rtol=1e-4)


def test_conv3x3_as_dot_matches_nn_conv():
    """Conv3x3AsDot (im2col+matmul) is bit-compatible with nn.Conv params
    and numerically equal (MaskHead's conv-free form on the pallas path)."""
    from streamflow_tpu.layers.common import Conv3x3AsDot, conv2d

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((2, 9, 11, 16)), jnp.float32)
    ref_mod = conv2d(24, 3, padding=1)
    dot_mod = Conv3x3AsDot(24)
    p = ref_mod.init(jax.random.PRNGKey(0), x)
    y_ref = ref_mod.apply(p, x)
    y_dot = dot_mod.apply(p, x)
    np.testing.assert_allclose(np.asarray(y_dot), np.asarray(y_ref),
                               atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("shape,k", [
    ((2, 9, 12, 128), 5),
    ((1, 7, 10, 256), 3),
    ((2, 16, 11, 128), 7),
])
def test_banded_mxu_t_kernel_matches_conv(shape, k):
    """The transpose-fused banded-MXU kernel (natural NHWC in/out, interpret
    mode on CPU) matches the plain depthwise conv."""
    import jax.lax as lax

    from streamflow_tpu.ops.pallas._banded_dw_kernel import (
        _dw_banded_mxu_t_fwd,
    )

    rng = np.random.default_rng(13)
    x = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    w = jnp.asarray(0.3 * rng.standard_normal((k, k, shape[-1])), jnp.float32)
    b = jnp.asarray(0.1 * rng.standard_normal((shape[-1],)), jnp.float32)

    ref = lax.conv_general_dilated(
        x, w[:, :, None, :], (1, 1), [(k // 2, k // 2)] * 2,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=shape[-1],
    ) + b
    out = _dw_banded_mxu_t_fwd(x, w, b, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4,
                               rtol=2e-4)


def test_banded_mxu_t_grad_matches_xla(monkeypatch):
    """jax.grad through the real dw_banded_mxu_t custom_vjp (forward kernel
    in interpret mode) matches autodiff of the XLA banded composite."""
    import functools

    from streamflow_tpu.ops.pallas import _banded_dw_kernel as K

    rng = np.random.default_rng(14)
    x = jnp.asarray(rng.standard_normal((1, 10, 16, 128)), jnp.float32)
    w = jnp.asarray(0.3 * rng.standard_normal((7, 7, 128)), jnp.float32)
    b = jnp.asarray(0.1 * rng.standard_normal((128,)), jnp.float32)

    monkeypatch.setattr(
        K, "_dw_banded_mxu_t_fwd",
        functools.partial(K._dw_banded_mxu_t_fwd, interpret=True))

    f_ref = lambda *a: jnp.sum(K.dw_banded_xla(*a) ** 2)
    f_k = lambda *a: jnp.sum(K.dw_banded_mxu_t(*a) ** 2)
    v_ref, g_ref = jax.value_and_grad(f_ref, argnums=(0, 1, 2))(x, w, b)
    v_k, g_k = jax.value_and_grad(f_k, argnums=(0, 1, 2))(x, w, b)
    np.testing.assert_allclose(float(v_k), float(v_ref), rtol=1e-5)
    for a, bb in zip(jax.tree_util.tree_leaves(g_k),
                     jax.tree_util.tree_leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb), atol=1e-4,
                                   rtol=1e-4)
