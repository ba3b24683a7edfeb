"""Fused FFN-pair Pallas kernels (ops/pallas/_ffn_kernel.py): parity vs the
XLA composite in interpret mode on CPU, and the custom_vjp gradient path —
including the pw-residual pre-stage variant (pw_ffn_pair) the SK block's
fused path uses for its pointwise conv + second FFN."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from streamflow_tpu.ops.pallas import _ffn_kernel as K


def _weights(rng, c, ch, co, dtype=jnp.float32):
    return (
        jnp.asarray(0.3 * rng.standard_normal((c, ch)), dtype),
        jnp.asarray(0.1 * rng.standard_normal((ch,)), dtype),
        jnp.asarray(0.3 * rng.standard_normal((ch, co)), dtype),
        jnp.asarray(0.1 * rng.standard_normal((co,)), dtype),
    )


@pytest.mark.parametrize("residual", [True, False])
def test_ffn_pair_matches_xla(residual):
    rng = np.random.default_rng(0)
    c, ch = 128, 192
    co = c if residual else 256
    x = jnp.asarray(rng.standard_normal((2, 6, 40, c)), jnp.float32)
    w1, b1, w2, b2 = _weights(rng, c, ch, co)
    ref = K.ffn_pair_xla(x, w1, b1, w2, b2, residual=residual)
    out = K._ffn_pair_fwd(x, w1, b1, w2, b2, residual=residual,
                          block_n=256, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-5,
                               rtol=5e-5)


def test_pw_ffn_pair_matches_xla():
    rng = np.random.default_rng(1)
    c, ch, co = 128, 192, 256
    x = jnp.asarray(rng.standard_normal((1, 9, 40, c)), jnp.float32)
    wp = jnp.asarray(0.3 * rng.standard_normal((c, c)), jnp.float32)
    bp = jnp.asarray(0.1 * rng.standard_normal((c,)), jnp.float32)
    w1, b1, w2, b2 = _weights(rng, c, ch, co)
    ref = K.ffn_pair_xla(x, w1, b1, w2, b2, residual=False, wp=wp, bp=bp)
    out = K._ffn_pair_fwd(x, w1, b1, w2, b2, wp=wp, bp=bp, residual=False,
                          block_n=256, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-5,
                               rtol=5e-5)


def test_pw_ffn_pair_grad_matches_xla(monkeypatch):
    """jax.grad through the REAL pw_ffn_pair custom_vjp (forward in interpret
    mode) matches autodiff of the XLA composite."""
    monkeypatch.setattr(
        K, "_ffn_pair_fwd",
        functools.partial(K._ffn_pair_fwd, block_n=256, interpret=True))

    rng = np.random.default_rng(2)
    c, ch, co = 128, 192, 128
    x = jnp.asarray(rng.standard_normal((1, 4, 32, c)), jnp.float32)
    wp = jnp.asarray(0.3 * rng.standard_normal((c, c)), jnp.float32)
    bp = jnp.asarray(0.1 * rng.standard_normal((c,)), jnp.float32)
    w1, b1, w2, b2 = _weights(rng, c, ch, co)

    def f_ref(*a):
        return jnp.sum(
            K.ffn_pair_xla(a[0], *a[3:], residual=True, wp=a[1], bp=a[2])
            ** 2)

    def f_kernel(*a):
        return jnp.sum(K.pw_ffn_pair(*a, residual=True) ** 2)

    args = (x, wp, bp, w1, b1, w2, b2)
    v_ref, g_ref = jax.value_and_grad(f_ref, argnums=tuple(range(7)))(*args)
    v_k, g_k = jax.value_and_grad(f_kernel, argnums=tuple(range(7)))(*args)
    np.testing.assert_allclose(float(v_k), float(v_ref), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(g_k),
                    jax.tree_util.tree_leaves(g_ref)):
        # fp32 accumulation order differs between the kernel forward and the
        # composite; gradients are O(1e3) here so rtol dominates
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-3,
                                   rtol=5e-3)


def test_ffn_pair_k1_matches_xla():
    """FFN pair + the k==1 dw-stage epilogue (the SK edge-fused layout's
    first kernel)."""
    rng = np.random.default_rng(3)
    c, ch = 128, 192
    x = jnp.asarray(rng.standard_normal((2, 6, 40, c)), jnp.float32)
    w1, b1, w2, b2 = _weights(rng, c, ch, c)
    kw = jnp.asarray(0.3 * rng.standard_normal((c,)), jnp.float32)
    kb = jnp.asarray(0.1 * rng.standard_normal((c,)), jnp.float32)
    ref = K.ffn_pair_xla(x, w1, b1, w2, b2, residual=True, kw=kw, kb=kb)
    out = K._ffn_pair_fwd(x, w1, b1, w2, b2, kw=kw, kb=kb, residual=True,
                          block_n=256, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-5,
                               rtol=5e-5)


def test_dwres_pw_ffn_pair_matches_xla():
    """Residual-gelu prologue + pw + pair (the edge-fused layout's second
    kernel)."""
    rng = np.random.default_rng(4)
    c, ch, co = 128, 192, 256
    x = jnp.asarray(rng.standard_normal((1, 9, 40, c)), jnp.float32)
    y = jnp.asarray(rng.standard_normal((1, 9, 40, c)), jnp.float32)
    db = jnp.asarray(0.1 * rng.standard_normal((c,)), jnp.float32)
    wp = jnp.asarray(0.3 * rng.standard_normal((c, c)), jnp.float32)
    bp = jnp.asarray(0.1 * rng.standard_normal((c,)), jnp.float32)
    w1, b1, w2, b2 = _weights(rng, c, ch, co)
    ref = K.ffn_pair_xla(x, w1, b1, w2, b2, residual=False, wp=wp, bp=bp,
                         yres=y, db=db)
    out = K._ffn_pair_fwd(x, w1, b1, w2, b2, wp=wp, bp=bp, yres=y, db=db,
                          residual=False, block_n=256, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-5,
                               rtol=5e-5)


def test_edge_fused_grads_match_xla(monkeypatch):
    """jax.grad through the REAL ffn_pair_k1 / dwres_pw_ffn_pair custom_vjps
    (forward in interpret mode) matches autodiff of the XLA composites."""
    monkeypatch.setattr(
        K, "_ffn_pair_fwd",
        functools.partial(K._ffn_pair_fwd, block_n=256, interpret=True))

    rng = np.random.default_rng(5)
    c, ch = 128, 192
    x = jnp.asarray(rng.standard_normal((1, 4, 32, c)), jnp.float32)
    yc = jnp.asarray(rng.standard_normal((1, 4, 32, c)), jnp.float32)
    db = jnp.asarray(0.1 * rng.standard_normal((c,)), jnp.float32)
    wp = jnp.asarray(0.3 * rng.standard_normal((c, c)), jnp.float32)
    bp = jnp.asarray(0.1 * rng.standard_normal((c,)), jnp.float32)
    w1, b1, w2, b2 = _weights(rng, c, ch, c)
    kw = jnp.asarray(0.3 * rng.standard_normal((c,)), jnp.float32)
    kb = jnp.asarray(0.1 * rng.standard_normal((c,)), jnp.float32)

    # k1 epilogue
    def f_ref(*a):
        return jnp.sum(K.ffn_pair_xla(a[0], *a[1:5], residual=True,
                                      kw=a[5], kb=a[6]) ** 2)

    def f_k(*a):
        return jnp.sum(K.ffn_pair_k1(*a, residual=True) ** 2)

    args = (x, w1, b1, w2, b2, kw, kb)
    v_ref, g_ref = jax.value_and_grad(f_ref, argnums=tuple(range(7)))(*args)
    v_k, g_k = jax.value_and_grad(f_k, argnums=tuple(range(7)))(*args)
    np.testing.assert_allclose(float(v_k), float(v_ref), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(g_k),
                    jax.tree_util.tree_leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-3,
                                   rtol=5e-3)

    # dw-residual prologue
    def g_ref_f(*a):
        return jnp.sum(K.ffn_pair_xla(a[0], *a[5:], residual=False,
                                      yres=a[1], db=a[2], wp=a[3], bp=a[4])
                       ** 2)

    def g_k_f(*a):
        return jnp.sum(K.dwres_pw_ffn_pair(*a, residual=False) ** 2)

    args2 = (x, yc, db, wp, bp, w1, b1, w2, b2)
    v_ref, g_ref = jax.value_and_grad(g_ref_f, argnums=tuple(range(9)))(*args2)
    v_k, g_k = jax.value_and_grad(g_k_f, argnums=tuple(range(9)))(*args2)
    np.testing.assert_allclose(float(v_k), float(v_ref), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(g_k),
                    jax.tree_util.tree_leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-3,
                                   rtol=5e-3)


def test_poly_gelu_accuracy():
    """The divide-free erf polynomial (cfg.ffn_gelu='poly'): max|gelu error|
    <= 2.5e-3 absolute over a wide input range (the fitted erf bound is
    4.0e-4; the gelu wrap scales it by |x|/2 within the clip window) and the
    kernel output with gelu='poly' matches its own XLA composite exactly."""
    x = jnp.linspace(-12.0, 12.0, 20001, dtype=jnp.float32)
    ref = np.asarray(K._gelu_erf(x))
    out = np.asarray(K._gelu_poly(x))
    assert np.max(np.abs(out - ref)) < 2.5e-3
    # saturated tails: poly gelu ~ identity / zero
    assert abs(float(K._gelu_poly(jnp.float32(10.0))) - 10.0) < 2e-3
    assert abs(float(K._gelu_poly(jnp.float32(-10.0)))) < 2e-3

    rng = np.random.default_rng(7)
    c, ch = 128, 192
    xr = jnp.asarray(rng.standard_normal((2, 6, 40, c)), jnp.float32)
    w1, b1, w2, b2 = _weights(rng, c, ch, c)
    ref = K.ffn_pair_xla(xr, w1, b1, w2, b2, residual=True, gelu="poly")
    out = K._ffn_pair_fwd(xr, w1, b1, w2, b2, residual=True, gelu="poly",
                          block_n=256, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-5,
                               rtol=5e-5)
    # and the poly pair stays within float tolerance of the erf pair
    erf_ref = K.ffn_pair_xla(xr, w1, b1, w2, b2, residual=True)
    assert float(jnp.max(jnp.abs(out - erf_ref))) < 0.05
