"""Fused locally-grouped attention Pallas kernel (ops/pallas/_lga_kernel.py):
parity vs the XLA composite in interpret mode, the custom_vjp gradient path,
and the LocallyGroupedAttn module plumbing."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from streamflow_tpu.ops.pallas._lga_kernel import lga_attention
from streamflow_tpu.layers.twins import LocallyGroupedAttn, lga_xla


def _weights(rng, c, dtype=jnp.float32):
    wqkv = jnp.asarray(0.2 * rng.standard_normal((c, 3 * c)), dtype)
    bqkv = jnp.asarray(0.1 * rng.standard_normal((3 * c,)), dtype)
    wproj = jnp.asarray(0.2 * rng.standard_normal((c, c)), dtype)
    bproj = jnp.asarray(0.1 * rng.standard_normal((c,)), dtype)
    return wqkv, bqkv, wproj, bproj


@pytest.mark.parametrize("shape,nh,ws", [
    ((1, 14, 21, 128), 4, 7),
    ((2, 7, 14, 256), 8, 7),
    ((1, 10, 15, 128), 4, 5),
])
def test_lga_kernel_matches_xla(shape, nh, ws):
    """Head-major attention kernel (v2, hybrid: qkv/proj stay XLA) vs the
    composite, interpret mode."""
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    wqkv, bqkv, wproj, bproj = _weights(rng, shape[-1])
    ref = lga_xla(x, wqkv, bqkv, wproj, bproj, ws=ws, nh=nh)
    qkv = jnp.einsum("bhwc,cd->bhwd", x, wqkv) + bqkv
    out = lga_attention(qkv, ws=ws, nh=nh, interpret=True)
    out = jnp.einsum("bhwc,cd->bhwd", out, wproj) + bproj
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4,
                               rtol=2e-4)


def test_lga_fused_grad_matches_xla(monkeypatch):
    """jax.grad through the REAL _lga_fused custom_vjp (forward in interpret
    mode) matches autodiff of lga_xla."""
    import functools

    from streamflow_tpu.ops.pallas import _lga_kernel as K
    from streamflow_tpu.layers import twins as T

    monkeypatch.setattr(
        K, "lga_attention", functools.partial(K.lga_attention, interpret=True))

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((1, 14, 14, 128)), jnp.float32)
    args = _weights(rng, 128)

    def f_ref(x, *w):
        return jnp.sum(lga_xla(x, *w, ws=7, nh=4) ** 2)

    def f_kernel(x, *w):
        return jnp.sum(T._lga_fused(x, *w, 7, 4) ** 2)

    v_ref, g_ref = jax.value_and_grad(f_ref, argnums=(0, 1, 2, 3, 4))(x, *args)
    v_k, g_k = jax.value_and_grad(f_kernel, argnums=(0, 1, 2, 3, 4))(x, *args)
    np.testing.assert_allclose(float(v_k), float(v_ref), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(g_k),
                    jax.tree_util.tree_leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-3,
                                   rtol=5e-3)


def test_lga_module_impl_param_compat():
    """impl='pallas' and 'xla' share identical param trees and outputs on CPU
    (the pallas gate falls back off-TPU); grid sizes that need padding are
    covered (edge windows see bias-valued pad keys in both paths)."""
    rng = np.random.default_rng(2)
    ht, w, c = 11, 18, 128
    x = jnp.asarray(rng.standard_normal((2, ht * w, c)), jnp.float32)
    m1 = LocallyGroupedAttn(c, 4, ws=7, impl="xla")
    m2 = LocallyGroupedAttn(c, 4, ws=7, impl="pallas")
    p1 = m1.init(jax.random.PRNGKey(0), x, (ht, w))
    p2 = m2.init(jax.random.PRNGKey(0), x, (ht, w))
    assert (jax.tree_util.tree_structure(p1)
            == jax.tree_util.tree_structure(p2))
    y1 = m1.apply(p1, x, (ht, w))
    y2 = m2.apply(p1, x, (ht, w))
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=1e-6)
