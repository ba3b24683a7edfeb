"""SKBlock's TPU-only fused dispatch (ffn_pair / pw_ffn_pair / dw_chain),
driven on CPU by faking the backend check and running the Pallas kernels in
interpret mode — covers the WIRING (weight collection, padding, stage
ordering), not just the kernel math the per-kernel tests already cover."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest


@pytest.fixture
def fused_on_cpu(monkeypatch):
    from streamflow_tpu.ops.pallas import _dw_conv_kernel as DW
    from streamflow_tpu.ops.pallas import _ffn_kernel as FFN

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    monkeypatch.setattr(
        DW, "_dw_chain_fwd",
        functools.partial(DW._dw_chain_fwd, interpret=True))
    monkeypatch.setattr(
        FFN, "_ffn_pair_fwd",
        functools.partial(FFN._ffn_pair_fwd, block_n=256, interpret=True))


@pytest.mark.parametrize("dw_impl",
                         ["pallas", "xla_cond", "xla_cond_sep", "banded"])
def test_skblock_fused_path_matches_unfused(fused_on_cpu, dw_impl):
    """dw_impl='pallas' (dw chain kernel + fused FFN pairs incl. the pw
    pre-stage) and 'xla_cond' (cond-shielded convs + fused FFN pairs) on the
    fake-TPU backend match the plain XLA path within fp32 reassociation."""
    from streamflow_tpu.layers.sk import SKBlock

    rng = np.random.default_rng(0)
    # c_in lane-aligned so the pallas dw gate opens
    x = jnp.asarray(rng.standard_normal((2, 12, 16, 256)), jnp.float32)
    m_ref = SKBlock(192, (1, 15), dw_impl="xla")
    m_fused = SKBlock(192, (1, 15), dw_impl=dw_impl)
    p = m_ref.init(jax.random.PRNGKey(0), x)
    assert (jax.tree_util.tree_structure(p)
            == jax.tree_util.tree_structure(
                m_fused.init(jax.random.PRNGKey(0), x)))
    y_ref = m_ref.apply(p, x)
    y_fused = m_fused.apply(p, x)
    np.testing.assert_allclose(np.asarray(y_fused), np.asarray(y_ref),
                               atol=2e-4, rtol=2e-4)


def test_mlp_fused_matches_unfused(fused_on_cpu):
    """Mlp(fused=True) (Twins encoder MLP through the ffn_pair kernel) keeps
    the nn.Dense param tree and matches the composite."""
    from streamflow_tpu.layers.common import Mlp

    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((2, 40, 128)), jnp.float32)
    m_ref = Mlp(512, 128)
    m_fused = Mlp(512, 128, fused=True)
    p = m_ref.init(jax.random.PRNGKey(0), x)
    assert (jax.tree_util.tree_structure(p)
            == jax.tree_util.tree_structure(
                m_fused.init(jax.random.PRNGKey(0), x)))
    np.testing.assert_allclose(
        np.asarray(m_fused.apply(p, x)), np.asarray(m_ref.apply(p, x)),
        atol=2e-4, rtol=2e-4)


def test_skblock_fused_grad(fused_on_cpu):
    """Autodiff through the fused SKBlock (custom_vjp recompute backwards)
    matches the plain XLA path."""
    from streamflow_tpu.layers.sk import SKBlock

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((1, 10, 12, 128)), jnp.float32)
    m_ref = SKBlock(128, (1, 7), dw_impl="xla")
    m_fused = SKBlock(128, (1, 7), dw_impl="xla_cond")
    p = m_ref.init(jax.random.PRNGKey(0), x)
    g_ref = jax.grad(lambda p: jnp.sum(m_ref.apply(p, x) ** 2))(p)
    g_fused = jax.grad(lambda p: jnp.sum(m_fused.apply(p, x) ** 2))(p)
    for a, b in zip(jax.tree_util.tree_leaves(g_fused),
                    jax.tree_util.tree_leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-3,
                                   rtol=5e-3)
