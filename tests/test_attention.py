"""Flash attention: streaming XLA implementation vs naive reference, plus the
Pallas TPU kernel in interpret mode (runs the real kernel logic on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from streamflow_tpu.ops.pallas.attention import _flash_xla, flash_attention

RNG = np.random.default_rng(0)


def naive(q, k, v):
    s = jnp.einsum("bhnd,bhmd->bhnm", q, k).astype(jnp.float32)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhnm,bhmd->bhnd", p, v.astype(jnp.float32))


@pytest.mark.parametrize("nq,nk", [(64, 64), (100, 260)])
def test_flash_xla_matches_naive(nq, nk):
    b, h, d = 2, 2, 32
    q = jnp.asarray(RNG.standard_normal((b, h, nq, d)), jnp.float32)
    k = jnp.asarray(RNG.standard_normal((b, h, nk, d)), jnp.float32)
    v = jnp.asarray(RNG.standard_normal((b, h, nk, d)), jnp.float32)
    got = _flash_xla(q, k, v, kv_chunk=64)
    want = naive(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


def test_flash_entrypoint_applies_scale():
    b, h, n, d = 1, 1, 48, 16
    q = jnp.asarray(RNG.standard_normal((b, h, n, d)), jnp.float32)
    k = jnp.asarray(RNG.standard_normal((b, h, n, d)), jnp.float32)
    v = jnp.asarray(RNG.standard_normal((b, h, n, d)), jnp.float32)
    got = flash_attention(q, k, v, scaled=False)
    want = naive(q * d ** -0.5, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


def test_pallas_kernel_interpret_mode():
    """Run the actual Pallas kernel body via the interpreter on CPU."""
    from jax.experimental.pallas import tpu as pltpu

    from streamflow_tpu.ops.pallas import _attention_kernel as ak

    b, h, nq, nk, d = 1, 1, 256, 384, 128
    q = jnp.asarray(RNG.standard_normal((b, h, nq, d)), jnp.float32)
    k = jnp.asarray(RNG.standard_normal((b, h, nk, d)), jnp.float32)
    v = jnp.asarray(RNG.standard_normal((b, h, nk, d)), jnp.float32)

    with pltpu.force_tpu_interpret_mode():
        got = ak.flash_attention_tpu(q, k, v, block_q=128, block_k=128)
    want = naive(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-4, rtol=2e-4)


def test_flash_attention_grad():
    """attn_impl='flash' must be trainable: custom VJP matches naive grads."""
    b, h, n, d = 1, 1, 40, 16
    q = jnp.asarray(RNG.standard_normal((b, h, n, d)), jnp.float32)
    k = jnp.asarray(RNG.standard_normal((b, h, n, d)), jnp.float32)
    v = jnp.asarray(RNG.standard_normal((b, h, n, d)), jnp.float32)

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v) ** 2)

    def loss_naive(q, k, v):
        return jnp.sum(naive(q * d ** -0.5, k, v) ** 2)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gn = jax.grad(loss_naive, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(gf, gn):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=1e-4, rtol=1e-4)


def test_spatiotemporal_and_tmm_aggregates_identity_at_init():
    """Reference SpatioTemporalAggregate/SpatioTemporalAggregate2/TMMAggregate
    (core/gma.py:140-191, 214-256, 261-300): zero-init gammas make every
    variant the identity at init; shapes are preserved."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from streamflow_tpu.layers.gma import (
        SpatioTemporalAggregate,
        SpatioTemporalAggregate2,
        TMMAggregate,
    )

    rng = np.random.default_rng(0)
    bf, h, w, c = 3, 6, 8, 128
    fmap = jnp.asarray(rng.standard_normal((bf, h, w, c)), jnp.float32)
    attn = jax.nn.softmax(
        jnp.asarray(rng.standard_normal((bf, 1, h * w, h * w)), jnp.float32),
        -1)
    tattn = jax.nn.softmax(
        jnp.asarray(rng.standard_normal((1, 1, h * w, h * w)), jnp.float32),
        -1)

    m = SpatioTemporalAggregate(heads=1, dim_head=c)
    p = m.init(jax.random.PRNGKey(0), attn, jnp.repeat(tattn, bf, 0), fmap)
    y = m.apply(p, attn, jnp.repeat(tattn, bf, 0), fmap)
    np.testing.assert_allclose(np.asarray(y), np.asarray(fmap), atol=1e-6)

    joint = jax.nn.softmax(
        jnp.asarray(rng.standard_normal((1, 1, h * 3 * w, h * 3 * w)),
                    jnp.float32), -1)
    m2 = SpatioTemporalAggregate2(num_frames=3, heads=1, dim_head=c)
    p2 = m2.init(jax.random.PRNGKey(0), joint, fmap)
    y2 = m2.apply(p2, joint, fmap)
    assert y2.shape == fmap.shape
    np.testing.assert_allclose(np.asarray(y2), np.asarray(fmap), atol=1e-6)

    m3 = TMMAggregate(num_frames=3, heads=1, dim_head=c)
    p3 = m3.init(jax.random.PRNGKey(0), attn, tattn, fmap)
    y3 = m3.apply(p3, attn, tattn, fmap)
    assert y3.shape == fmap.shape
    np.testing.assert_allclose(np.asarray(y3), np.asarray(fmap), atol=1e-6)


def test_pallas_fwd_lse_interpret_mode():
    """return_lse: the emitted logsumexp matches the naive row logsumexp."""
    from jax.experimental.pallas import tpu as pltpu

    from streamflow_tpu.ops.pallas import _attention_kernel as ak

    b, h, nq, nk, d = 1, 1, 256, 300, 128
    q = jnp.asarray(RNG.standard_normal((b, h, nq, d)), jnp.float32)
    k = jnp.asarray(RNG.standard_normal((b, h, nk, d)), jnp.float32)
    v = jnp.asarray(RNG.standard_normal((b, h, nk, d)), jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        o, lse = ak.flash_attention_tpu(q, k, v, block_q=128, block_k=128,
                                        return_lse=True)
    s = jnp.einsum("bhnd,bhmd->bhnm", q, k)
    want_lse = jax.scipy.special.logsumexp(s, axis=-1)
    np.testing.assert_allclose(np.asarray(o), np.asarray(naive(q, k, v)),
                               atol=2e-4, rtol=2e-4)
    np.testing.assert_allclose(np.asarray(lse), np.asarray(want_lse),
                               atol=2e-4, rtol=2e-4)


@pytest.mark.parametrize("nq,nk", [(256, 256), (200, 300)])
def test_pallas_bwd_kernels_interpret_mode(nq, nk):
    """The Pallas backward (dq/dkv recompute kernels) matches jax.grad of
    the naive attention, including padded (non-multiple-of-block) shapes."""
    from jax.experimental.pallas import tpu as pltpu

    from streamflow_tpu.ops.pallas import _attention_kernel as ak

    b, h, d = 1, 2, 128
    q = jnp.asarray(RNG.standard_normal((b, h, nq, d)), jnp.float32)
    k = jnp.asarray(RNG.standard_normal((b, h, nk, d)), jnp.float32)
    v = jnp.asarray(RNG.standard_normal((b, h, nk, d)), jnp.float32)
    g = jnp.asarray(RNG.standard_normal((b, h, nq, d)), jnp.float32)

    def f(q, k, v):
        return jnp.sum(naive(q, k, v) * g)

    want = jax.grad(f, argnums=(0, 1, 2))(q, k, v)

    with pltpu.force_tpu_interpret_mode():
        o, lse = ak.flash_attention_tpu(q, k, v, block_q=128, block_k=128,
                                        return_lse=True)
        delta = jnp.sum(g * o, axis=-1)
        got = ak.flash_attention_bwd_tpu(q, k, v, g, lse, delta,
                                         block_q=128, block_k=128)
    for a, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(a), np.asarray(w),
                                   atol=5e-4, rtol=5e-4)
