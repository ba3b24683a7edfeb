"""Blocked (flash-style) attention: softmax(q k^T) v without materializing the
(N, N) score matrix — the TPU replacement for the reference's optional
flash-attn path (demo.py:240-254, test_memory.py:248).

Two implementations behind one entry point:
- ``_flash_xla``: streaming-softmax over kv chunks with lax.scan. Runs on any
  backend (used on CPU and as the reference implementation in tests).
- ``_flash_pallas``: Pallas TPU kernel (ops/pallas/_attention_kernel.py),
  VMEM-blocked with fp32 accumulators.

q, k, v: (B, H, N, D). ``scaled=True`` means q already carries the 1/sqrt(D)
factor (GMAAttention pre-scales q, matching the reference core/gma.py:59).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _flash_xla(q, k, v, kv_chunk: int = 2048):
    b, h, n, d = q.shape
    m = k.shape[2]
    nchunks = max(1, -(-m // kv_chunk))
    pad = nchunks * kv_chunk - m
    if pad:
        k = jnp.pad(k, ((0, 0), (0, 0), (0, pad), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, pad), (0, 0)))
        kmask = jnp.arange(nchunks * kv_chunk) < m
    else:
        kmask = None

    kc = k.reshape(b, h, nchunks, kv_chunk, d).transpose(2, 0, 1, 3, 4)
    vc = v.reshape(b, h, nchunks, kv_chunk, d).transpose(2, 0, 1, 3, 4)
    if kmask is not None:
        mc = kmask.reshape(nchunks, kv_chunk)

    qf = q.astype(jnp.float32)

    def step(carry, xs):
        acc, row_max, row_sum = carry
        if kmask is not None:
            kb, vb, mb = xs
        else:
            kb, vb = xs
        s = jnp.einsum("bhnd,bhmd->bhnm", qf, kb.astype(jnp.float32),
                       preferred_element_type=jnp.float32)
        if kmask is not None:
            s = jnp.where(mb[None, None, None, :], s, -jnp.inf)
        cur_max = jnp.max(s, axis=-1)
        new_max = jnp.maximum(row_max, cur_max)
        # Renormalize the running accumulator.
        correction = jnp.exp(row_max - new_max)
        p = jnp.exp(s - new_max[..., None])
        acc = acc * correction[..., None] + jnp.einsum(
            "bhnm,bhmd->bhnd", p, vb.astype(jnp.float32))
        row_sum = row_sum * correction + jnp.sum(p, axis=-1)
        return (acc, new_max, row_sum), None

    init = (
        jnp.zeros((b, h, n, d), jnp.float32),
        jnp.full((b, h, n), -jnp.inf, jnp.float32),
        jnp.zeros((b, h, n), jnp.float32),
    )
    xs = (kc, vc, mc) if kmask is not None else (kc, vc)
    (acc, _, row_sum), _ = jax.lax.scan(step, init, xs)
    return (acc / row_sum[..., None]).astype(v.dtype)


def _on_tpu():
    return jax.default_backend() == "tpu"


def _flash_impl(q, k, v):
    if _on_tpu():
        try:
            from streamflow_tpu.ops.pallas._attention_kernel import (
                flash_attention_tpu,
            )

            return flash_attention_tpu(q, k, v)
        except Exception:
            pass
    return _flash_xla(q, k, v)


@jax.custom_vjp
def _flash_scaled(q, k, v):
    """softmax(q k^T) v, q pre-scaled. Pallas kernels on TPU for BOTH
    directions (the backward rebuilds tile probabilities from the saved
    logsumexp — the standard flash recompute scheme, matching the
    reference's flash-attn training path, test_memory.py:248); streaming
    XLA implementation elsewhere."""
    return _flash_impl(q, k, v)


def _flash_fwd(q, k, v):
    if _on_tpu():
        try:
            from streamflow_tpu.ops.pallas._attention_kernel import (
                flash_attention_tpu,
            )

            o, lse = flash_attention_tpu(q, k, v, return_lse=True)
            return o, (q, k, v, o, lse)
        except Exception:
            pass
    return _flash_xla(q, k, v), (q, k, v, None, None)


def _flash_bwd(res, g):
    q, k, v, o, lse = res
    if lse is not None:
        from streamflow_tpu.ops.pallas._attention_kernel import (
            flash_attention_bwd_tpu,
        )

        delta = jnp.sum(g.astype(jnp.float32) * o.astype(jnp.float32),
                        axis=-1)
        return flash_attention_bwd_tpu(q, k, v, g, lse, delta)
    _, vjp = jax.vjp(_flash_xla, q, k, v)
    return vjp(g)


_flash_scaled.defvjp(_flash_fwd, _flash_bwd)


def flash_attention(q, k, v, scaled: bool = False, kv_chunk: int = 2048):
    """softmax(q k^T [* scale]) v with O(N) memory. Differentiable."""
    if not scaled:
        q = q * (q.shape[-1] ** -0.5)
    return _flash_scaled(q, k, v)
