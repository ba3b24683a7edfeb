"""Pallas TPU flash attention (forward): non-causal, full attention — the
shape GMA aggregation needs (reference flash path: demo.py:240-254).

Design (see the tiled-matmul/flash pattern in the JAX Pallas TPU ops):
- grid (B*H, Nq/block_q, Nk/block_k); the kv axis is the online-softmax
  reduction ("arbitrary"), batch/query axes are "parallel".
- running max/sum/accumulator live in VMEM scratch in fp32.
- padded kv columns are masked with a large negative (not -inf: exp(-inf-(-inf))
  would NaN).
- q is expected pre-scaled (GMAAttention multiplies q by 1/sqrt(d)).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -0.7 * float(jnp.finfo(jnp.float32).max)


def _flash_fwd_kernel(q_ref, k_ref, v_ref, o_ref,
                      m_scr, l_scr, acc_scr, *, kv_len: int, block_k: int,
                      single_kv: bool):
    if single_kv:
        # One kv block per q block (the GSA case: m = n/64): plain softmax,
        # no online renormalization passes.
        q = q_ref[0]
        k = k_ref[0]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < kv_len, s, NEG_INF)
        m = jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=1, keepdims=True)
        pv = jax.lax.dot_general(
            p.astype(v_ref.dtype), v_ref[0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        o_ref[0] = (pv / l).astype(o_ref.dtype)
        return

    kv_idx = pl.program_id(2)
    n_kv = pl.num_programs(2)

    @pl.when(kv_idx == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, NEG_INF)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    q = q_ref[0]  # (block_q, d)
    k = k_ref[0]  # (block_k, d)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (block_q, block_k)

    # Mask padded kv columns.
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + kv_idx * block_k
    s = jnp.where(col < kv_len, s, NEG_INF)

    m_prev = m_scr[...]          # (block_q, 1) broadcast-stored as (block_q, 128)
    l_prev = l_scr[...]
    m_curr = jnp.max(s, axis=1, keepdims=True)           # (block_q, 1)
    m_next = jnp.maximum(m_prev, jnp.broadcast_to(m_curr, m_prev.shape))
    alpha = jnp.exp(m_prev[:, :1] - m_next[:, :1])       # (block_q, 1)
    p = jnp.exp(s - m_next[:, :1])                       # (block_q, block_k)
    l_next = alpha * l_prev[:, :1] + jnp.sum(p, axis=1, keepdims=True)

    m_scr[...] = m_next
    l_scr[...] = jnp.broadcast_to(l_next, l_scr.shape)

    pv = jax.lax.dot_general(
        p.astype(v_ref.dtype), v_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    acc_scr[...] = acc_scr[...] * alpha + pv

    @pl.when(kv_idx == n_kv - 1)
    def _store():
        l_fin = l_scr[:, :1]
        l_inv = jnp.where(l_fin == 0.0, 1.0, 1.0 / l_fin)
        o_ref[0] = (acc_scr[...] * l_inv).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_q", "block_k"))
def flash_attention_tpu(q, k, v, block_q: int = 512, block_k: int = 2048):
    """q, k, v: (B, H, N, D) with q pre-scaled. Returns (B, H, Nq, D).

    Block tuning: when the kv axis is short (GSA's sub-sampled keys are
    n/64), a single kv block per q block removes every online-softmax
    renormalization pass — the VPU transcendental chain (max/exp/sum) is the
    bottleneck at small head_dim, not the MXU matmuls."""
    b, h, nq, d = q.shape
    nk = k.shape[2]
    bh = b * h

    block_q = min(block_q, max(128, nq))
    block_k = min(block_k, max(128, nk))

    def pad_to(x, blk):
        n = x.shape[2]
        pad = (-n) % blk
        if pad:
            x = jnp.pad(x, ((0, 0), (0, 0), (0, pad), (0, 0)))
        return x

    qp = pad_to(q, block_q).reshape(bh, -1, d)
    kp = pad_to(k, block_k).reshape(bh, -1, d)
    vp = pad_to(v, block_k).reshape(bh, -1, d)
    nq_p, nk_p = qp.shape[1], kp.shape[1]

    grid = (bh, nq_p // block_q, nk_p // block_k)
    out = pl.pallas_call(
        functools.partial(_flash_fwd_kernel, kv_len=nk, block_k=block_k,
                          single_kv=nk_p == block_k),
        out_shape=jax.ShapeDtypeStruct((bh, nq_p, d), v.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b_, i, j: (b_, i, 0)),
            pl.BlockSpec((1, block_k, d), lambda b_, i, j: (b_, j, 0)),
            pl.BlockSpec((1, block_k, d), lambda b_, i, j: (b_, j, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda b_, i, j: (b_, i, 0)),
        scratch_shapes=[
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )(qp, kp, vp)
    return out[:, :nq].reshape(b, h, nq, d)
