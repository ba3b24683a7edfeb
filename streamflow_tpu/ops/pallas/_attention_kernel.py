"""Pallas TPU flash attention: non-causal forward AND backward — the shapes
GMA aggregation and Twins GSA need (reference flash path: demo.py:240-254;
its training path trains through the flash-attn CUDA backward,
test_memory.py:248).

Design (see the tiled-matmul/flash pattern in the JAX Pallas TPU ops):
- forward grid (B*H, Nq/block_q, Nk/block_k); the kv axis is the
  online-softmax reduction ("arbitrary"), batch/query axes are "parallel".
  Optionally emits the per-row logsumexp for the backward.
- running max/sum/accumulator live in VMEM scratch in fp32.
- padded kv columns are masked with a large negative (not -inf: exp(-inf-(-inf))
  would NaN).
- q is expected pre-scaled (GMAAttention multiplies q by 1/sqrt(d)).
- backward = the standard two-pass recompute scheme: probabilities are
  rebuilt per tile from (q, k, lse); pass 1 accumulates dq over kv tiles,
  pass 2 accumulates dk/dv over q tiles. delta = rowsum(dO * O) is a cheap
  XLA elementwise pass outside the kernels.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -0.7 * float(jnp.finfo(jnp.float32).max)


def _flash_fwd_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref,
                      m_scr, l_scr, acc_scr, *, kv_len: int, block_k: int,
                      single_kv: bool):
    if single_kv:
        # One kv block per q block (the GSA case m = n/64, and GMA whenever
        # the whole lane-aligned kv axis fits VMEM): plain softmax, no
        # online renormalization passes.
        q = q_ref[0]
        k = k_ref[0]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        if kv_len < k.shape[0]:  # mask only when kv is actually padded
            col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            s = jnp.where(col < kv_len, s, NEG_INF)
        m = jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=1, keepdims=True)
        pv = jax.lax.dot_general(
            p.astype(v_ref.dtype), v_ref[0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        o_ref[0] = (pv / l).astype(o_ref.dtype)
        if lse_ref is not None:
            lse_ref[0] = jnp.broadcast_to(m + jnp.log(l), lse_ref.shape[1:])
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

    # Mask padded kv columns — statically skipped when the blocks tile the
    # kv axis exactly (the block_k divisor search makes that the norm).
    if kv_len % block_k:
        col = (jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
               + kv_idx * block_k)
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
        if lse_ref is not None:
            l_log = jnp.log(jnp.where(l_fin == 0.0, 1.0, l_fin))
            lse_ref[0] = jnp.broadcast_to(m_scr[:, :1] + l_log,
                                          lse_ref.shape[1:])


@functools.partial(jax.jit,
                   static_argnames=("block_q", "block_k", "return_lse",
                                    "interpret"))
def flash_attention_tpu(q, k, v, block_q: int = 512, block_k: int = 2048,
                        return_lse: bool = False, interpret: bool = False):
    """q, k, v: (B, H, N, D) with q pre-scaled. Returns (B, H, Nq, D)
    [+ per-row logsumexp (B, H, Nq) fp32 when ``return_lse``, for the
    backward's probability recompute].

    Block tuning: when the kv axis is short (GSA's sub-sampled keys are
    n/64), a single kv block per q block removes every online-softmax
    renormalization pass — the VPU transcendental chain (max/exp/sum) is the
    bottleneck at small head_dim, not the MXU matmuls."""
    b, h, nq, d = q.shape
    nk = k.shape[2]
    bh = b * h

    block_q = min(block_q, max(128, nq))
    block_k = min(block_k, max(128, nk))
    # Whole-kv single block when it fits VMEM (GMA's nk = H*W is 128-aligned
    # at lane-aligned feature widths): removes every online-softmax
    # renormalization pass AND the padded-column mask — the VPU chain around
    # the exp, not the MXU matmuls, is the measured bottleneck. Budget: the
    # (block_q, nk) f32 score + bf16 prob temporaries + double-buffered k/v.
    if nk > block_k and nk % 128 == 0:
        est = (block_q * nk * 6 + 4 * nk * d * q.dtype.itemsize
               + 2 * block_q * d * 4)
        if est <= 56 * 2 ** 20:
            block_k = nk
    if nk > block_k and nk % block_k:
        # Padded kv columns are masked but still COMPUTED (16% waste at the
        # benchmark's nk=7040 with block 2048 -> 8192). Prefer the largest
        # lane-aligned divisor of nk within [512, block_k]: exact coverage
        # beats a shorter online-softmax chain.
        for cand in range(block_k // 128 * 128, 511, -128):
            if nk % cand == 0:
                block_k = cand
                break

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
    kern_kw = dict(kv_len=nk, block_k=block_k, single_kv=nk_p == block_k)
    if return_lse:
        kern = functools.partial(_flash_fwd_kernel, **kern_kw)
        out_shape = [jax.ShapeDtypeStruct((bh, nq_p, d), v.dtype),
                     jax.ShapeDtypeStruct((bh, nq_p, 128), jnp.float32)]
        out_specs = [
            pl.BlockSpec((1, block_q, d), lambda b_, i, j: (b_, i, 0)),
            pl.BlockSpec((1, block_q, 128), lambda b_, i, j: (b_, i, 0)),
        ]
    else:
        def kern(q_ref, k_ref, v_ref, o_ref, m_scr, l_scr, acc_scr):
            _flash_fwd_kernel(q_ref, k_ref, v_ref, o_ref, None,
                              m_scr, l_scr, acc_scr, **kern_kw)

        out_shape = jax.ShapeDtypeStruct((bh, nq_p, d), v.dtype)
        out_specs = pl.BlockSpec((1, block_q, d), lambda b_, i, j: (b_, i, 0))
    out = pl.pallas_call(
        kern,
        out_shape=out_shape,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b_, i, j: (b_, i, 0)),
            pl.BlockSpec((1, block_k, d), lambda b_, i, j: (b_, j, 0)),
            pl.BlockSpec((1, block_k, d), lambda b_, i, j: (b_, j, 0)),
        ],
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            # whole-kv single-block routing needs headroom beyond the 16 MB
            # default scoped limit (score/prob temporaries)
            vmem_limit_bytes=100 * 2 ** 20,
        ),
        interpret=interpret,
    )(qp, kp, vp)
    if return_lse:
        o, lse = out
        return (o[:, :nq].reshape(b, h, nq, d),
                lse[:, :nq, 0].reshape(b, h, nq))
    return out[:, :nq].reshape(b, h, nq, d)


def _flash_bwd_dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, dl_ref,
                         dq_ref, acc_scr, *, kv_len: int, block_k: int):
    """dq_i = sum_j [p_ij * (dO_i v_j^T - delta_i)] k_j; kv axis arbitrary."""
    kv_idx = pl.program_id(2)
    n_kv = pl.num_programs(2)

    @pl.when(kv_idx == 0)
    def _init():
        acc_scr[...] = jnp.zeros_like(acc_scr)

    q = q_ref[0]
    k = k_ref[0]
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + kv_idx * block_k
    s = jnp.where(col < kv_len, s, NEG_INF)
    p = jnp.exp(s - lse_ref[0][:, :1])
    dp = jax.lax.dot_general(do_ref[0], v_ref[0], (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    ds = p * (dp - dl_ref[0][:, :1])
    acc_scr[...] += jax.lax.dot_general(
        ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(kv_idx == n_kv - 1)
    def _store():
        dq_ref[0] = acc_scr[...].astype(dq_ref.dtype)


def _flash_bwd_dkv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, dl_ref,
                          dk_ref, dv_ref, dk_scr, dv_scr,
                          *, q_len: int, block_q: int):
    """dv_j = sum_i p_ij dO_i; dk_j = sum_i ds_ij q_i; q axis arbitrary.
    Contractions run over the q (row) axis of the (bq, bk) tile, so no
    transposed tiles or lse relayouts are needed."""
    q_idx = pl.program_id(2)
    n_q = pl.num_programs(2)

    @pl.when(q_idx == 0)
    def _init():
        dk_scr[...] = jnp.zeros_like(dk_scr)
        dv_scr[...] = jnp.zeros_like(dv_scr)

    q = q_ref[0]
    k = k_ref[0]
    do = do_ref[0]
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    # zero out padded q ROWS (their lse is meaningless and they must not
    # contribute to dk/dv); padded kv columns only feed sliced-off outputs.
    row = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0) + q_idx * block_q
    s = jnp.where(row < q_len, s, NEG_INF)
    p = jnp.exp(s - lse_ref[0][:, :1])
    dv_scr[...] += jax.lax.dot_general(
        p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dp = jax.lax.dot_general(do, v_ref[0], (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    ds = p * (dp - dl_ref[0][:, :1])
    dk_scr[...] += jax.lax.dot_general(
        ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(q_idx == n_q - 1)
    def _store():
        dk_ref[0] = dk_scr[...].astype(dk_ref.dtype)
        dv_ref[0] = dv_scr[...].astype(dv_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("block_q", "block_k", "interpret"))
def flash_attention_bwd_tpu(q, k, v, do, lse, delta,
                            block_q: int = 512, block_k: int = 1024,
                            interpret: bool = False):
    """Backward of softmax(q k^T) v (q pre-scaled).

    q, k, v, do: (B, H, N, D); lse, delta: (B, H, Nq) fp32 with
    delta = rowsum(dO * O). Returns (dq, dk, dv) in the input dtypes.
    """
    b, h, nq, d = q.shape
    nk = k.shape[2]
    bh = b * h
    block_q = min(block_q, max(128, nq))
    block_k = min(block_k, max(128, nk))
    if nk > block_k and nk % block_k:
        # Padded kv columns are masked but still COMPUTED (16% waste at the
        # benchmark's nk=7040 with block 2048 -> 8192). Prefer the largest
        # lane-aligned divisor of nk within [512, block_k]: exact coverage
        # beats a shorter online-softmax chain.
        for cand in range(block_k // 128 * 128, 511, -128):
            if nk % cand == 0:
                block_k = cand
                break

    def pad_to(x, blk):
        n = x.shape[2]
        pad = (-n) % blk
        if pad:
            x = jnp.pad(x, ((0, 0), (0, 0), (0, pad), (0, 0)))
        return x

    qp = pad_to(q, block_q).reshape(bh, -1, d)
    dop = pad_to(do, block_q).reshape(bh, -1, d)
    kp = pad_to(k, block_k).reshape(bh, -1, d)
    vp = pad_to(v, block_k).reshape(bh, -1, d)
    nq_p, nk_p = qp.shape[1], kp.shape[1]

    def rows(x):  # (B, H, Nq) -> (bh, nq_p, 128) lane-replicated fp32
        x = x.reshape(bh, nq, 1)
        pad = nq_p - nq
        if pad:
            x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
        return jnp.broadcast_to(x, (bh, nq_p, 128)).astype(jnp.float32)

    lse_r = rows(lse)
    dl_r = rows(delta)

    qspec = pl.BlockSpec((1, block_q, d), lambda b_, i, j: (b_, i, 0))
    kspec = pl.BlockSpec((1, block_k, d), lambda b_, i, j: (b_, j, 0))
    rspec = pl.BlockSpec((1, block_q, 128), lambda b_, i, j: (b_, i, 0))

    dq = pl.pallas_call(
        functools.partial(_flash_bwd_dq_kernel, kv_len=nk, block_k=block_k),
        out_shape=jax.ShapeDtypeStruct((bh, nq_p, d), q.dtype),
        grid=(bh, nq_p // block_q, nk_p // block_k),
        in_specs=[qspec, kspec, kspec, qspec, rspec, rspec],
        out_specs=qspec,
        scratch_shapes=[pltpu.VMEM((block_q, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(qp, kp, vp, dop, lse_r, dl_r)

    # pass 2: grid transposed — (bh, kv tiles, q tiles), q axis arbitrary
    qspec2 = pl.BlockSpec((1, block_q, d), lambda b_, i, j: (b_, j, 0))
    kspec2 = pl.BlockSpec((1, block_k, d), lambda b_, i, j: (b_, i, 0))
    rspec2 = pl.BlockSpec((1, block_q, 128), lambda b_, i, j: (b_, j, 0))
    dk, dv = pl.pallas_call(
        functools.partial(_flash_bwd_dkv_kernel, q_len=nq, block_q=block_q),
        out_shape=[jax.ShapeDtypeStruct((bh, nk_p, d), k.dtype),
                   jax.ShapeDtypeStruct((bh, nk_p, d), v.dtype)],
        grid=(bh, nk_p // block_k, nq_p // block_q),
        in_specs=[qspec2, kspec2, kspec2, qspec2, rspec2, rspec2],
        out_specs=[kspec2, kspec2],
        scratch_shapes=[pltpu.VMEM((block_k, d), jnp.float32),
                        pltpu.VMEM((block_k, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(qp, kp, vp, dop, lse_r, dl_r)

    return (dq[:, :nq].reshape(b, h, nq, d),
            dk[:, :nk].reshape(b, h, nk, d),
            dv[:, :nk].reshape(b, h, nk, d))
