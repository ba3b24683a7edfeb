"""Depthwise kxk conv as a C-batched banded matmul on the MXU — Pallas TPU
kernel with the kx-combine fused in VMEM.

Motivation (reference hot op: the dw15x15 stacks of PCBlock4_Deep_nopool_res,
core/update.py:12-36,30-36). The XLA banded formulation (layers/sk.py
``_dw_banded``, dw_impl='banded') runs the conv on the MXU but must
materialize a k-redundant (C, B*Wp, k*H) intermediate to HBM (~270 MB bf16
per c384 conv at the benchmark shape) before the k-way shifted-add combine.
This kernel keeps that intermediate in VMEM: per channel, one
(B*Wp, Hp) @ (Hp, k*H) matmul on the MXU, then the combine

    y[b*W + wo, ho] = sum_kx out[b*Wp + wo + kx, kx*H + ho]

as k static slice-adds on the VPU, writing only the (C, B*W, H) result.
HBM traffic per conv drops from ~(2x k-redundant + io) to io-only.

Formulation (identical math to ``_dw_banded``):

    out[c, b*Wp + wp, kx*H + ho] = sum_hp x[b, hp, wp, c] * R[c, hp, kx*H+ho]
    R[c, hp, kx*H + ho]          = w[hp - ho, kx, c]   (0 <= hp - ho < k)

No convolution HLO and no XLA-visible layout hazards: the refinement loop
needs no ``lax.cond`` shield around this path, and the weight gradient is a
plain dot chain (backward recomputes through the XLA banded composite).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def band_rhs(w, h, dtype):
    """Banded weight tensor R: (C, Hp, k*H) from dw weights w (k, k, C).

    R[c, hp, kx*H + ho] = w[hp-ho, kx, c] where 0 <= hp-ho < k, else 0.
    Loop-invariant given the params — XLA hoists it out of the scan body
    (it depends only on weights)."""
    k = w.shape[0]
    hp = h + (k - 1)
    d = jnp.arange(hp)[:, None] - jnp.arange(h)[None, :]  # (Hp, H) = ky
    band = jnp.where(
        ((d >= 0) & (d < k))[:, :, None, None],
        w[jnp.clip(d, 0, k - 1)],  # (Hp, H, k, C)
        0,
    ).astype(dtype)
    return band.transpose(3, 0, 2, 1).reshape(w.shape[2], hp, k * h)


def dw_banded_xla(x, w, b):
    """XLA composite of the same math (dw_impl='banded'; also the backward
    recompute path of the kernel). x: (B,H,W,C); w: (k,k,C); b: (C,)."""
    k = w.shape[0]
    if k == 1:
        return x * w[0, 0] + b
    r = k // 2
    nb, h, wd, c = x.shape
    hp, wp = h + 2 * r, wd + 2 * r
    xp = jnp.pad(x, ((0, 0), (r, r), (r, r), (0, 0)))
    lhs = xp.transpose(3, 0, 2, 1).reshape(c, nb * wp, hp)
    rhs = band_rhs(w, h, x.dtype)
    # f32 accumulation (cast back right after): 69-term bf16 accumulation
    # diverges visibly through the refinement loop (caught by a full-model
    # CPU probe at ~19 px max flow delta vs the conv path).
    out = jax.lax.dot_general(
        lhs, rhs, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype).reshape(c, nb, wp, k, h)
    y = None
    for kx in range(k):
        t = jax.lax.slice_in_dim(out, kx, kx + wd, axis=2)[:, :, :, kx]
        y = t if y is None else y + t
    return y.transpose(1, 3, 2, 0) + b  # (C,B,W,H) -> (B,H,W,C)


def _kernel(lhs_ref, rhs_ref, o_ref, *, nb, wd, wp, h, k):
    lhs = lhs_ref[0]                      # (nb*Wp, Hp)
    rhs = rhs_ref[0]                      # (Hp, k*H)
    out = jax.lax.dot_general(
        lhs, rhs, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                     # (nb*Wp, k*H) — VMEM only
    for bi in range(nb):
        acc = None
        for kx in range(k):
            sl = jax.lax.slice(
                out, (bi * wp + kx, kx * h), (bi * wp + kx + wd, (kx + 1) * h)
            )
            acc = sl if acc is None else acc + sl
        o_ref[0, bi * wd:(bi + 1) * wd, :] = acc.astype(o_ref.dtype)


def vmem_estimate(nb, h, wd, k, itemsize=2):
    """Per-cell VMEM bytes: lhs + rhs + f32 matmul out + out block (x2 for
    double buffering on the io blocks)."""
    r = k // 2
    hp, wp = h + 2 * r, wd + 2 * r
    return (
        2 * nb * wp * hp * itemsize       # lhs (dbl-buffered)
        + 2 * hp * k * h * itemsize       # rhs
        + nb * wp * k * h * 4             # f32 matmul result
        + 2 * nb * wd * h * itemsize      # out block
    )


@functools.partial(jax.jit, static_argnames=("interpret",))
def _dw_banded_mxu_fwd(x, w, b, interpret: bool = False):
    k = w.shape[0]
    if k == 1:
        return x * w[0, 0] + b
    r = k // 2
    nb, h, wd, c = x.shape
    hp, wp = h + 2 * r, wd + 2 * r
    xp = jnp.pad(x, ((0, 0), (r, r), (r, r), (0, 0)))
    lhs = xp.transpose(3, 0, 2, 1).reshape(c, nb * wp, hp)
    rhs = band_rhs(w, h, x.dtype)
    y = pl.pallas_call(
        functools.partial(_kernel, nb=nb, wd=wd, wp=wp, h=h, k=k),
        out_shape=jax.ShapeDtypeStruct((c, nb * wd, h), x.dtype),
        grid=(c,),
        in_specs=[
            pl.BlockSpec((1, nb * wp, hp), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, hp, k * h), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, nb * wd, h), lambda i: (i, 0, 0)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=100 * 2 ** 20,
        ),
        interpret=interpret,
    )(lhs, rhs)
    # (C, B*W, H) -> (B, H, W, C)
    return y.reshape(c, nb, wd, h).transpose(1, 3, 2, 0) + b


@jax.custom_vjp
def dw_banded_mxu(x, w, b):
    """Fused banded-MXU depthwise conv; backward recomputes through the XLA
    banded composite (plain dots — differentiates cleanly, no channel-padded
    dw-conv weight-grad miscompile)."""
    return _dw_banded_mxu_fwd(x, w, b)


def _fwd(x, w, b):
    return dw_banded_mxu(x, w, b), (x, w, b)


def _bwd(res, g):
    x, w, b = res
    _, vjp = jax.vjp(dw_banded_xla, x, w, b)
    return vjp(g)


dw_banded_mxu.defvjp(_fwd, _bwd)


# ---------------------------------------------------------------------------
# 'banded_mxu_t': the same banded matmul with the C-minor<->C-major operand
# transposes moved INTO the kernel (VMEM), so the NHWC activations never take
# the extra HBM round trip that the XLA-side transposes of 'banded_mxu' cost
# (~15 ms/clip of the 23.6 ms data-formatting group at the benchmark shape,
# BASELINE.md r3s5). The kernel reads a natural-layout (1, Hp, Wp, cb)
# channel-block, Mosaic-transposes it to (cb, Wp, Hp) in VMEM scratch, runs
# one (Wp, Hp) @ (Hp, k*H) MXU matmul per channel with the kx-combine fused,
# and transposes the (cb, W, H) result back to natural (1, H, W, cb) on the
# way out. Grid = (C/cb, B) with B minor so the per-block banded weight RHS
# stays resident across batch steps.
# ---------------------------------------------------------------------------


def _kernel_t(x_ref, rhs_ref, o_ref, xt_ref, yt_ref, *, wd, wp, h, k, cb):
    # (Hp, Wp, cb) natural -> (cb, Wp, Hp) channel-major, in VMEM
    xt_ref[:] = jnp.transpose(x_ref[0], (2, 1, 0))

    def body(c, _):
        lhs = xt_ref[pl.ds(c, 1)][0]          # (Wp, Hp)
        out = jax.lax.dot_general(
            lhs, rhs_ref[pl.ds(c, 1)][0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                     # (Wp, k*H)
        acc = None
        for kx in range(k):
            sl = jax.lax.slice(out, (kx, kx * h), (kx + wd, (kx + 1) * h))
            acc = sl if acc is None else acc + sl
        yt_ref[pl.ds(c, 1)] = acc.astype(yt_ref.dtype)[None]
        return 0

    jax.lax.fori_loop(0, cb, body, 0)
    o_ref[0] = jnp.transpose(yt_ref[:], (2, 1, 0))  # (cb, W, H) -> (H, W, cb)


def vmem_estimate_t(h, wd, k, cb, itemsize=2):
    r = k // 2
    hp, wp = h + 2 * r, wd + 2 * r
    return (
        2 * hp * wp * cb * itemsize           # natural x block (dbl-buffered)
        + 2 * cb * wp * hp * itemsize         # xt scratch + transpose temp
        + 2 * cb * hp * k * h * itemsize      # rhs (dbl-buffered)
        + 2 * cb * wd * h * itemsize          # yt scratch + transpose temp
        + 2 * h * wd * cb * itemsize          # out block (dbl-buffered)
        + wp * k * h * 4                      # per-channel f32 dot result
        + wd * h * 4                          # per-channel f32 kx accumulator
    )


@functools.partial(jax.jit, static_argnames=("interpret",))
def _dw_banded_mxu_t_fwd(x, w, b, interpret: bool = False):
    k = w.shape[0]
    if k == 1:
        return x * w[0, 0] + b
    r = k // 2
    nb, h, wd, c = x.shape
    hp, wp = h + 2 * r, wd + 2 * r
    cb = 128
    assert c % cb == 0, c
    xp = jnp.pad(x, ((0, 0), (r, r), (r, r), (0, 0)))
    rhs = band_rhs(w, h, x.dtype)             # (C, Hp, k*H)
    y = pl.pallas_call(
        functools.partial(_kernel_t, wd=wd, wp=wp, h=h, k=k, cb=cb),
        out_shape=jax.ShapeDtypeStruct((nb, h, wd, c), x.dtype),
        grid=(c // cb, nb),
        in_specs=[
            pl.BlockSpec((1, hp, wp, cb), lambda i, j: (j, 0, 0, i)),
            pl.BlockSpec((cb, hp, k * h), lambda i, j: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, h, wd, cb), lambda i, j: (j, 0, 0, i)),
        scratch_shapes=[
            pltpu.VMEM((cb, wp, hp), x.dtype),
            pltpu.VMEM((cb, wd, h), x.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=100 * 2 ** 20,
        ),
        interpret=interpret,
    )(xp, rhs)
    return y + b


@jax.custom_vjp
def dw_banded_mxu_t(x, w, b):
    """Banded-MXU depthwise conv with the layout transposes fused in VMEM
    (natural NHWC in/out); backward recomputes through the XLA banded
    composite, as dw_banded_mxu."""
    return _dw_banded_mxu_t_fwd(x, w, b)


def _fwd_t(x, w, b):
    return dw_banded_mxu_t(x, w, b), (x, w, b)


dw_banded_mxu_t.defvjp(_fwd_t, _bwd)


# ---------------------------------------------------------------------------
# Fused SK dw chain: the whole depthwise stack of one SKBlock —
#   for k in k_conv: x = gelu(x + dw_k(x) + b_k)
# — in ONE kernel. k==1 stages run as masked elementwise VPU ops in the
# transposed/padded (lhs) domain; the final k>1 stage is the banded MXU
# matmul with the kx-combine, residual add, bias and gelu all fused, so the
# intermediate x1 and both residual gelu passes never touch HBM (gelu's erf
# is VPU-compute-bound — ~24 ms/clip of standalone loop fusions at the
# benchmark shape).
# ---------------------------------------------------------------------------


def _gelu_f32(x):
    from streamflow_tpu.ops.pallas._dw_conv_kernel import _erf_f32
    return x * 0.5 * (1.0 + _erf_f32(x * (1.0 / math.sqrt(2.0))))


def sk_chain_banded_xla(x, ws, bs, ks):
    """XLA composite of the fused chain (exact math; backward recompute
    path). Conv-HLO-free: every k>1 stage is the banded dot."""
    for w, b, k in zip(ws, bs, ks):
        if k == 1:
            y = x * w[0, 0] + b
        else:
            y = dw_banded_xla(x, w, b)
        xf = x.astype(jnp.float32) + y.astype(jnp.float32)
        x = _gelu_f32(xf).astype(x.dtype)
    return x


def _chain_kernel(lhs_ref, w1_ref, b1_ref, rhs_ref, bn_ref, o_ref, *,
                  nb, wd, wp, h, k, r, n1):
    x0 = lhs_ref[0].astype(jnp.float32)            # (rows, Hp)
    rows = nb * wp
    hp = h + 2 * r
    if n1:
        # halo mask: zero rows/cols outside the interior so 'same'
        # zero-padding semantics survive the elementwise stages
        ri = jax.lax.broadcasted_iota(jnp.int32, (rows, hp), 0)
        ci = jax.lax.broadcasted_iota(jnp.int32, (rows, hp), 1)
        wpos = jax.lax.rem(ri, wp)
        halo = ((wpos < r) | (wpos >= r + wd) | (ci < r) | (ci >= r + h))
        for i in range(n1):
            y = _gelu_f32(x0 + x0 * w1_ref[0, 0, i] + b1_ref[0, 0, i])
            x0 = jnp.where(halo, 0.0, y)
    xm = x0.astype(lhs_ref.dtype)
    out = jax.lax.dot_general(
        xm, rhs_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                              # (rows, k*H)
    bn = bn_ref[0, 0, 0]
    for bi in range(nb):
        acc = None
        for kx in range(k):
            sl = jax.lax.slice(
                out, (bi * wp + kx, kx * h), (bi * wp + kx + wd, (kx + 1) * h)
            )
            acc = sl if acc is None else acc + sl
        res = jax.lax.slice(x0, (bi * wp + r, r), (bi * wp + r + wd, r + h))
        y = _gelu_f32(res + acc + bn)
        o_ref[0, bi * wd:(bi + 1) * wd, :] = y.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("ks", "interpret"))
def _sk_chain_banded_fwd(x, ws, bs, ks, interpret: bool = False):
    """ks must be [1]*n1 + [k>1]. x: (B,H,W,C)."""
    k = ks[-1]
    n1 = len(ks) - 1
    r = k // 2
    nb, h, wd, c = x.shape
    hp, wp = h + 2 * r, wd + 2 * r
    xp = jnp.pad(x, ((0, 0), (r, r), (r, r), (0, 0)))
    lhs = xp.transpose(3, 0, 2, 1).reshape(c, nb * wp, hp)
    rhs = band_rhs(ws[-1], h, x.dtype)
    if n1:
        w1 = jnp.stack([w[0, 0] for w in ws[:-1]], axis=-1)   # (C, n1)
        b1 = jnp.stack(list(bs[:-1]), axis=-1)                # (C, n1)
    else:
        w1 = jnp.zeros((c, 1), x.dtype)
        b1 = jnp.zeros((c, 1), x.dtype)
    w1 = w1.reshape(c, 1, max(n1, 1))
    b1 = b1.reshape(c, 1, max(n1, 1))
    bn = bs[-1].reshape(c, 1, 1).astype(jnp.float32)
    y = pl.pallas_call(
        functools.partial(_chain_kernel, nb=nb, wd=wd, wp=wp, h=h, k=k, r=r,
                          n1=n1),
        out_shape=jax.ShapeDtypeStruct((c, nb * wd, h), x.dtype),
        grid=(c,),
        in_specs=[
            pl.BlockSpec((1, nb * wp, hp), lambda i: (i, 0, 0)),
            # per-channel scalars shaped (C, 1, n): the block's trailing
            # dims equal the array's, which Mosaic accepts for sub-(8,128)
            # blocks
            pl.BlockSpec((1, 1, max(n1, 1)), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, 1, max(n1, 1)), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, hp, k * h), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, 1, 1), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, nb * wd, h), lambda i: (i, 0, 0)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=100 * 2 ** 20,
        ),
        interpret=interpret,
    )(lhs, w1.astype(jnp.float32), b1.astype(jnp.float32), rhs, bn)
    return y.reshape(c, nb, wd, h).transpose(1, 3, 2, 0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def sk_chain_banded(x, ws, bs, ks):
    """Fused SKBlock dw stack (k1 elementwise stages + banded-MXU final
    conv + residual gelus); backward recomputes through the XLA banded
    composite (dots only)."""
    return _sk_chain_banded_fwd(x, ws, bs, ks)


def _chain_fwd(x, ws, bs, ks):
    return sk_chain_banded(x, ws, bs, ks), (x, ws, bs)


def _chain_bwd(ks, res, g):
    x, ws, bs = res
    _, vjp = jax.vjp(
        lambda xx, ww, bb: sk_chain_banded_xla(xx, ww, bb, ks), x, ws, bs)
    return vjp(g)


sk_chain_banded.defvjp(_chain_fwd, _chain_bwd)
