"""Fused FFN pair as a Pallas TPU kernel (MXU matmul chain, VMEM-resident).

Computes the SKBlock FFN patterns (reference PCBlock4_Deep_nopool_res,
core/update.py:12-36) in one pass over the token axis:

    residual=True :  y = gelu(x + gelu(x @ W1 + b1) @ W2 + b2)
    residual=False:  y =         gelu(x @ W1 + b1) @ W2 + b2

The hidden activation (1.5x wide) and the residual re-read never touch HBM:
traffic is one read of x and one write of y, vs five array passes for the
XLA composite. Both matmuls are MXU-shaped ((block_n, C) @ (C, Ch)); weights
are VMEM-resident across the whole grid.

Used on the corr_impl='pallas' path, whose scan body must stay free of
convolution HLOs anyway (see _dw_conv_kernel.py for the disease notes);
gated by layers/sk.py. fp32 accumulation via preferred_element_type.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from streamflow_tpu.ops.pallas._dw_conv_kernel import _erf_f32


# erf(x) ~ x * p(x^2) on [0,3], saturating outside (erf(3)=0.99998);
# least-squares fit on Chebyshev nodes, abs-error weighted. max|err| 4.0e-4
# — ~20x below the bf16 activation resolution (kernel output delta vs the
# f32 composite is ~2.5e-2 with EITHER erf, dominated by bf16 operand
# rounding); no VPU divide (the 4/6 rational in _erf_f32 pays one). The
# kernels' elementwise chain costs about as many VPU cycles as their
# matmuls cost MXU cycles, so this is an e2e win: 140.8 -> 129.1 ms/clip
# at 436x1024 (r4s3). Selected by the ``gelu`` static arg / cfg.ffn_gelu.
_ERF_POLY = (3.64476874220969839e-06, -1.35030047617407806e-04,
             2.10968155734540678e-03, -1.83597971202626026e-02,
             9.98778049755993935e-02, -3.67134565174511318e-01,
             1.12662306241423282e+00)


def _gelu_poly(x):
    xc = jnp.clip(x, -3.0 * math.sqrt(2.0), 3.0 * math.sqrt(2.0))
    t = xc * xc * 0.5
    acc = jnp.full(t.shape, _ERF_POLY[0], jnp.float32)
    for c in _ERF_POLY[1:]:
        acc = acc * t + c
    return x * 0.5 * (1.0 + xc * (1.0 / math.sqrt(2.0)) * acc)


def _gelu_erf(x):
    return x * 0.5 * (1.0 + _erf_f32(x * (1.0 / math.sqrt(2.0))))


_GELUS = {"erf": _gelu_erf, "poly": _gelu_poly}


def _ln_f32(x, g, be, eps=1e-5):
    """Rowwise LayerNorm over the trailing axis, f32 stats (torch
    nn.LayerNorm semantics, biased variance)."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True) - mean * mean
    xn = (xf - mean) * jax.lax.rsqrt(var + eps)
    return xn * g.astype(jnp.float32) + be.astype(jnp.float32)


def ffn_pair_xla(x, w1, b1, w2, b2, residual=True, wp=None, bp=None,
                 kw=None, kb=None, yres=None, db=None, ln=None,
                 add_res=False, gelu="erf"):
    """Reference XLA composite (exact math of the kernel).

    Optional edge stages (the SK-block dw-chain elementwise work folded into
    the FFN kernels so the cond-shielded branch stays pure convolution):
      yres/db: residual-gelu prologue  x = gelu(x + yres + db)   (the k>1 dw
               conv's bias + residual gelu, applied before the pw stage)
      kw/kb:   k==1 dw-stage epilogue  y = gelu(y + y*kw + kb)   (after the
               residual pair)
      ln:      (gamma, beta) LayerNorm prologue over raw x (the Twins
               pre-norm block's norm2 riding the MLP kernel)
      add_res: plain residual epilogue y = y + x_raw (the Twins block's
               x + mlp(LN(x)) — no gelu)
    """
    _gelu = _GELUS[gelu]
    dt = x.dtype
    x_raw = x
    if ln is not None:
        x = _ln_f32(x, ln[0], ln[1]).astype(dt)
    if yres is not None:
        x = _gelu(x.astype(jnp.float32) + yres.astype(jnp.float32)
                  + db.astype(jnp.float32)).astype(dt)
    if wp is not None:
        p = jax.lax.dot_general(
            x, wp.astype(dt), (((x.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        x = _gelu(x.astype(jnp.float32) + p
                  + bp.astype(jnp.float32)).astype(dt)
    h = jax.lax.dot_general(x, w1.astype(dt), (((x.ndim - 1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    h = _gelu(h + b1.astype(jnp.float32)).astype(dt)
    y = jax.lax.dot_general(h, w2.astype(dt), (((h.ndim - 1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    y = y + b2.astype(jnp.float32)
    if residual:
        y = _gelu(x.astype(jnp.float32) + y)
    if kw is not None:
        y = y.astype(jnp.float32)
        y = _gelu(y + y * kw.astype(jnp.float32) + kb.astype(jnp.float32))
    if add_res:
        y = y.astype(jnp.float32) + x_raw.astype(jnp.float32)
    return y.astype(dt)


def _pair_tail(x, w1_ref, b1_ref, w2_ref, b2_ref, o_ref, residual,
               k1_refs=None, gelu="erf"):
    """Shared FFN-pair math: o = [gelu(x +)] gelu(x@W1+b1)@W2+b2,
    optionally followed by the k==1 dw-stage epilogue gelu(y + y*kw + kb)."""
    _gelu = _GELUS[gelu]
    dt = x.dtype
    h = jax.lax.dot_general(
        x, w1_ref[...].astype(dt), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    h = _gelu(h + b1_ref[...].astype(jnp.float32)).astype(dt)
    y = jax.lax.dot_general(
        h, w2_ref[...].astype(dt), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    y = y + b2_ref[...].astype(jnp.float32)
    if residual:
        y = _gelu(x.astype(jnp.float32) + y)
    if k1_refs is not None:
        kw_ref, kb_ref = k1_refs
        y = _gelu(y + y * kw_ref[...].astype(jnp.float32)
                  + kb_ref[...].astype(jnp.float32))
    o_ref[...] = y.astype(o_ref.dtype)


def _kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref, *, residual,
            gelu):
    _pair_tail(x_ref[...], w1_ref, b1_ref, w2_ref, b2_ref, o_ref, residual,
               gelu=gelu)


def _kernel_k1(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, kw_ref, kb_ref, o_ref,
               *, residual, gelu):
    """FFN pair + the SK dw chain's k==1 elementwise stage as an epilogue:
    the erf-gelu residual runs on VMEM-resident data instead of as a
    standalone HBM pass between this kernel and the dw conv."""
    _pair_tail(x_ref[...], w1_ref, b1_ref, w2_ref, b2_ref, o_ref, residual,
               k1_refs=(kw_ref, kb_ref), gelu=gelu)


def _kernel_ln(x_ref, g_ref, be_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref,
               *, residual, add_res, gelu):
    """LayerNorm prologue + FFN pair + optional plain residual epilogue:
    o = [x +] pair(LN(x)). The Twins pre-norm MLP (x + mlp(norm2(x))) in one
    kernel: the normalized activation and the residual re-read never touch
    HBM (they were two standalone ~2.4 ms/clip fusions in the r4 trace)."""
    x = x_ref[...]
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=1, keepdims=True)
    var = jnp.mean(xf * xf, axis=1, keepdims=True) - mean * mean
    xn = (xf - mean) * jax.lax.rsqrt(var + 1e-5)
    xn = (xn * g_ref[...].astype(jnp.float32)
          + be_ref[...].astype(jnp.float32)).astype(x.dtype)
    _gelu = _GELUS[gelu]
    dt = xn.dtype
    h = jax.lax.dot_general(
        xn, w1_ref[...].astype(dt), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    h = _gelu(h + b1_ref[...].astype(jnp.float32)).astype(dt)
    y = jax.lax.dot_general(
        h, w2_ref[...].astype(dt), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    y = y + b2_ref[...].astype(jnp.float32)
    if residual:
        y = _gelu(xn.astype(jnp.float32) + y)
    if add_res:
        y = y + x.astype(jnp.float32)
    o_ref[...] = y.astype(o_ref.dtype)


def _kernel_pw(x_ref, wp_ref, bp_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref,
               *, residual, gelu):
    """Pointwise-residual pre-stage fused ahead of the FFN pair:
    x' = gelu(x + x @ Wp + bp), then the pair on x'. Saves the HBM round
    trip of x' between the SK block's pw conv and its second FFN."""
    _gelu = _GELUS[gelu]
    x = x_ref[...]
    dt = x.dtype
    p = jax.lax.dot_general(
        x, wp_ref[...].astype(dt), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    x = _gelu(x.astype(jnp.float32) + p
              + bp_ref[...].astype(jnp.float32)).astype(dt)
    _pair_tail(x, w1_ref, b1_ref, w2_ref, b2_ref, o_ref, residual, gelu=gelu)


def _kernel_dwres_pw(x_ref, y_ref, db_ref, wp_ref, bp_ref, w1_ref, b1_ref,
                     w2_ref, b2_ref, o_ref, *, residual, gelu):
    """Residual-gelu prologue (the k>1 dw conv's bias + residual gelu) +
    pointwise stage + FFN pair: x' = gelu(x + y + db), then as _kernel_pw.
    Lets the cond-shielded dw branch return the RAW conv result — no
    elementwise work left inside the branch."""
    _gelu = _GELUS[gelu]
    x = x_ref[...]
    dt = x.dtype
    x = _gelu(x.astype(jnp.float32) + y_ref[...].astype(jnp.float32)
              + db_ref[...].astype(jnp.float32)).astype(dt)
    p = jax.lax.dot_general(
        x, wp_ref[...].astype(dt), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    x = _gelu(x.astype(jnp.float32) + p
              + bp_ref[...].astype(jnp.float32)).astype(dt)
    _pair_tail(x, w1_ref, b1_ref, w2_ref, b2_ref, o_ref, residual, gelu=gelu)


def _pick_block(n: int, target: int) -> int:
    """Largest row-block <= ~target that divides n (16-row aligned, the bf16
    sublane tile) — a dividing block needs NO pad of x / slice of y around
    the kernel (measured ~3.5 ms/clip of %pad + %slice at the benchmark
    shape, r4 trace). Falls back to `target` (with padding) when n has no
    16-aligned divisor >= 256."""
    for b in range(min(n, target + 32) // 16 * 16, 255, -16):
        if n % b == 0:
            return b
    return target


@functools.partial(jax.jit,
                   static_argnames=("residual", "add_res", "block_n",
                                    "interpret", "gelu"))
def _ffn_pair_fwd(x, w1, b1, w2, b2, wp=None, bp=None, kw=None, kb=None,
                  yres=None, db=None, ln_g=None, ln_b=None, residual=True,
                  add_res=False, block_n: int = 1024,
                  interpret: bool = False, gelu: str = "erf"):
    """x: (..., C); w1 (C, Ch); w2 (Ch, Co); optional pw pre-stage wp (C, C);
    optional k1 epilogue (kw, kb) (Co,); optional residual-gelu prologue
    (yres (..., C), db (C,)); optional LayerNorm prologue (ln_g, ln_b) (C,)
    with plain residual epilogue ``add_res`` (Twins pre-norm MLP). residual
    and add_res require Co == C. ``block_n`` is a target: the actual row
    block is the nearest dividing block (no padding) when one exists."""
    orig_shape = x.shape
    c = x.shape[-1]
    ch = w1.shape[1]
    co = w2.shape[1]
    assert not (residual or add_res) or co == c
    n = math.prod(orig_shape[:-1])
    x2 = x.reshape(n, c)
    block_n = _pick_block(n, block_n)
    pad = (-n) % block_n
    if pad:
        x2 = jnp.pad(x2, ((0, pad), (0, 0)))
    nt = n + pad

    row_spec = pl.BlockSpec((block_n, c), lambda i: (i, 0))
    inputs = [x2]
    in_specs = [row_spec]
    if yres is not None:
        y2 = yres.reshape(n, c)
        if pad:
            y2 = jnp.pad(y2, ((0, pad), (0, 0)))
        inputs += [y2, db.reshape(1, c)]
        in_specs += [row_spec, pl.BlockSpec((1, c), lambda i: (0, 0))]
        assert wp is not None, "prologue is only used with the pw stage"
        kern = functools.partial(_kernel_dwres_pw, residual=residual,
                                 gelu=gelu)
    elif ln_g is not None:
        assert wp is None and kw is None, "ln prologue is pair-only"
        inputs += [ln_g.reshape(1, c), ln_b.reshape(1, c)]
        in_specs += [pl.BlockSpec((1, c), lambda i: (0, 0))] * 2
        kern = functools.partial(_kernel_ln, residual=residual,
                                 add_res=add_res, gelu=gelu)
    elif wp is not None:
        kern = functools.partial(_kernel_pw, residual=residual, gelu=gelu)
    elif kw is not None:
        kern = functools.partial(_kernel_k1, residual=residual, gelu=gelu)
    else:
        kern = functools.partial(_kernel, residual=residual, gelu=gelu)
    if wp is not None:
        inputs += [wp, bp.reshape(1, c)]
        in_specs += [
            pl.BlockSpec((c, c), lambda i: (0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
        ]
    inputs += [w1, b1.reshape(1, ch), w2, b2.reshape(1, co)]
    in_specs += [
        pl.BlockSpec((c, ch), lambda i: (0, 0)),
        pl.BlockSpec((1, ch), lambda i: (0, 0)),
        pl.BlockSpec((ch, co), lambda i: (0, 0)),
        pl.BlockSpec((1, co), lambda i: (0, 0)),
    ]
    if kw is not None:
        assert wp is None and yres is None, "k1 epilogue is pair-only"
        inputs += [kw.reshape(1, co), kb.reshape(1, co)]
        in_specs += [
            pl.BlockSpec((1, co), lambda i: (0, 0)),
            pl.BlockSpec((1, co), lambda i: (0, 0)),
        ]

    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((nt, co), x.dtype),
        grid=(nt // block_n,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((block_n, co), lambda i: (i, 0)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=100 * 2 ** 20,
        ),
        interpret=interpret,
    )(*inputs)
    return out[:n].reshape(*orig_shape[:-1], co)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def ffn_pair(x, w1, b1, w2, b2, residual=True, gelu="erf"):
    """Fused FFN pair; backward recomputes through the XLA composite
    (same gelu variant, so forward and backward numerics agree)."""
    return _ffn_pair_fwd(x, w1, b1, w2, b2, residual=residual, gelu=gelu)


def _fwd(x, w1, b1, w2, b2, residual, gelu):
    return ffn_pair(x, w1, b1, w2, b2, residual, gelu), (x, w1, b1, w2, b2)


def _bwd(residual, gelu, res, g):
    x, w1, b1, w2, b2 = res
    _, vjp = jax.vjp(
        lambda *a: ffn_pair_xla(*a, residual=residual, gelu=gelu),
        x, w1, b1, w2, b2)
    return vjp(g)


ffn_pair.defvjp(_fwd, _bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def pw_ffn_pair(x, wp, bp, w1, b1, w2, b2, residual=True, gelu="erf"):
    """gelu(x + x@Wp + bp) pointwise-residual stage fused ahead of the FFN
    pair (the SK block's pw conv + second FFN in one kernel); backward
    recomputes through the XLA composite."""
    return _ffn_pair_fwd(x, w1, b1, w2, b2, wp=wp, bp=bp, residual=residual,
                         gelu=gelu)


def _pw_fwd(x, wp, bp, w1, b1, w2, b2, residual, gelu):
    return (pw_ffn_pair(x, wp, bp, w1, b1, w2, b2, residual, gelu),
            (x, wp, bp, w1, b1, w2, b2))


def _pw_bwd(residual, gelu, res, g):
    x, wp, bp, w1, b1, w2, b2 = res
    _, vjp = jax.vjp(
        lambda xx, pp, pb, *a: ffn_pair_xla(
            xx, *a, residual=residual, wp=pp, bp=pb, gelu=gelu),
        x, wp, bp, w1, b1, w2, b2)
    return vjp(g)


pw_ffn_pair.defvjp(_pw_fwd, _pw_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def ffn_pair_k1(x, w1, b1, w2, b2, kw, kb, residual=True, gelu="erf"):
    """FFN pair + the SK dw chain's k==1 stage as an in-kernel epilogue
    (y = gelu(y + y*kw + kb)); backward recomputes through the XLA
    composite. Lets the subsequent cond-shielded dw conv branch start from
    this kernel's output with no standalone elementwise pass between."""
    return _ffn_pair_fwd(x, w1, b1, w2, b2, kw=kw, kb=kb, residual=residual,
                         gelu=gelu)


def _k1_fwd(x, w1, b1, w2, b2, kw, kb, residual, gelu):
    return (ffn_pair_k1(x, w1, b1, w2, b2, kw, kb, residual, gelu),
            (x, w1, b1, w2, b2, kw, kb))


def _k1_bwd(residual, gelu, res, g):
    x, w1, b1, w2, b2, kw, kb = res
    _, vjp = jax.vjp(
        lambda xx, *a: ffn_pair_xla(xx, *a[:4], residual=residual,
                                    kw=a[4], kb=a[5], gelu=gelu),
        x, w1, b1, w2, b2, kw, kb)
    return vjp(g)


ffn_pair_k1.defvjp(_k1_fwd, _k1_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10))
def dwres_pw_ffn_pair(x, y, db, wp, bp, w1, b1, w2, b2, residual=False,
                      gelu="erf"):
    """Residual-gelu prologue over the dw conv's raw result
    (x' = gelu(x + y + db)) + pointwise stage + FFN pair in one kernel;
    backward recomputes through the XLA composite. With ffn_pair_k1 this
    moves ALL of the SK dw chain's elementwise work (k1 stage + both
    residual erf-gelus) into the MXU-bound FFN kernels, leaving the
    cond-shielded branch pure convolution."""
    return _ffn_pair_fwd(x, w1, b1, w2, b2, wp=wp, bp=bp, yres=y, db=db,
                         residual=residual, gelu=gelu)


def _dwres_fwd(x, y, db, wp, bp, w1, b1, w2, b2, residual, gelu):
    return (dwres_pw_ffn_pair(x, y, db, wp, bp, w1, b1, w2, b2, residual,
                              gelu),
            (x, y, db, wp, bp, w1, b1, w2, b2))


def _dwres_bwd(residual, gelu, res, g):
    x, y, db, wp, bp, w1, b1, w2, b2 = res
    _, vjp = jax.vjp(
        lambda xx, yy, dd, pp, pb, *a: ffn_pair_xla(
            xx, *a, residual=residual, wp=pp, bp=pb, yres=yy, db=dd,
            gelu=gelu),
        x, y, db, wp, bp, w1, b1, w2, b2)
    return vjp(g)


dwres_pw_ffn_pair.defvjp(_dwres_fwd, _dwres_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def ln_ffn_pair(x, g, be, w1, b1, w2, b2, add_res=True, gelu="erf"):
    """LayerNorm prologue + FFN pair + plain residual epilogue in one kernel
    (the Twins pre-norm MLP, x + mlp(norm2(x)) — reference timm
    twins.Block.forward); backward recomputes through the XLA composite."""
    return _ffn_pair_fwd(x, w1, b1, w2, b2, ln_g=g, ln_b=be,
                         residual=False, add_res=add_res, gelu=gelu)


def _ln_fwd(x, g, be, w1, b1, w2, b2, add_res, gelu):
    return (ln_ffn_pair(x, g, be, w1, b1, w2, b2, add_res, gelu),
            (x, g, be, w1, b1, w2, b2))


def _ln_bwd(add_res, gelu, res, gr):
    x, g, be, w1, b1, w2, b2 = res
    _, vjp = jax.vjp(
        lambda xx, gg, bb, *a: ffn_pair_xla(
            xx, *a, residual=False, ln=(gg, bb), add_res=add_res,
            gelu=gelu),
        x, g, be, w1, b1, w2, b2)
    return vjp(gr)


ln_ffn_pair.defvjp(_ln_fwd, _ln_bwd)
