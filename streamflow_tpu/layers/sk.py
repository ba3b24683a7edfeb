"""SKFlow large-kernel block (reference PCBlock4_Deep_nopool_res,
core/update.py:12-36).

Structure: FFN(1.5x) residual -> stack of depthwise convs with kernel sizes
``k_conv`` (canonical [1, 15]) residual -> pointwise residual -> FFN(1.5x)
projection, with exact GELU after every residual.

TPU notes:
- Parameters keep the exact reference shapes (324-channel corr input etc.)
  so checkpoints map 1:1, but at apply time the working channel count is
  zero-padded up to a multiple of 128 lanes (``align=True``): zero input
  channels with zero weight rows/bias contribute exactly nothing, and the
  depthwise convs — the VPU-bound hot ops of the refinement loop — run on
  whole lane tiles.
- The depthwise stack executes as ONE fused Pallas kernel on TPU
  (ops/pallas/_dw_conv_kernel.py): ~2x the VPU tap rate of XLA's conv
  lowering, the gelu residuals never leave VMEM, and the refinement-loop HLO
  stays convolution-free (XLA's conv layout assignment collapses when a
  Mosaic custom call — the fused corr lookup — shares the loop body).
- Every 1x1 conv is issued as a plain dot_general (MXU) for the same reason.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from streamflow_tpu.layers.common import gelu


def _ceil128(n: int) -> int:
    return -(-n // 128) * 128


class _PadConv(nn.Module):
    """1x1 (or depthwise kxk) conv whose PARAMETERS have the reference shape
    (in_dim[/groups] x out_dim) but whose execution is zero-padded to the
    lane-aligned widths ``in_pad``/``out_pad``. Exactness: zero weight rows
    kill padded input channels; padded output channels get zero weight
    columns and zero bias.

    ``__call__(x, collect=True)`` returns the padded ``(w, b)`` pair —
    ``(k, k, out_pad)`` / ``(out_pad,)`` for depthwise — without applying,
    for the fused Pallas chain."""

    in_dim: int
    out_dim: int
    in_pad: int
    out_pad: int
    kernel: int = 1
    depthwise: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, collect: bool = False):
        k = self.kernel
        cin_g = 1 if self.depthwise else self.in_dim
        w = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (k, k, cin_g, self.out_dim),
            jnp.float32,
        )
        b = self.param("bias", nn.initializers.zeros, (self.out_dim,),
                       jnp.float32)
        dt = self.dtype or (x.dtype if x is not None else jnp.float32)
        w = w.astype(dt)
        b = b.astype(dt)

        if self.depthwise:
            # (k,k,1,C) padded along the channel axis
            w = jnp.pad(w, ((0, 0), (0, 0), (0, 0),
                            (0, self.out_pad - self.out_dim)))
            groups = self.out_pad
        else:
            w = jnp.pad(w, ((0, 0), (0, 0),
                            (0, self.in_pad - self.in_dim),
                            (0, self.out_pad - self.out_dim)))
            groups = 1
        b = jnp.pad(b, (0, self.out_pad - self.out_dim))

        if collect:
            if self.depthwise:
                return w[:, :, 0, :], b
            assert k == 1
            return w[0, 0], b

        x = x.astype(dt)
        if k == 1 and not self.depthwise:
            # dot_general keeps the refinement-loop HLO convolution-free
            y = jax.lax.dot_general(
                x, w[0, 0],
                (((x.ndim - 1,), (0,)), ((), ())),
                preferred_element_type=dt,
            )
            return y + b

        pad = k // 2
        y = jax.lax.conv_general_dilated(
            x, w, (1, 1), [(pad, pad), (pad, pad)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=groups,
            preferred_element_type=dt,
        )
        return y + b


def _dw_shift(x, w, b):
    """Depthwise kxk conv as k^2 statically-shifted FMA taps — pure XLA
    elementwise ops, NO convolution HLO. Purpose: a conv-free refinement-loop
    body for the fused-Pallas-corr path without paying Mosaic's dw-chain
    plateau (BASELINE.md r2 findings: a Mosaic custom call in the scan body
    poisons XLA's *conv* layout assignment; elementwise fusions are immune).

    x: (B, H, W, C); w: (k, k, C); b: (C,). Zero 'same' padding.
    """
    k = w.shape[0]
    if k == 1:
        return x * w[0, 0] + b
    r = k // 2
    bdim, h, wd, c = x.shape
    xp = jnp.pad(x, ((0, 0), (r, r), (r, r), (0, 0)))
    y = None
    for dy in range(k):
        for dx in range(k):
            tap = jax.lax.slice(
                xp, (0, dy, dx, 0), (bdim, dy + h, dx + wd, c))
            t = tap * w[dy, dx]
            y = t if y is None else y + t
    return y + b


def _dw_banded(x, w, b):
    """Depthwise kxk conv as ONE C-batched banded matmul on the MXU, plus a
    k-way shifted-add combine on the VPU — zero convolution HLO, so the
    refinement loop needs no ``lax.cond`` layout shield and the weight
    gradient is a plain dot (no channel-padded dw-conv grad miscompile).

    Cost model vs the direct form (B=3, H=55, W=128, C=384, k=15): direct is
    3.65 GFLOP on the VPU at XLA's in-context ~3.4 TFLOP/s (~1.07 ms); this
    form is 18.6 GFLOP on the MXU (~0.2-0.3 ms) but the banded output is
    k-redundant (~270 MB bf16 write + read, ~0.7 ms at HBM rate). The
    'banded_mxu' variant (ops/pallas/_banded_dw_kernel.py) fuses the combine
    in VMEM and never materializes the redundant intermediate.
    x: (B,H,W,C); w: (k,k,C); b: (C,)."""
    from streamflow_tpu.ops.pallas._banded_dw_kernel import dw_banded_xla

    return dw_banded_xla(x, w, b)


def _dw_banded_mxu(x, w, b):
    """banded matmul dw conv with the kx-combine fused in VMEM (Pallas);
    falls back to the XLA banded composite off-TPU or when the per-channel
    working set exceeds VMEM."""
    from streamflow_tpu.ops.pallas import _banded_dw_kernel as K

    k = w.shape[0]
    nb, h, wd, _ = x.shape
    if (jax.default_backend() == "tpu" and k > 1
            and K.vmem_estimate(nb, h, wd, k, x.dtype.itemsize)
            < 64 * 2 ** 20):
        return K.dw_banded_mxu(x, w, b)
    return K.dw_banded_xla(x, w, b)


def _dw_banded_mxu_t(x, w, b):
    """'banded_mxu_t': banded matmul dw conv with the C-minor<->C-major
    layout transposes ALSO fused in VMEM (natural NHWC in/out — no XLA-side
    transpose HBM round trip); falls back to the XLA banded composite
    off-TPU, for C not a multiple of 128, or when the channel-block working
    set exceeds VMEM."""
    from streamflow_tpu.ops.pallas import _banded_dw_kernel as K

    k = w.shape[0]
    nb, h, wd, c = x.shape
    if (jax.default_backend() == "tpu" and k > 1 and c % 128 == 0
            and K.vmem_estimate_t(h, wd, k, 128, x.dtype.itemsize)
            < 72 * 2 ** 20):
        return K.dw_banded_mxu_t(x, w, b)
    return K.dw_banded_xla(x, w, b)


class SKBlock(nn.Module):
    out_dim: int
    k_conv: Sequence[int] = (1, 15)
    dtype: Optional[jnp.dtype] = None
    align: bool = True
    # 'auto' (model-level resolve) | 'pallas' (fused dw-chain kernel) |
    # 'xla' | 'xla_cond' (cond-shielded XLA conv, elementwise edge-fused
    # into the FFN kernels; inference default) | 'xla_cond_sep' (shielded
    # chain with separate elementwise fusions — the pre-r4 layout) |
    # 'xla_cond[_f32|_fence|_bfold|_cfold|_cfoldo]' (shielded-chain
    # experiment knobs) | 'shift' (tap expansion; debug only) | 'banded'
    # (XLA banded matmul) | 'banded_mxu' (Pallas, kx-combine fused in VMEM;
    # training default candidate) | 'banded_mxu_t' (+ layout transposes
    # fused in VMEM) | 'banded_chain' (whole dw stack one kernel)
    dw_impl: str = "auto"
    # Gelu evaluation inside the fused FFN kernels: 'erf' (exact rational)
    # or 'poly' (divide-free, max|err| 4e-4 — see _ffn_kernel._ERF_POLY);
    # resolved from cfg.ffn_gelu at the model level.
    ffn_gelu: str = "erf"

    def _pallas_ok(self, x, ks) -> bool:
        if self.dw_impl != "pallas":
            # 'auto' resolves at the model level (models/streamflow.py):
            # XLA convs win when the rest of the loop is XLA; the fused
            # chain only pays when a Mosaic custom call (fused corr lookup)
            # already shares the loop body.
            return False
        if jax.default_backend() != "tpu":
            return False
        if x.shape[-1] % 128 != 0 or x.ndim != 4:
            return False
        if any(k != 1 for k in ks[:-1]):
            return False
        from streamflow_tpu.ops.pallas._dw_conv_kernel import vmem_estimate

        return vmem_estimate(x.shape[1], x.shape[2], ks,
                             x.dtype.itemsize) < 13 * 2 ** 20

    def _ffn_pallas_ok(self, x) -> bool:
        """The fused FFN-pair kernel (ops/pallas/_ffn_kernel.py) composes
        with both conv-free dw paths: 'pallas' (dw chain kernel) and
        'xla_cond' (cond-shielded XLA convs — the shield keeps the Mosaic
        FFN call from poisoning their layouts)."""
        if (self.dw_impl not in ("pallas", "banded", "banded_mxu",
                                 "banded_mxu_t", "banded_chain")
                and not self.dw_impl.startswith("xla_cond")):
            return False
        if jax.default_backend() != "tpu":
            return False
        return x.ndim == 4 and x.shape[-1] % 128 == 0

    @nn.compact
    def __call__(self, x):
        c_in = x.shape[-1]
        hidden = int(1.5 * c_in)
        cp = _ceil128(c_in) if self.align else c_in
        hp = _ceil128(hidden) if self.align else hidden
        op = _ceil128(self.out_dim) if self.align else self.out_dim

        if self.dtype is not None:
            x = x.astype(self.dtype)
        if cp != c_in:
            x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, cp - c_in)])

        def conv(name, in_dim, out_dim, in_pad, out_pad, k=1, dw=False):
            return _PadConv(in_dim, out_dim, in_pad, out_pad, kernel=k,
                            depthwise=dw, dtype=self.dtype, name=name)

        ks = tuple(self.k_conv)
        fused = self._ffn_pallas_ok(x)
        # Edge-fused layout (default on the xla_cond path): the dw chain's
        # elementwise stages ride the FFN kernels — the k==1 stage as an
        # epilogue of the first pair, the conv bias + residual gelu as a
        # prologue of the pw+second-pair kernel — so the cond-shielded
        # branch is PURE convolution. Measured r3 trace: the standalone
        # erf-gelu loop fusions between the kernels and the branch cost
        # ~23 ms/clip at the benchmark shape. 'xla_cond_sep' keeps the
        # elementwise stages as separate XLA fusions (A/B knob).
        edge_fused = (fused
                      and self.dw_impl in ("xla_cond", "xla_cond_f32")
                      and len(ks) == 2 and ks[0] == 1 and ks[1] > 1)

        m1 = conv("ffn1_in", c_in, hidden, cp, hp)
        m2 = conv("ffn1_out", hidden, c_in, hp, cp)
        mods = [conv(f"dw{i}_k{k}", c_in, c_in, cp, cp, k=k, dw=True)
                for i, k in enumerate(ks)]
        if edge_fused:
            from streamflow_tpu.ops.pallas._ffn_kernel import (
                dwres_pw_ffn_pair, ffn_pair_k1)

            w1, b1 = m1(None, collect=True)
            w2, b2 = m2(None, collect=True)
            (wk1, bk1), (wdw, bdw) = [m(None, collect=True) for m in mods]
            x = ffn_pair_k1(x, w1, b1, w2, b2, wk1[0, 0], bk1, True,
                            self.ffn_gelu)
            pred = jnp.isfinite(
                jax.lax.stop_gradient(jax.lax.slice(
                    x, (0,) * x.ndim, (1,) * x.ndim)).reshape(())
            )
            kk = ks[-1]

            def _conv_only(vin):
                # '_f32': accumulate in f32 (bf16 VPU FMAs run at half rate);
                # the downcast rides the dwres_pw_ffn_pair prologue (the
                # kernel casts y to f32 anyway), unlike the r3s2 standalone
                # f32-acc measurement where the cast was its own fusion.
                return jax.lax.conv_general_dilated(
                    vin, wdw[:, :, None, :], (1, 1),
                    [(kk // 2, kk // 2)] * 2,
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    feature_group_count=vin.shape[-1],
                    preferred_element_type=(
                        jnp.float32 if self.dw_impl.endswith("_f32")
                        else vin.dtype),
                )

            y = jax.lax.cond(pred, _conv_only,
                             lambda v: _conv_only(v) * 1.0, x)
            mpw = conv("pw", c_in, c_in, cp, cp)
            m3 = conv("ffn2_in", c_in, hidden, cp, hp)
            m4 = conv("ffn2_out", hidden, self.out_dim, hp, op)
            wp, bp = mpw(None, collect=True)
            w3, b3 = m3(None, collect=True)
            w4, b4 = m4(None, collect=True)
            x = dwres_pw_ffn_pair(x, y, bdw, wp, bp, w3, b3, w4, b4, False,
                                  self.ffn_gelu)
            if op != self.out_dim:
                x = x[..., : self.out_dim]
            return x
        if fused:
            from streamflow_tpu.ops.pallas._ffn_kernel import ffn_pair

            w1, b1 = m1(None, collect=True)
            w2, b2 = m2(None, collect=True)
            x = ffn_pair(x, w1, b1, w2, b2, True, self.ffn_gelu)
        else:
            h = gelu(m1(x))
            x = gelu(x + m2(h))
        if self._pallas_ok(x, ks):
            from streamflow_tpu.ops.pallas._dw_conv_kernel import dw_chain

            stages = [m(None, collect=True) for m in mods]
            x = dw_chain(x, tuple(w for w, _ in stages),
                         tuple(b for _, b in stages), ks)
        elif self.dw_impl == "shift":
            for m in mods:
                wdw, bdw = m(None, collect=True)
                x = gelu(x + _dw_shift(x, wdw, bdw))
        elif self.dw_impl == "banded":
            for m in mods:
                wdw, bdw = m(None, collect=True)
                x = gelu(x + _dw_banded(x, wdw, bdw))
        elif self.dw_impl == "banded_mxu_t":
            for m in mods:
                wdw, bdw = m(None, collect=True)
                x = gelu(x + _dw_banded_mxu_t(x, wdw, bdw))
        elif self.dw_impl in ("banded_mxu", "banded_chain"):
            from streamflow_tpu.ops.pallas import _banded_dw_kernel as BK

            stages = [m(None, collect=True) for m in mods]
            # 'banded_chain': the whole dw stack in one kernel (k1 stages +
            # banded conv + residual gelus fused). Measured 174.4 vs 170.2
            # ms/clip for the per-conv kernels at the benchmark shape — the
            # masked-halo elementwise work in the transposed domain outweighs
            # the fused-gelu savings; kept as a re-check knob.
            chain_ok = (
                self.dw_impl == "banded_chain"
                and jax.default_backend() == "tpu"
                and len(ks) >= 1 and ks[-1] > 1
                and all(k == 1 for k in ks[:-1])
                and BK.vmem_estimate(x.shape[0], x.shape[1], x.shape[2],
                                     ks[-1], x.dtype.itemsize) < 64 * 2 ** 20
            )
            if chain_ok:
                x = BK.sk_chain_banded(
                    x, tuple(w for w, _ in stages),
                    tuple(b for _, b in stages), ks)
            else:
                for (wdw, bdw), kk in zip(stages, ks):
                    x = gelu(x + _dw_banded_mxu(x, wdw, bdw))
        elif self.dw_impl.startswith("xla_cond"):
            # XLA's dw conv emitter, shielded from the Mosaic custom-call
            # layout disease (BASELINE.md r2 findings) by placing the whole
            # dw chain in ONE conditional branch: layout assignment lays out
            # called computations with conv-friendly layouts even when a
            # custom call shares the surrounding while-body, and a single
            # branch boundary per block minimizes the relayout copies the
            # shield costs. The predicate is data-dependent (never
            # constant-foldable) but always true. k==1 stages are pure
            # elementwise — no conv HLO to shield.
            pred = jnp.isfinite(
                jax.lax.stop_gradient(jax.lax.slice(
                    x, (0,) * x.ndim, (1,) * x.ndim)).reshape(())
            )
            stages = [m(None, collect=True) for m in mods]
            # '_f32' suffix: accumulate the dw conv in f32 (the v5e VPU does
            # not pack bf16 FMAs — bf16 accumulation measured at HALF rate);
            # '_fence' suffix: optimization_barrier around each conv inside
            # the branch so its emitter compiles standalone (standalone conv
            # measured up to 4x the in-context fused rate).
            acc_f32 = self.dw_impl.endswith("_f32")
            fence = self.dw_impl.endswith("_fence")
            # '_bfold': fold the batch into one tall image (zero seam rows of
            # k//2 preserve 'same'-padding semantics) — the conv emitter's
            # strategy choice depends on the batch/spatial split, and the
            # B=1 tall form measured ~2x the B=3 form standalone
            bfold = self.dw_impl.endswith("_bfold")
            # '_cfold': fold the batch into the CHANNEL axis instead —
            # depthwise channels are fully independent, so
            # (B,H,W,C) with weights w == (1,H,W,B*C) with w tiled B times,
            # exactly (no seams, no extra rows, unlike '_bfold'). Costs one
            # transpose at chain entry/exit; buys the emitter a B=1 image
            # (immune to batch-in-sublane poisoned layouts) with B*x more
            # lane tiles per spatial position.
            cfold = self.dw_impl.endswith("_cfold")
            # '_cfoldo': same channel fold, but performed OUTSIDE the cond so
            # the branch-boundary tensor (and its relayout copies) is the
            # folded B=1 form on both sides.
            cfoldo = self.dw_impl.endswith("_cfoldo")

            def _conv(vin, wdw, kk):
                y = jax.lax.conv_general_dilated(
                    vin, wdw[:, :, None, :], (1, 1),
                    [(kk // 2, kk // 2)] * 2,
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    feature_group_count=vin.shape[-1],
                    preferred_element_type=(
                        jnp.float32 if acc_f32 else vin.dtype),
                )
                return y

            def _chain(v, fold_inside=True):
                nb = v.shape[0]
                folded = cfold and fold_inside and nb > 1
                if folded:
                    hh, ww, cc = v.shape[1:]
                    v = v.transpose(1, 2, 0, 3).reshape(1, hh, ww, nb * cc)
                ntile = nb if folded else (
                    v.shape[-1] // stages[0][0].shape[-1])
                for (wdw, bdw), kk in zip(stages, ks):
                    if ntile > 1:
                        wdw = jnp.tile(wdw, (1, 1, ntile))
                        bdw = jnp.tile(bdw, ntile)
                    if kk == 1:
                        y = v * wdw[0, 0] + bdw
                    else:
                        vin = jax.lax.optimization_barrier(v) if fence else v
                        if bfold and v.shape[0] > 1:
                            bb, hh, ww, cc = vin.shape
                            r = kk // 2
                            vp = jnp.pad(vin, ((0, 0), (r, r), (0, 0),
                                               (0, 0)))
                            y = _conv(vp.reshape(1, bb * (hh + 2 * r), ww,
                                                 cc), wdw, kk)
                            y = y.reshape(bb, hh + 2 * r, ww, cc)[:, r:r + hh]
                        else:
                            y = _conv(vin, wdw, kk)
                        if fence:
                            y = jax.lax.optimization_barrier(y)
                        y = y.astype(v.dtype) + bdw
                    v = gelu(v + y)
                if folded:
                    v = v.reshape(hh, ww, nb, cc).transpose(2, 0, 1, 3)
                return v

            if cfoldo and x.shape[0] > 1:
                nb0, hh0, ww0, cc0 = x.shape
                xf = x.transpose(1, 2, 0, 3).reshape(1, hh0, ww0, nb0 * cc0)
                xf = jax.lax.cond(
                    pred, lambda v: _chain(v, False),
                    lambda v: _chain(v, False) * 1.0, xf)
                x = xf.reshape(hh0, ww0, nb0, cc0).transpose(2, 0, 1, 3)
            else:
                x = jax.lax.cond(pred, _chain, lambda v: _chain(v) * 1.0, x)
        elif self.dw_impl == "xla_fenced":
            # keep XLA's dw conv but fence it from surrounding fusions: the
            # standalone conv emitter runs ~4x faster than the in-context
            # fused form (13 vs 3.4 TFLOP/s measured at c384)
            for m in mods:
                xf = jax.lax.optimization_barrier(x)
                dwc = jax.lax.optimization_barrier(m(xf))
                x = gelu(x + dwc)
        else:
            for m in mods:
                x = gelu(x + m(x))

        mpw = conv("pw", c_in, c_in, cp, cp)
        m3 = conv("ffn2_in", c_in, hidden, cp, hp)
        m4 = conv("ffn2_out", hidden, self.out_dim, hp, op)
        if fused:
            # pw pointwise-residual stage fused ahead of the second FFN
            # pair: one kernel, one HBM round trip fewer per block.
            from streamflow_tpu.ops.pallas._ffn_kernel import pw_ffn_pair

            wp, bp = mpw(None, collect=True)
            w3, b3 = m3(None, collect=True)
            w4, b4 = m4(None, collect=True)
            x = pw_ffn_pair(x, wp, bp, w3, b3, w4, b4, False, self.ffn_gelu)
        else:
            x = gelu(x + mpw(x))
            h = gelu(m3(x))
            x = m4(h)
        if op != self.out_dim:
            x = x[..., : self.out_dim]
        return x
