"""Fused all-pairs correlation lookup (Pallas TPU) — the north-star kernel.

Replaces the reference composite (matmul -> avg_pool pyramid -> 81 bilinear
gathers per level, core/corr.py:13-44) with one kernel per query block:

  1. MXU: scores_l = f1_block @ pooled_f2_l^T / sqrt(C) per pyramid level —
     a (BQ, Nl) matmul slab; the full-rank (N, N) volume never exists in HBM
     (only BQ rows at a time live in VMEM).
  2. The slab is written row-by-row into a zero-initialized padded scratch
     (BQ, Hl+2P, Wl+2P). Bilinear sampling with zero padding makes all
     out-of-image taps contribute 0, so the padding IS the boundary mask:
     query centers are pre-clamped to [-(r+1), dim+r] (beyond which every tap
     carries zero weight anyway) and every (2r+2)^2 window read lands inside
     the padded array with no masking.
  3. Per query: one (2r+2)x(2r+2) dynamic-slice per level (origins/fracs
     scalar-prefetched through SMEM) + the shared bilinear fractional weights
     collapse the 81 samples (the integer-window trick from ops/corr.py).

The kernel writes windows [y, x]-ordered into a (B, N, L, k, k) output; the
host-side wrapper transposes to the reference's x-major channel layout (a
cheap fused XLA transpose).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _corr_kernel(f1_ref, idx_ref, frac_ref, *f2_refs_and_out,
                 radius: int, level_hw, scale: float, block_q: int):
    """One grid cell = one (batch-pair, query-block).

    f1_ref:   (1, BQ, C) VMEM       queries
    idx_ref:  (1, BQ, 2*L) SMEM     int32 padded window origins (y, x)/level
    frac_ref: (1, BQ, 2*L) SMEM     f32 fractional weights (fy, fx)/level
    f2_refs_and_out: L pooled-feature refs (1, Nl, C) VMEM, the output ref
                     (1, BQ, L, k, k), then L padded scratch refs.
    """
    n_levels = len(level_hw)
    f2_refs = f2_refs_and_out[:n_levels]
    out_ref = f2_refs_and_out[n_levels]
    scratch_refs = f2_refs_and_out[n_levels + 1:]

    r = radius
    k = 2 * r + 1
    kk = 2 * r + 2

    f1 = f1_ref[0]  # (BQ, C)

    # Stage 1+2: matmul slabs into zero-padded scratches, row by row
    # (no (BQ, N) -> (BQ, H, W) reshape: Mosaic-unsupported shape cast).
    for l in range(n_levels):
        hl, wl, pad = level_hw[l]
        scores = jax.lax.dot_general(
            f1, f2_refs[l][0], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale  # (BQ, hl*wl)
        scratch_refs[l][...] = jnp.zeros_like(scratch_refs[l])
        for y in range(hl):
            scratch_refs[l][:, pad + y, pad:pad + wl] = scores[:, y * wl:(y + 1) * wl]

    # Stage 3: per-query window extraction as two one-hot matmuls per level
    # (Mosaic has no misaligned dynamic window loads; iota-compare selection
    # matrices + MXU contractions are fully supported).
    def body(q, carry):
        for l in range(n_levels):
            hl, wl, pad = level_hw[l]
            hp, wp = hl + 2 * pad, wl + 2 * pad
            fy = frac_ref[0, q, 2 * l]
            fx = frac_ref[0, q, 2 * l + 1]
            ys = idx_ref[0, q, 2 * l]
            xs = idx_ref[0, q, 2 * l + 1]

            s_q = scratch_refs[l][q]  # (Hp, Wp), static full-minor slice

            # rowsel[i, y] = (1-fy)[y==ys+i] + fy[y==ys+i+1]
            offs_r = jax.lax.broadcasted_iota(jnp.int32, (k, hp), 0)
            grid_r = jax.lax.broadcasted_iota(jnp.int32, (k, hp), 1)
            tap_r = grid_r - offs_r
            rowsel = ((tap_r == ys).astype(jnp.float32) * (1.0 - fy)
                      + (tap_r == ys + 1).astype(jnp.float32) * fy)

            offs_c = jax.lax.broadcasted_iota(jnp.int32, (wp, k), 1)
            grid_c = jax.lax.broadcasted_iota(jnp.int32, (wp, k), 0)
            tap_c = grid_c - offs_c
            colsel = ((tap_c == xs).astype(jnp.float32) * (1.0 - fx)
                      + (tap_c == xs + 1).astype(jnp.float32) * fx)

            rows = jax.lax.dot_general(
                rowsel, s_q, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)          # (k, Wp)
            vals = jax.lax.dot_general(
                rows, colsel, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)          # (k, k) [y, x]
            out_ref[0, q, l] = vals
        return carry

    jax.lax.fori_loop(0, block_q, body, 0)


def pool_pyramid(fmap2, num_levels: int = 4):
    """Average-pool pyramid of the target features — O(N*C), tiny next to
    the (N, N) volume the reference materializes."""
    levels = [fmap2]
    for _ in range(num_levels - 1):
        s = jax.lax.reduce_window(
            levels[-1], 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID")
        levels.append(s * 0.25)
    return levels


@functools.partial(jax.jit, static_argnames=("num_levels", "radius", "block_q"))
def corr_lookup_fused(fmap1, fmap2, coords, num_levels: int = 4,
                      radius: int = 4, block_q: int = 64):
    """fmap1, fmap2: (B, H, W, C); coords: (B, H, W, 2) pixel xy.
    Returns (B, H, W, num_levels*(2r+1)^2) fp32."""
    return corr_lookup_fused_pyr(fmap1, pool_pyramid(fmap2, num_levels),
                                 coords, radius=radius, block_q=block_q)


def corr_lookup_fused_pyr(fmap1, f2_levels, coords, radius: int = 4,
                          block_q: int = 64):
    # Features ride VMEM in bf16 (halves the resident pooled pyramid; the
    # matmul still accumulates fp32 — same numerics as the reference's AMP
    # path where fmaps are fp16-valued).
    fmap1 = fmap1.astype(jnp.bfloat16)
    f2_levels = [f.astype(jnp.bfloat16) for f in f2_levels]
    b, h, w, c = fmap1.shape
    n = h * w
    r = radius
    k = 2 * r + 1
    pad = 2 * r + 2  # window origins span [-(2r+1), dim] after clamping

    f2s = []
    level_hw = []
    for cur in f2_levels:
        hl, wl = cur.shape[1], cur.shape[2]
        f2s.append(cur.reshape(b, hl * wl, c))
        level_hw.append((hl, wl, pad))

    # Per-level integer window origins + fracs; centers clamped so every tap
    # either lands in the padded scratch or carries exactly zero weight.
    pts = coords.reshape(b, n, 2).astype(jnp.float32)
    idxs, fracs = [], []
    for l, (hl, wl, _) in enumerate(level_hw):
        ctr = pts / (2.0 ** l)
        cx = jnp.clip(ctr[..., 0], -(r + 1.0), wl + r)
        cy = jnp.clip(ctr[..., 1], -(r + 1.0), hl + r)
        x0 = jnp.floor(cx)
        y0 = jnp.floor(cy)
        fracs.append(jnp.stack([cy - y0, cx - x0], axis=-1))
        # scratch index of the window origin: floor(c) - r + pad
        idxs.append(jnp.stack([y0, x0], axis=-1).astype(jnp.int32) - r + pad)
    idx = jnp.concatenate(idxs, axis=-1)    # (B, N, 2L) [y, x] per level
    frac = jnp.concatenate(fracs, axis=-1)  # (B, N, 2L) [fy, fx] per level

    # Pad queries to a block multiple.
    n_pad = (-n) % block_q
    f1 = fmap1.reshape(b, n, c)
    if n_pad:
        f1 = jnp.pad(f1, ((0, 0), (0, n_pad), (0, 0)))
        idx = jnp.pad(idx, ((0, 0), (0, n_pad), (0, 0)))
        frac = jnp.pad(frac, ((0, 0), (0, n_pad), (0, 0)))
    n_tot = n + n_pad
    n_levels = len(level_hw)

    grid = (b, n_tot // block_q)
    scratch_shapes = [
        pltpu.VMEM((block_q, hl + 2 * p, wl + 2 * p), jnp.float32)
        for hl, wl, p in level_hw
    ]

    out = pl.pallas_call(
        functools.partial(
            _corr_kernel, radius=radius, level_hw=tuple(level_hw),
            scale=1.0 / math.sqrt(c), block_q=block_q,
        ),
        out_shape=jax.ShapeDtypeStruct((b, n_tot, n_levels, k, k),
                                       jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, c), lambda bi, qi: (bi, qi, 0)),
            pl.BlockSpec((1, block_q, idx.shape[-1]),
                         lambda bi, qi: (bi, qi, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, block_q, frac.shape[-1]),
                         lambda bi, qi: (bi, qi, 0),
                         memory_space=pltpu.SMEM),
        ] + [
            pl.BlockSpec((1, f2.shape[1], c), lambda bi, qi: (bi, 0, 0))
            for f2 in f2s
        ],
        out_specs=pl.BlockSpec((1, block_q, n_levels, k, k),
                               lambda bi, qi: (bi, qi, 0, 0, 0)),
        scratch_shapes=scratch_shapes,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
    )(f1, idx, frac, *f2s)

    # [y, x] windows -> the reference's x-major channel order.
    out = out[:, :n].transpose(0, 1, 2, 4, 3)
    return out.reshape(b, h, w, n_levels * k * k)
