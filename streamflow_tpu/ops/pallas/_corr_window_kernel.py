"""Pallas window-lookup over a prebuilt padded correlation pyramid (v3).

Unlike the fused kernel (_corr_kernel.py, which recomputes the volume matmul
every call), this kernel reads a volume pyramid built once per forward pass —
stored bf16 with spatial zero-padding baked in — and does only the
radius-window extraction:

  per (batch-pair, query-block) grid cell, per query, per level:
    1. one 8-ALIGNED dynamic row-slab load vol[q, align8(y0) : +24, :]
       (Mosaic requires sublane offsets provably divisible by 8; the 24-row
       slab covers any 7-row misalignment + the (2r+2)-row window)
    2. a (k, 24) one-hot row-select matmul folds the sub-slab offset AND the
       y-fraction
    3. a (pitch, k) one-hot col-select matmul folds the x-window + x-fraction

The zero padding doubles as the out-of-range mask (centers pre-clamped to the
zero-weight envelope, as in _corr_kernel.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round8(x: int) -> int:
    return ((x + 7) // 8) * 8


SLAB = 24  # aligned row-slab: 8-misalignment (<=7) + (2r+2)-row window <= 24


def build_padded_pyramid(vol_levels, radius: int = 4, dtype=jnp.bfloat16):
    """Pad each (B, N, Hl, Wl) level to (B, N, rows, pitch) with zeros;
    top pad P = 2r+2 covers every clamped window origin, bottom pad leaves
    room for the aligned SLAB load."""
    p = 2 * radius + 2
    padded = []
    meta = []
    for lvl in vol_levels:
        b, n, hl, wl = lvl.shape
        pitch = _round8(wl + 2 * p)
        rows = _round8(hl + p + SLAB)
        out = jnp.zeros((b, n, rows, pitch), dtype)
        out = jax.lax.dynamic_update_slice(
            out, lvl.astype(dtype), (0, 0, p, p))
        padded.append(out)
        meta.append((hl, wl, p, pitch, rows))
    return padded, meta


def _window_kernel(idx_ref, frac_ref, *vol_and_out, radius: int, meta,
                   block_q: int):
    n_levels = len(meta)
    vol_refs = vol_and_out[:n_levels]
    out_ref = vol_and_out[n_levels]
    r = radius
    k = 2 * r + 1
    kk = 2 * r + 2

    def body(q, carry):
        for l, (hl, wl, p, pitch, rows_l) in enumerate(meta):
            fy = frac_ref[0, q, 2 * l]
            fx = frac_ref[0, q, 2 * l + 1]
            ys = idx_ref[0, q, 2 * l]       # padded row origin (unaligned)
            xs = idx_ref[0, q, 2 * l + 1]   # padded col origin
            ys8 = (ys // 8) * 8             # Mosaic: sublane offsets % 8 == 0
            dy = ys - ys8

            slab = vol_refs[l][0, q, pl.ds(pl.multiple_of(ys8, 8), SLAB), :]
            slab = slab.astype(jnp.float32)             # (SLAB, pitch)

            # row-select with sub-slab offset + y-fraction folded in:
            # rowsel[i, s] = (1-fy)[s==dy+i] + fy[s==dy+i+1]
            offs_r = jax.lax.broadcasted_iota(jnp.int32, (k, SLAB), 0)
            grid_r = jax.lax.broadcasted_iota(jnp.int32, (k, SLAB), 1)
            tap_r = grid_r - offs_r
            rowsel = ((tap_r == dy).astype(jnp.float32) * (1.0 - fy)
                      + (tap_r == dy + 1).astype(jnp.float32) * fy)
            r9 = jax.lax.dot_general(
                rowsel, slab, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)     # (k, pitch)

            cols = jax.lax.broadcasted_iota(jnp.int32, (pitch, k), 0)
            offs = jax.lax.broadcasted_iota(jnp.int32, (pitch, k), 1)
            tap = cols - offs
            colsel = ((tap == xs).astype(jnp.float32) * (1.0 - fx)
                      + (tap == xs + 1).astype(jnp.float32) * fx)

            vals = jax.lax.dot_general(
                r9, colsel, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)      # (k, k) [y, x]
            out_ref[0, q, l] = vals
        return carry

    jax.lax.fori_loop(0, block_q, body, 0)


def window_lookup_tpu(padded_levels, meta, coords, radius: int = 4,
                      block_q: int = 64):
    """padded_levels: list of (B, N, Hl+2P, pitch); coords (B, H, W, 2).
    Returns (B, H, W, L*(2r+1)^2) fp32, x-major windows."""
    b, h, w, _ = coords.shape
    n = h * w
    r = radius
    k = 2 * r + 1
    n_levels = len(meta)

    pts = coords.reshape(b, n, 2).astype(jnp.float32)
    idxs, fracs = [], []
    for l, (hl, wl, p, pitch, rows_l) in enumerate(meta):
        ctr = pts / (2.0 ** l)
        cx = jnp.clip(ctr[..., 0], -(r + 1.0), wl + r)
        cy = jnp.clip(ctr[..., 1], -(r + 1.0), hl + r)
        x0 = jnp.floor(cx)
        y0 = jnp.floor(cy)
        fracs.append(jnp.stack([cy - y0, cx - x0], axis=-1))
        idxs.append(jnp.stack([y0, x0], axis=-1).astype(jnp.int32) - r + p)
    idx = jnp.concatenate(idxs, axis=-1)
    frac = jnp.concatenate(fracs, axis=-1)

    n_pad = (-n) % block_q
    if n_pad:
        idx = jnp.pad(idx, ((0, 0), (0, n_pad), (0, 0)))
        frac = jnp.pad(frac, ((0, 0), (0, n_pad), (0, 0)))
        padded_levels = [
            jnp.pad(v, ((0, 0), (0, n_pad), (0, 0), (0, 0)))
            for v in padded_levels
        ]
    n_tot = n + n_pad

    grid = (b, n_tot // block_q)
    out = pl.pallas_call(
        functools.partial(_window_kernel, radius=radius, meta=tuple(meta),
                          block_q=block_q),
        out_shape=jax.ShapeDtypeStruct((b, n_tot, n_levels, k, k),
                                       jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, idx.shape[-1]),
                         lambda bi, qi: (bi, qi, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, block_q, frac.shape[-1]),
                         lambda bi, qi: (bi, qi, 0),
                         memory_space=pltpu.SMEM),
        ] + [
            pl.BlockSpec((1, block_q, rows_l, pitch),
                         lambda bi, qi: (bi, qi, 0, 0))
            for (hl, wl, p, pitch, rows_l) in meta
        ],
        out_specs=pl.BlockSpec((1, block_q, n_levels, k, k),
                               lambda bi, qi: (bi, qi, 0, 0, 0)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
    )(idx, frac, *padded_levels)

    out = out[:, :n].transpose(0, 1, 2, 4, 3)  # [y,x] -> x-major
    return out.reshape(b, h, w, n_levels * k * k)
