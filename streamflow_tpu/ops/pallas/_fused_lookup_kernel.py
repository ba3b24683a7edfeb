"""Fused correlation lookup (v5): volume recompute + window extraction in one
Pallas kernel, fully vectorized over queries.

Replaces the reference composite `matmul -> avg_pool pyramid -> grid_sample
gather` (core/corr.py:13-44) per refinement iteration. The (N, N) volume
never exists: per query block the kernel recomputes volume planes on the MXU
from fmap1 and the pooled-fmap2 pyramid and extracts each query's radius
window on the VPU.

Why this shape (r1/r2 lessons): per-query inner loops (r1 kernels) and
per-query batched-tiny-matmuls (the XLA one-hot path) are dispatch-bound at
~1 ms per level per iteration regardless of data size; lane-granular
slice/roll sequences (v4) lower poorly in Mosaic. v5 is built on the two
primitives the VPU executes natively — dense (Q,128) FMAs and the per-row
lane gather (DynamicGather, single 128-lane tile) — with NO per-query work:

  for h in [hmin, hmax):                     # dynamic row range, U-unrolled
    plane = f1_block @ f2_l[h].T             # (Q, wp) fp32, MXU
    win   = lane_gather(plane, s + j_of)     # per-query x-window, broadcast
                                             # to output lanes (i,j) = j*k+i
    acc  += ybilerp_weight(h)[i_of] * win    # ONE masked FMA per plane

  out = acc*(1-fx) + lane_gather(acc, +k)*fx # x-bilerp in lane space

The accumulator lanes ARE the reference channel order (x-major windows,
core/corr.py:33-44), so the output needs no permutation — lanes [0, 81) of
each level's 128-lane group are the 324-channel corr features.

Out-of-range taps: f2 carries zero padding left/right (grid_sample zero
semantics for free); out-of-range y rows match no lane weight. The scale
1/sqrt(C) is folded into the y weights; accumulation is fp32.

Cost model at 440x1024 (Q=512, C=256): MXU ~76 GMAC/iteration (dense volume
recompute incl. lane padding), VPU ~2.5M vector-ops/iteration, HBM ~50
MB/iteration vs ~400 MB/iteration for reading a materialized bf16 volume.
"""

from __future__ import annotations

import functools
import math
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

PAD_L = 16  # zero columns left of every f2 level: the clamped window
            # origin s = x0 - r + PAD_L must stay >= 0 for x0 >= -(r+3)
            # (Mosaic's lane gather wraps negative indices, it does not
            # clamp like XLA gather - found by the on-device parity diff)
UNROLL = 2  # default volume planes per loop step (one MXU matmul feeds U
            # extractions); overridable per call — a bigger slab halves the
            # dynamic-trip fori overhead at the cost of VMEM and wasted
            # edge rows. 2 (not 4): U=4 and U=1 trip a Mosaic codegen fault
            # (TPU worker crash) at specific level-shape sets, e.g. the
            # Spring 1080p pyramid (135,240)+(67,120); U=2 passes every
            # crashing variant and is perf-neutral at benchmark resolution
            # (r5s3, tools/probe_1080p_fault.py)


def _wp_of(wl: int, r: int) -> int:
    """Padded plane width: PAD_L + wl + right pad for the largest tap
    (s + j <= wl + 2r + 11), rounded to a whole number of 128-lane tiles
    (the lane gather operates per tile; see the per-tile select chain)."""
    need = PAD_L + wl + 2 * r + 12
    return -(-need // 128) * 128


def _fused_kernel(rows_ref, idx_ref, frac_ref, f1_ref, *refs, meta,
                  radius: int, scale: float, unroll: int = UNROLL,
                  f2_major: str = "w", rows: str = "dynamic"):
    UNROLL = unroll
    n_levels = len(meta)
    f2_refs = refs[:n_levels]
    out_ref = refs[n_levels]
    acc_ref = refs[n_levels + 1]   # VMEM scratch (Q, 128) fp32
    r = radius
    k = 2 * r + 1

    ks = k + 1

    f1c = f1_ref[0]  # (Q, C)
    q_dim = f1c.shape[0]

    # Accumulation happens in a (k+1)-slot lane layout: lane = j*(k+1) + i
    # with j the x-tap and i the y-row offset d = h - (y0 - r) in [0, k].
    # One extra row slot per x-tap means a plane contributes to exactly ONE
    # slot, so the per-plane work is a single masked add (cmp+sel+add) —
    # the two bilerp taps (rows d and d-1 of the k-row window) are applied
    # ONCE per level at the end as a lane-shift combine, instead of a
    # 2-compare/2-select weight build on every plane (~45% of the VPU
    # extraction chain, the measured gap between the kernel's 1.9 ms/iter
    # and its ~0.8 ms MXU floor).
    lane = jax.lax.broadcasted_iota(jnp.int32, (q_dim, 128), 1)
    i_of = lane % ks          # y slot 0..k
    j_of = lane // ks         # x tap; lanes >= k*(k+1) are scratch
    # output repack: out lane j*k + i reads slot-layout lane j*(k+1) + i
    map0 = jnp.minimum((lane // k) * ks + lane % k, 127)
    map1 = jnp.minimum(map0 + ks, 127)

    for l, (hl, wl) in enumerate(meta):
        wp = _wp_of(wl, r)
        y0 = idx_ref[0, :, 2 * l:2 * l + 1]          # (Q, 1) int32
        x0 = idx_ref[0, :, 2 * l + 1:2 * l + 2]      # (Q, 1) int32
        fy = frac_ref[0, :, 2 * l:2 * l + 1]         # (Q, 1) f32
        fx = frac_ref[0, :, 2 * l + 1:2 * l + 2]

        s = x0 - r + PAD_L                           # window origin, >= 0
        gidx = s + j_of                              # (Q, 128) tap lanes

        if rows in ("full", "static"):
            # whole-level loop with a STATIC trip count: every plane is
            # computed. 'full' Python-unrolls the steps (pipelines best,
            # but the unrolled temporaries blow VMEM on tall levels);
            # 'static' keeps the fori_loop with constant bounds — the safe
            # mode for shapes where the data-dependent trip count hits the
            # Mosaic runtime fault (see below), at full-level compute cost.
            hmin, hmax = 0, hl
            steps = (hl + UNROLL - 1) // UNROLL
        else:
            # Per-block row range from SMEM scalar prefetch, computed on
            # the XLA side. The previous formulation reduced y0 in VMEM
            # (jnp.min/max) and fed the scalar into the fori_loop trip
            # count; that vector->scalar->trip chain hit a Mosaic codegen
            # fault (TPU worker crash) at specific level-shape sets, e.g.
            # the Spring 1080p pyramid — r5s3, tools/probe_1080p_fault.py.
            # SMEM scalars are the scalar core's native home for
            # data-dependent loop bounds.
            bi, qi = pl.program_id(0), pl.program_id(1)
            hmin = rows_ref[bi, qi, 2 * l]
            steps = rows_ref[bi, qi, 2 * l + 1]

        acc_ref[...] = jnp.zeros(acc_ref.shape, acc_ref.dtype)

        # per-tile lane-gather indices: the DynamicGather primitive operates
        # on single 128-lane tiles, so a wp-wide plane is gathered tile by
        # tile and combined with a select chain (any number of tiles — the
        # Spring 1080p level-0 width is 240 -> wp 384, 1440x2560 -> 512)
        n_tiles = wp // 128
        gidx_t = [jnp.clip(gidx - t * 128, 0, 127) for t in range(n_tiles)]
        tile_of = gidx // 128

        def body(step, _, l=l, y0=y0, hmin=hmin, wp=wp,
                 n_tiles=n_tiles, gidx_t=gidx_t, tile_of=tile_of):
            h0 = hmin + step * UNROLL
            if f2_major == "c":
                # C-major level storage (U, C, wp): each row's matmul is the
                # MXU's native (Q, C) @ (C, wp) orientation — no transposed-
                # RHS contraction for Mosaic to lower.
                slab = f2_refs[l][0, pl.ds(h0, UNROLL)]  # (U, C, wp)
                plane = None
            else:
                slab = f2_refs[l][0, pl.ds(h0, UNROLL)]  # (U, wp, C)
                plane = jax.lax.dot_general(
                    f1c, slab.reshape(UNROLL * wp, slab.shape[-1]),
                    (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )                                        # (Q, U*wp)
            for u in range(UNROLL):
                if plane is None:
                    pu = jax.lax.dot_general(
                        f1c, slab[u],
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )                                    # (Q, wp)
                else:
                    pu = plane[:, u * wp:(u + 1) * wp]
                win = jnp.take_along_axis(pu[:, :128], gidx_t[0], axis=1)
                for t in range(1, n_tiles):
                    gt = jnp.take_along_axis(
                        pu[:, t * 128:(t + 1) * 128], gidx_t[t], axis=1)
                    win = jnp.where(tile_of == t, gt, win)
                d = (h0 + u) - (y0 - r)              # (Q, 1)
                acc_ref[...] = acc_ref[...] + jnp.where(d == i_of, win, 0.0)
            return 0

        if rows == "full":
            for st in range(steps):
                body(st, 0)
        else:
            # 'static': constant bounds; 'dynamic': SMEM-prefetched bounds
            jax.lax.fori_loop(0, steps, body, 0)

        # bilerp + repack, once per level. y: rows i and i+1 sit 1 lane
        # apart inside a slot group (i+1 <= k stays in-group for every slot
        # the repack reads). x: taps j and j+1 sit k+1 lanes apart, folded
        # into the repack gathers (map0/map1). scale rides the y weights.
        acc = acc_ref[...]
        shifted = jnp.take_along_axis(acc, jnp.minimum(lane + 1, 127), axis=1)
        cy = acc * ((1.0 - fy) * scale) + shifted * (fy * scale)
        g0 = jnp.take_along_axis(cy, map0, axis=1)
        g1 = jnp.take_along_axis(cy, map1, axis=1)
        out_l = g0 * (1.0 - fx) + g1 * fx
        out_ref[0, :, l * 128:(l + 1) * 128] = out_l.astype(out_ref.dtype)


def prepare_inputs(fmap1, f2_levels, radius: int = 4, block_q: int = 512,
                   unroll: int = UNROLL, f2_major: str = "w"):
    """Pad the refinement-loop-INVARIANT kernel operands once: f1 row-padded
    to a whole number of query blocks, every f2 level lane-padded (PAD_L +
    tile-width right pad + UNROLL-1 zero rows). Calling this at volume-build
    time keeps ~35 MB/iteration of pad copies out of the scan body (XLA does
    not hoist pads feeding a custom call out of a while loop — measured as
    per-call %pad ops in the r3 trace).

    ``f2_major='c'`` stores each level (B, Hl+U-1, C, Wp) — C-major — so the
    kernel's per-row volume matmul is natively oriented (one extra XLA
    transpose per level at build time, outside the refinement loop).

    Returns (f1p (B, n_tot, C), f2p tuple, meta tuple of (hl, wl))."""
    assert f2_major in ("w", "c"), f"f2_major must be 'w' or 'c', got {f2_major!r}"
    UNROLL = unroll
    b, h, w, c = fmap1.shape
    n = h * w
    r = radius
    f1 = fmap1.reshape(b, n, c)
    block_q = min(block_q, max(128, n))
    n_pad = (-n) % block_q
    if n_pad:
        f1 = jnp.pad(f1, ((0, 0), (0, n_pad), (0, 0)))
    meta = []
    f2p = []
    for f2 in f2_levels:
        hl, wl = f2.shape[1], f2.shape[2]
        meta.append((hl, wl))
        wp = _wp_of(wl, r)
        # right pad to the tile width + UNROLL-1 zero rows at the bottom so
        # the unrolled slab slice never clamps
        lvl = jnp.pad(
            f2, ((0, 0), (0, UNROLL - 1), (PAD_L, wp - PAD_L - wl), (0, 0)))
        if f2_major == "c":
            lvl = lvl.transpose(0, 1, 3, 2)  # (B, Hl+U-1, C, Wp)
        f2p.append(lvl)
    return f1, tuple(f2p), tuple(meta)


def unprepare_inputs(f1p, f2p, meta, h, w, f2_major: str = "w"):
    """Slice the original (fmap1, f2_levels) back out of prepared operands
    (used by the recompute backward and the off-TPU fallback)."""
    b, _, c = f1p.shape
    fmap1 = f1p[:, : h * w].reshape(b, h, w, c)
    if f2_major == "c":
        f2_levels = tuple(
            lvl[:, :hl, :, PAD_L:PAD_L + wl].transpose(0, 1, 3, 2)
            for lvl, (hl, wl) in zip(f2p, meta))
    else:
        f2_levels = tuple(
            lvl[:, :hl, PAD_L:PAD_L + wl]
            for lvl, (hl, wl) in zip(f2p, meta))
    return fmap1, f2_levels


@functools.partial(
    jax.jit,
    static_argnames=("meta", "radius", "out_dtype", "block_q", "interpret",
                     "unroll", "f2_major", "rows"))
def fused_corr_lookup_prepared(f1p, f2p, coords, meta, radius: int = 4,
                               out_dtype=None, block_q: int = 512,
                               interpret: bool = False,
                               unroll: int = UNROLL, f2_major: str = "w",
                               rows: str = "dynamic"):
    """Lookup against operands pre-padded by :func:`prepare_inputs` — the
    per-iteration work is only the (B, N, 2L) index/frac computation plus the
    kernel itself. coords (B,H,W,2) level-0 pixel xy. Returns
    (B,H,W,L*(2r+1)^2), channels level-major then x-major windows (reference
    layout)."""
    assert f2_major in ("w", "c"), f"f2_major must be 'w' or 'c', got {f2_major!r}"
    assert rows in ("dynamic", "full", "static"), rows
    UNROLL = unroll
    b, h, w, _ = coords.shape
    c = f1p.shape[-1]
    n = h * w
    r = radius
    k = 2 * r + 1
    assert k * (k + 2) <= 128, "window slot layout exceeds one lane tile"
    n_levels = len(f2p)
    out_dtype = out_dtype or jnp.float32
    scale = 1.0 / math.sqrt(c)

    pts = coords.reshape(b, n, 2).astype(jnp.float32)
    idx_cols, frac_cols = [], []
    for l, (hl, wl) in enumerate(meta):
        ctr = pts / (2.0 ** l)
        # clamps keep the padded window origin s in [0, wp-2r-11] while
        # fully-out-of-range windows read only zero padding
        cy = jnp.clip(ctr[..., 1], -(r + 3.0), hl + r + 3.0)
        cx = jnp.clip(ctr[..., 0], -(r + 3.0), wl + r + 3.0)
        y0 = jnp.floor(cy)
        x0 = jnp.floor(cx)
        idx_cols += [y0.astype(jnp.int32), x0.astype(jnp.int32)]
        frac_cols += [cy - y0, cx - x0]
    idx = jnp.stack(idx_cols, axis=-1)    # (B, N, 2L)
    frac = jnp.stack(frac_cols, axis=-1)  # (B, N, 2L)

    n_tot = f1p.shape[1]
    block_q = min(block_q, max(128, n))
    assert n_tot % block_q == 0, (
        f"prepared f1 rows {n_tot} not a multiple of block_q {block_q}")
    if n_tot != n:
        # padded queries: clamped all-out-of-range windows -> zeros
        idx = jnp.pad(idx, ((0, 0), (0, n_tot - n), (0, 0)),
                      constant_values=-(r + 3))
        frac = jnp.pad(frac, ((0, 0), (0, n_tot - n), (0, 0)))
    f1 = f1p

    grid = (b, n_tot // block_q)
    nb = n_tot // block_q

    # Per-(batch, query-block, level) dynamic row ranges, computed HERE (in
    # XLA) and handed to the kernel as SMEM scalar prefetch — the kernel's
    # fori_loop trip counts must not come from in-kernel VMEM reductions
    # (Mosaic codegen fault; see _fused_kernel).
    y0b = idx.reshape(b, nb, block_q, 2 * n_levels)
    row_cols = []
    for l, (hl, wl) in enumerate(meta):
        y0l = y0b[..., 2 * l]                        # (b, nb) int32 slices
        hmin = jnp.maximum(jnp.min(y0l, axis=2) - r, 0)
        hmax = jnp.minimum(jnp.max(y0l, axis=2) + r + 2, hl)
        steps = jnp.maximum(hmax - hmin + UNROLL - 1, 0) // UNROLL
        row_cols += [hmin, steps]
    row_bounds = jnp.stack(row_cols, axis=-1).astype(jnp.int32)  # (b, nb, 2L)

    out = pl.pallas_call(
        functools.partial(_fused_kernel, meta=tuple(meta), radius=r,
                          scale=scale, unroll=UNROLL, f2_major=f2_major,
                          rows=rows),
        out_shape=jax.ShapeDtypeStruct((b, n_tot, n_levels * 128), out_dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, block_q, 2 * n_levels),
                             lambda bi, qi, sref: (bi, qi, 0)),
                pl.BlockSpec((1, block_q, 2 * n_levels),
                             lambda bi, qi, sref: (bi, qi, 0)),
                pl.BlockSpec((1, block_q, c), lambda bi, qi, sref: (bi, qi, 0)),
            ] + [
                pl.BlockSpec(((1, hl + UNROLL - 1, c, _wp_of(wl, r))
                              if f2_major == "c"
                              else (1, hl + UNROLL - 1, _wp_of(wl, r), c)),
                             lambda bi, qi, sref: (bi, 0, 0, 0))
                for (hl, wl) in meta
            ],
            out_specs=pl.BlockSpec((1, block_q, n_levels * 128),
                                   lambda bi, qi, sref: (bi, qi, 0)),
            scratch_shapes=[
                pltpu.VMEM((block_q, 128), jnp.float32),
            ],
        ),
        compiler_params=pltpu.CompilerParams(
            # debug env overrides (SF_LOOKUP_SEM / SF_LOOKUP_VMEM_MB) exist
            # for the worker-crash stress harness, tools/probe_1080p_fault.py
            dimension_semantics=tuple(
                os.environ.get("SF_LOOKUP_SEM", "arbitrary,arbitrary")
                .split(",")),
            # whole-f2-level residency: the 1440x2560 level-0 block alone is
            # ~34 MB bf16; the default 16 MB scoped limit is far below the
            # physical VMEM
            vmem_limit_bytes=int(
                os.environ.get("SF_LOOKUP_VMEM_MB", "112")) * 2 ** 20,
        ),
        interpret=interpret,
    )(row_bounds, idx, frac, f1, *f2p)

    out = out[:, :n].reshape(b, h, w, n_levels, 128)[..., :k * k]
    return out.reshape(b, h, w, n_levels * k * k)


@functools.partial(
    jax.jit,
    static_argnames=("radius", "out_dtype", "block_q", "interpret", "unroll",
                     "f2_major", "rows"))
def fused_corr_lookup(fmap1, f2_levels, coords, radius: int = 4,
                      out_dtype=None, block_q: int = 512,
                      interpret: bool = False, unroll: int = UNROLL,
                      f2_major: str = "w", rows: str = "dynamic"):
    """One-shot convenience wrapper: prepare + lookup in one call (pads the
    invariant operands every time — inside a refinement loop use
    :func:`prepare_inputs` once and :func:`fused_corr_lookup_prepared` per
    iteration instead)."""
    f1p, f2p, meta = prepare_inputs(fmap1, f2_levels, radius, block_q,
                                    unroll=unroll, f2_major=f2_major)
    return fused_corr_lookup_prepared(
        f1p, f2p, coords, meta, radius=radius, out_dtype=out_dtype,
        block_q=block_q, interpret=interpret, unroll=unroll,
        f2_major=f2_major, rows=rows)


def pool_pyramid(fmap2, num_levels: int = 4):
    """Pooled fmap2 pyramid: exact torch avg_pool2d(2,2) semantics (VALID,
    drops odd remainders). Pooling features commutes with the volume dot
    product, so looking up level l of the pooled-feature volume equals the
    reference's pooled-volume lookup (core/corr.py:19-21)."""
    levels = [fmap2]
    for _ in range(num_levels - 1):
        x = levels[-1]
        h2 = (x.shape[1] // 2) * 2
        w2 = (x.shape[2] // 2) * 2
        x = x[:, :h2, :w2]
        s = (x[:, 0::2, 0::2] + x[:, 0::2, 1::2]
             + x[:, 1::2, 0::2] + x[:, 1::2, 1::2])
        levels.append(s * 0.25)
    return levels
