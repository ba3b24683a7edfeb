"""Decompose the fused corr-lookup kernel's per-iteration cost on the live
backend.

The r4s4 trace puts the kernel at 1.85 ms/iteration at the benchmark shape
vs a ~0.8 ms MXU floor (docstring cost model). This probe measures kernel
variants that drop parts of the work, so the gap can be attributed:

  full      - the production kernel
  mm_only   - volume matmuls only (accumulate plane sums; no gathers)
  ex_only   - extraction chain only (gathers/selects on a constant plane;
              no matmuls)
  l0_only   - full work, level 0 only
  l123_only - full work, levels 1-3 only
  nofori    - full work, static row loop over the whole level (no dynamic
              trip count: hmin=0, hmax=hl — more planes, zero scalar-bound
              work per block)

Each variant is a standalone pallas_call built from the same prepared
operands as production; timing chains n_rep calls through a device scalar
(same scheme as bench.py).

Usage: python tools/probe_lookup.py [--reps N] [--height H] [--width W]
"""

import functools
import math
import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

from streamflow_tpu.ops.pallas import _fused_lookup_kernel as FK  # noqa: E402


def variant_kernel(idx_ref, frac_ref, f1_ref, *refs, meta, radius, scale,
                   unroll, mode):
    n_levels = len(meta)
    f2_refs = refs[:n_levels]
    out_ref = refs[n_levels]
    acc_ref = refs[n_levels + 1]
    r = radius
    k = 2 * r + 1
    ks = k + 1
    U = unroll

    f1c = f1_ref[0]
    q_dim = f1c.shape[0]
    lane = jax.lax.broadcasted_iota(jnp.int32, (q_dim, 128), 1)
    i_of = lane % ks
    j_of = lane // ks
    map0 = jnp.minimum((lane // k) * ks + lane % k, 127)
    map1 = jnp.minimum(map0 + ks, 127)

    levels = range(n_levels)
    if mode == "l0_only":
        levels = [0]
    elif mode == "l123_only":
        levels = range(1, n_levels)

    for l in levels:
        hl, wl = meta[l]
        wp = FK._wp_of(wl, r)
        y0 = idx_ref[0, :, 2 * l:2 * l + 1]
        x0 = idx_ref[0, :, 2 * l + 1:2 * l + 2]
        fy = frac_ref[0, :, 2 * l:2 * l + 1]
        fx = frac_ref[0, :, 2 * l + 1:2 * l + 2]

        s = x0 - r + FK.PAD_L
        gidx = s + j_of

        if mode == "nofori":
            hmin, hmax = 0, hl
            steps = (hmax - hmin + U - 1) // U
        else:
            hmin = jnp.maximum(jnp.min(y0) - r, 0)
            hmax = jnp.minimum(jnp.max(y0) + r + 2, hl)
            steps = (hmax - hmin + U - 1) // U

        acc_ref[...] = jnp.zeros(acc_ref.shape, acc_ref.dtype)

        n_tiles = wp // 128
        gidx_t = [jnp.clip(gidx - t * 128, 0, 127) for t in range(n_tiles)]
        tile_of = gidx // 128

        def body(step, _, l=l, y0=y0, hmin=hmin, wp=wp,
                 n_tiles=n_tiles, gidx_t=gidx_t, tile_of=tile_of):
            h0 = hmin + step * U
            slab = f2_refs[l][0, pl.ds(h0, U)]
            if mode == "ex_only":
                plane = None
            else:
                plane = jax.lax.dot_general(
                    f1c, slab.reshape(U * wp, slab.shape[-1]),
                    (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            for u in range(U):
                if mode == "ex_only":
                    pu = slab[u, :, :q_dim].T * 0.0 + 1.0  # placeholder work
                    pu = jnp.zeros((q_dim, wp), jnp.float32)
                else:
                    pu = plane[:, u * wp:(u + 1) * wp]
                if mode == "mm_only":
                    # accumulate a plane reduction w/o gathers so the matmul
                    # cannot be dead-code-eliminated
                    acc_ref[...] = acc_ref[...] + pu[:, :128]
                    continue
                win = jnp.take_along_axis(pu[:, :128], gidx_t[0], axis=1)
                for t in range(1, n_tiles):
                    gt = jnp.take_along_axis(
                        pu[:, t * 128:(t + 1) * 128], gidx_t[t], axis=1)
                    win = jnp.where(tile_of == t, gt, win)
                d = (h0 + u) - (y0 - r)
                acc_ref[...] = acc_ref[...] + jnp.where(d == i_of, win, 0.0)
            return 0

        if mode == "nofori":
            for st in range(steps):
                body(st, 0)
        else:
            jax.lax.fori_loop(0, steps, body, 0)

        acc = acc_ref[...]
        shifted = jnp.take_along_axis(acc, jnp.minimum(lane + 1, 127), axis=1)
        cy = acc * ((1.0 - fy) * scale) + shifted * (fy * scale)
        g0 = jnp.take_along_axis(cy, map0, axis=1)
        g1 = jnp.take_along_axis(cy, map1, axis=1)
        out_l = g0 * (1.0 - fx) + g1 * fx
        out_ref[0, :, l * 128:(l + 1) * 128] = out_l.astype(out_ref.dtype)
    if mode == "l0_only":
        for l in range(1, n_levels):
            out_ref[0, :, l * 128:(l + 1) * 128] = jnp.zeros(
                (q_dim, 128), out_ref.dtype)
    elif mode == "l123_only":
        out_ref[0, :, :128] = jnp.zeros((q_dim, 128), out_ref.dtype)


def build(mode, f1p, f2p, meta, coords, radius=4, block_q=512, unroll=4):
    b, h, w, _ = coords.shape
    c = f1p.shape[-1]
    n = h * w
    r = radius
    n_levels = len(f2p)
    scale = 1.0 / math.sqrt(c)

    pts = coords.reshape(b, n, 2).astype(jnp.float32)
    idx_cols, frac_cols = [], []
    for l, (hl, wl) in enumerate(meta):
        ctr = pts / (2.0 ** l)
        cy = jnp.clip(ctr[..., 1], -(r + 3.0), hl + r + 3.0)
        cx = jnp.clip(ctr[..., 0], -(r + 3.0), wl + r + 3.0)
        y0 = jnp.floor(cy)
        x0 = jnp.floor(cx)
        idx_cols += [y0.astype(jnp.int32), x0.astype(jnp.int32)]
        frac_cols += [cy - y0, cx - x0]
    idx = jnp.stack(idx_cols, axis=-1)
    frac = jnp.stack(frac_cols, axis=-1)
    n_tot = f1p.shape[1]
    if n_tot != n:
        idx = jnp.pad(idx, ((0, 0), (0, n_tot - n), (0, 0)),
                      constant_values=-(r + 3))
        frac = jnp.pad(frac, ((0, 0), (0, n_tot - n), (0, 0)))

    grid = (b, n_tot // block_q)

    @jax.jit
    def run(eps):
        out = pl.pallas_call(
            functools.partial(variant_kernel, meta=tuple(meta), radius=r,
                              scale=scale, unroll=unroll, mode=mode),
            out_shape=jax.ShapeDtypeStruct(
                (b, n_tot, n_levels * 128), jnp.float32),
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, block_q, 2 * n_levels),
                             lambda bi, qi: (bi, qi, 0)),
                pl.BlockSpec((1, block_q, 2 * n_levels),
                             lambda bi, qi: (bi, qi, 0)),
                pl.BlockSpec((1, block_q, c), lambda bi, qi: (bi, qi, 0)),
            ] + [
                pl.BlockSpec((1, hl + unroll - 1, FK._wp_of(wl, r), c),
                             lambda bi, qi: (bi, 0, 0, 0))
                for (hl, wl) in meta
            ],
            out_specs=pl.BlockSpec((1, block_q, n_levels * 128),
                                   lambda bi, qi: (bi, qi, 0)),
            scratch_shapes=[pltpu.VMEM((block_q, 128), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary", "arbitrary"),
                vmem_limit_bytes=112 * 2 ** 20,
            ),
        )(idx, frac + eps * 1e-20, f1p, *f2p)
        return jnp.mean(out[0, :64]) * 1e-9

    return run


def main():
    args = sys.argv[1:]

    def opt(name, default):
        if name in args:
            i = args.index(name)
            v = int(args[i + 1])
            del args[i:i + 2]
            return v
        return default

    reps = opt("--reps", 30)
    H = opt("--height", 440)
    W = opt("--width", 1024)

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(__file__)), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    h, w, cdim = H // 8, W // 8, 256
    rng = np.random.default_rng(0)
    fmap1 = jnp.asarray(rng.standard_normal((1, h, w, cdim)), jnp.bfloat16)
    fmap2 = jnp.asarray(rng.standard_normal((1, h, w, cdim)), jnp.bfloat16)
    levels = FK.pool_pyramid(fmap2, 4)
    f1p, f2p, meta = FK.prepare_inputs(fmap1, levels, 4, 512)
    # plausible flow coords: identity + a few px of noise
    ys, xs = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing="ij")
    coords = jnp.stack([xs, ys], -1)[None] + jnp.asarray(
        rng.standard_normal((1, h, w, 2)) * 3.0, jnp.float32)

    # RTT floor
    @jax.jit
    def nop(e):
        return e + 1.0

    float(nop(jnp.float32(0.0)))
    t0 = time.perf_counter()
    z = jnp.float32(0.0)
    for _ in range(reps):
        z = nop(z)
    float(z)
    floor = time.perf_counter() - t0

    print(f"probe_lookup {H}x{W} (fmap {h}x{w}), reps={reps}, "
          f"rtt_floor={1e3 * floor / reps:.3f} ms")
    for mode in ["full", "mm_only", "ex_only", "nofori", "l0_only",
                 "l123_only"]:
        try:
            run = build(mode, f1p, f2p, meta, coords)
            e = jnp.float32(0.0)
            float(run(e))  # compile+warm
            t0 = time.perf_counter()
            for _ in range(reps):
                e = run(e)
            float(e)
            dt = (time.perf_counter() - t0 - floor) / reps
            print(f"  {mode:10s} {1e3 * dt:7.3f} ms/call", flush=True)
        except Exception as ex:
            print(f"  {mode:10s} FAILED: {type(ex).__name__}: {ex}")


if __name__ == "__main__":
    main()
