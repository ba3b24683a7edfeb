"""Fused correlation for the model's corr_impl='pallas' path.

Unlike the XLA CorrPyramid (which materializes the full (N, N) volume once,
then gathers per iteration), PallasCorr stores only fmap1 and the pooled
fmap2 pyramid — O(N*C) instead of O(N^2) HBM — and fuses the volume matmul
with the radius-window lookup per refinement iteration
(ops/pallas/_corr_kernel.py). This is what unlocks 1080p+ inputs without
tiling (reference needs flash-attn + tiled inference there, SURVEY §5.7).

Cost trade: the (BQ, N) matmul slab is recomputed each of the 12-24
iterations instead of read from HBM. At C=256 that is ~C MACs per volume
entry per iteration vs one 4-byte HBM read — on TPU (MXU ~200+ TFLOP/s vs
~0.8 TB/s HBM) the recompute is roughly at parity while saving the O(N^2)
residency entirely.

Falls back to the XLA composite off-TPU (the kernel itself is also exercised
on CPU in tests via the Pallas interpreter).
"""

from __future__ import annotations

import functools

import flax.struct
import jax


def _xla_equiv(fmap1, f2_levels, coords, radius: int):
    """XLA equivalent of the fused kernel (pooled-feature matmul per level +
    one-hot bilinear lookup); identical math, used off-TPU and as the
    recompute backward."""
    import jax.numpy as jnp

    from streamflow_tpu.ops.corr import CorrPyramid

    b, h, w, c = fmap1.shape
    levels = []
    f1 = fmap1.reshape(b, h * w, c)
    for lvl in f2_levels:
        hl, wl = lvl.shape[1], lvl.shape[2]
        vol = jax.lax.dot_general(
            f1, lvl.reshape(b, hl * wl, c),
            (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) / jnp.sqrt(jnp.float32(c))
        levels.append(vol.reshape(b, h * w, hl, wl))
    return CorrPyramid(levels=tuple(levels), radius=radius, h=h,
                       w=w).lookup(coords)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _fused_lookup(fmap1, f2_levels, coords, radius):
    if jax.default_backend() == "tpu":
        from streamflow_tpu.ops.pallas._corr_kernel import (
            corr_lookup_fused_pyr,
        )

        return corr_lookup_fused_pyr(fmap1, list(f2_levels), coords,
                                     radius=radius)
    return _xla_equiv(fmap1, f2_levels, coords, radius)


def _fused_fwd(fmap1, f2_levels, coords, radius):
    return _fused_lookup(fmap1, f2_levels, coords, radius), (
        fmap1, f2_levels, coords)


def _fused_bwd(radius, res, g):
    fmap1, f2_levels, coords = res
    _, vjp = jax.vjp(lambda a, b, c: _xla_equiv(a, b, c, radius),
                     fmap1, f2_levels, coords)
    return vjp(g)


_fused_lookup.defvjp(_fused_fwd, _fused_bwd)


def _xla_equiv_padded(padded_levels, meta, coords, radius: int):
    """XLA math-equivalent of the window kernel over padded levels (used
    off-TPU and as the recompute backward)."""
    import jax.numpy as jnp

    from streamflow_tpu.ops.corr import _lookup_level

    b, h, w, _ = coords.shape
    pts = coords.reshape(b, h * w, 2)
    outs = []
    for lvl_i, (padded, (hl, wl, p, pitch, rows_l)) in enumerate(
            zip(padded_levels, meta)):
        lvl = padded[:, :, p:p + hl, p:p + wl].astype(jnp.float32)
        outs.append(_lookup_level(lvl, pts, lvl_i, radius))
    return jnp.concatenate(outs, axis=-1).reshape(b, h, w, -1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 3))
def _window_lookup(padded_levels, meta, coords, radius):
    if jax.default_backend() == "tpu":
        from streamflow_tpu.ops.pallas._corr_window_kernel import (
            window_lookup_tpu,
        )

        return window_lookup_tpu(list(padded_levels), list(meta), coords,
                                 radius=radius)
    return _xla_equiv_padded(padded_levels, meta, coords, radius)


def _window_fwd(padded_levels, meta, coords, radius):
    return _window_lookup(padded_levels, meta, coords, radius), (
        padded_levels, coords)


def _window_bwd(meta, radius, res, g):
    padded_levels, coords = res
    _, vjp = jax.vjp(lambda pl_, c: _xla_equiv_padded(pl_, meta, c, radius),
                     padded_levels, coords)
    return vjp(g)


_window_lookup.defvjp(_window_fwd, _window_bwd)


@flax.struct.dataclass
class WindowCorr:
    """corr_impl='pallas_window': volume pyramid built once (XLA matmul),
    stored bf16 in a spatially zero-padded layout; the per-iteration
    radius-window lookup runs as the Pallas window kernel
    (ops/pallas/_corr_window_kernel.py) — ~35% faster than the one-hot XLA
    lookup per iteration at 440x1024."""

    padded_levels: tuple
    meta: tuple = flax.struct.field(pytree_node=False)
    radius: int = flax.struct.field(pytree_node=False)

    @classmethod
    def build(cls, fmap1, fmap2, num_levels: int = 4, radius: int = 4,
              store_dtype=None):
        import jax.numpy as jnp

        from streamflow_tpu.ops.corr import CorrPyramid
        from streamflow_tpu.ops.pallas._corr_window_kernel import (
            build_padded_pyramid,
        )

        pyr = CorrPyramid.build(fmap1, fmap2, num_levels, radius)
        padded, meta = build_padded_pyramid(list(pyr.levels), radius,
                                            dtype=store_dtype or jnp.float32)
        return cls(padded_levels=tuple(padded), meta=tuple(meta),
                   radius=radius)

    def lookup(self, coords):
        return _window_lookup(self.padded_levels, self.meta, coords,
                              self.radius)


@flax.struct.dataclass
class PallasCorr:
    fmap1: jax.Array        # (B, H, W, C) fp32
    f2_levels: tuple        # pooled fmap2 levels, (B, Hl, Wl, C)
    radius: int = flax.struct.field(pytree_node=False)

    @classmethod
    def build(cls, fmap1, fmap2, num_levels: int = 4, radius: int = 4):
        from streamflow_tpu.ops.pallas._corr_kernel import pool_pyramid

        return cls(fmap1=fmap1,
                   f2_levels=tuple(pool_pyramid(fmap2, num_levels)),
                   radius=radius)

    def lookup(self, coords):
        return _fused_lookup(self.fmap1, self.f2_levels, coords, self.radius)
