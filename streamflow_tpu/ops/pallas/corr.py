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

import flax.struct
import jax


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
        if jax.default_backend() == "tpu":
            from streamflow_tpu.ops.pallas._corr_kernel import (
                corr_lookup_fused_pyr,
            )

            return corr_lookup_fused_pyr(self.fmap1, list(self.f2_levels),
                                         coords, radius=self.radius)
        # Off-TPU: XLA composite on the already-pooled pyramid.
        from streamflow_tpu.ops.corr import CorrPyramid, corr_volume

        import jax.numpy as jnp

        b, h, w, c = self.fmap1.shape
        levels = []
        f1 = self.fmap1.reshape(b, h * w, c)
        for lvl in self.f2_levels:
            hl, wl = lvl.shape[1], lvl.shape[2]
            vol = jax.lax.dot_general(
                f1, lvl.reshape(b, hl * wl, c),
                (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            ) / jnp.sqrt(jnp.float32(c))
            levels.append(vol.reshape(b, h * w, hl, wl))
        return CorrPyramid(levels=tuple(levels), radius=self.radius,
                           h=h, w=w).lookup(coords)
