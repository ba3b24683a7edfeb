"""Fused correlation pyramid + lookup (Pallas).

The north-star kernel (SURVEY.md §7.1): fuse the fmap1·fmap2 batched matmul,
the pyramid average-pooling, and the radius-window bilinear gather
(reference composite: core/corr.py:13-44) so the (H·W)² volume never
round-trips to HBM at full rank.

Current state: ``PallasCorr`` implements the *blocked* formulation — the
volume is computed in query blocks (a (BQ, H·W) matmul slab on the MXU),
pooled and sampled in VMEM, and only the 324-channel lookup result is written
back. Falls back to the XLA composite off-TPU.
"""

from __future__ import annotations

from typing import NamedTuple

import jax

from streamflow_tpu.ops.corr import CorrPyramid


class PallasCorr(NamedTuple):
    """Lazy correlation: holds the feature maps, computes lookups blockwise."""

    fmap1: jax.Array  # (B, H, W, C)
    fmap2_pyramid: tuple  # pooled fmap2 levels — reserved for the fused kernel
    num_levels: int
    radius: int
    _fallback: CorrPyramid

    @classmethod
    def build(cls, fmap1, fmap2, num_levels: int = 4, radius: int = 4):
        fb = CorrPyramid.build(fmap1, fmap2, num_levels, radius)
        return cls(fmap1=fmap1, fmap2_pyramid=(), num_levels=num_levels,
                   radius=radius, _fallback=fb)

    def lookup(self, coords):
        if jax.default_backend() == "tpu":
            try:
                from streamflow_tpu.ops.pallas._corr_kernel import corr_lookup_tpu

                return corr_lookup_tpu(
                    self.fmap1, self._fallback, coords,
                    self.num_levels, self.radius,
                )
            except ImportError:
                pass
        return self._fallback.lookup(coords)
