"""Fused correlation for the model's corr_impl='pallas' path.

Unlike the XLA CorrPyramid (which materializes the full (N, N) volume once,
then looks up per iteration), PallasCorr stores only fmap1 and the pooled
fmap2 pyramid — O(N*C) instead of O(N^2) HBM — and fuses the volume matmul
with the radius-window lookup per refinement iteration
(ops/pallas/_fused_lookup_kernel.py). This both unlocks 1080p+ inputs
without tiling (reference needs flash-attn + tiled inference there,
SURVEY §5.7) and beats reading a materialized volume at benchmark
resolution: the recompute is a dense MXU matmul (~0.4 ms/iteration at
440x1024) while the saved volume traffic is ~400 MB/iteration.

Falls back to the XLA composite off-TPU (the kernel itself is exercised on
CPU in tests via the Pallas interpreter). Differentiable via custom_vjp: the
backward recomputes through the XLA composite (training-only cost).
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


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _fused_lookup(fmap1, f2_levels, coords, radius, out_dtype):
    if jax.default_backend() == "tpu":
        from streamflow_tpu.ops.pallas._fused_lookup_kernel import (
            fused_corr_lookup,
        )

        # Fence the Mosaic custom-call's operands: its mandatory default
        # layouts otherwise leak into XLA's global layout assignment and
        # deoptimize unrelated convolutions in the surrounding scan body.
        fmap1, f2_levels, coords = jax.lax.optimization_barrier(
            (fmap1, tuple(f2_levels), coords))
        return fused_corr_lookup(fmap1, tuple(f2_levels), coords,
                                 radius=radius, out_dtype=out_dtype)
    out = _xla_equiv(fmap1, f2_levels, coords, radius)
    return out.astype(out_dtype) if out_dtype is not None else out


def _fused_fwd(fmap1, f2_levels, coords, radius, out_dtype):
    return _fused_lookup(fmap1, f2_levels, coords, radius, out_dtype), (
        fmap1, f2_levels, coords)


def _fused_bwd(radius, out_dtype, res, g):
    import jax.numpy as jnp

    fmap1, f2_levels, coords = res
    _, vjp = jax.vjp(lambda a, b, c: _xla_equiv(a, b, c, radius),
                     fmap1, f2_levels, coords)
    return vjp(g.astype(jnp.float32))


_fused_lookup.defvjp(_fused_fwd, _fused_bwd)


@flax.struct.dataclass
class PallasCorr:
    fmap1: jax.Array        # (B, H, W, C), encoder dtype (bf16 under AMP)
    f2_levels: tuple        # pooled fmap2 levels, (B, Hl, Wl, C)
    radius: int = flax.struct.field(pytree_node=False)

    @classmethod
    def build(cls, fmap1, fmap2, num_levels: int = 4, radius: int = 4):
        from streamflow_tpu.ops.pallas._fused_lookup_kernel import (
            pool_pyramid,
        )

        return cls(fmap1=fmap1,
                   f2_levels=tuple(pool_pyramid(fmap2, num_levels)),
                   radius=radius)

    def lookup(self, coords, out_dtype=None):
        out = _fused_lookup(self.fmap1, self.f2_levels, coords, self.radius,
                            out_dtype)
        # The Mosaic custom-call pins default layouts on its operands and
        # results; without a barrier XLA propagates that layout pressure
        # through the scan body and drops the spatially-tiled convolution
        # layouts of the whole update block (measured: flow_head 15x15 dw
        # went 4 -> 64 ms/clip). The barrier confines the kernel's layout
        # choices to the lookup itself.
        return jax.lax.optimization_barrier(out)
