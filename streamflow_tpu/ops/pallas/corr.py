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

The stored operands are PRE-PADDED to the kernel's layout
(``prepare_inputs``) at build time: XLA does not hoist pad ops feeding a
custom call out of a while loop, so padding per lookup would re-copy ~35
MB/iteration of loop-invariant data inside the scan body (r3 trace finding).

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


def _xla_equiv_prepared(f1p, f2p, coords, meta, radius, f2_major="w"):
    from streamflow_tpu.ops.pallas._fused_lookup_kernel import (
        unprepare_inputs,
    )

    h, w = coords.shape[1], coords.shape[2]
    fmap1, f2_levels = unprepare_inputs(f1p, f2p, meta, h, w,
                                        f2_major=f2_major)
    return _xla_equiv(fmap1, f2_levels, coords, radius)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7, 8, 9))
def _fused_lookup(f1p, f2p, coords, meta, radius, out_dtype, block_q,
                  unroll, f2_major, rows):
    """Lookup on prepare_inputs-padded operands (differentiable)."""
    if jax.default_backend() == "tpu":
        from streamflow_tpu.ops.pallas._fused_lookup_kernel import (
            fused_corr_lookup_prepared,
        )

        # Fence the Mosaic custom-call's operands: its mandatory default
        # layouts otherwise leak into XLA's global layout assignment and
        # deoptimize unrelated convolutions in the surrounding scan body.
        f1p, f2p, coords = jax.lax.optimization_barrier(
            (f1p, tuple(f2p), coords))
        return fused_corr_lookup_prepared(f1p, tuple(f2p), coords, meta,
                                          radius=radius, out_dtype=out_dtype,
                                          block_q=block_q, unroll=unroll,
                                          f2_major=f2_major, rows=rows)
    out = _xla_equiv_prepared(f1p, f2p, coords, meta, radius, f2_major)
    return out.astype(out_dtype) if out_dtype is not None else out


def _fused_fwd(f1p, f2p, coords, meta, radius, out_dtype, block_q, unroll,
               f2_major, rows):
    return _fused_lookup(f1p, f2p, coords, meta, radius, out_dtype, block_q,
                         unroll, f2_major, rows), (f1p, f2p, coords)


def _fused_bwd(meta, radius, out_dtype, block_q, unroll, f2_major, rows,
               res, g):
    import jax.numpy as jnp

    f1p, f2p, coords = res
    _, vjp = jax.vjp(
        lambda a, b, c: _xla_equiv_prepared(a, b, c, meta, radius, f2_major),
        f1p, f2p, coords)
    return vjp(g.astype(jnp.float32))


_fused_lookup.defvjp(_fused_fwd, _fused_bwd)


@flax.struct.dataclass
class PallasCorr:
    f1p: jax.Array          # (B, n_tot, C) block-padded fmap1 rows
    f2p: tuple              # prepared pyramid levels, (B, Hl+U-1, Wp, C)
    meta: tuple = flax.struct.field(pytree_node=False)  # ((Hl, Wl), ...)
    radius: int = flax.struct.field(pytree_node=False)
    block_q: int = flax.struct.field(pytree_node=False, default=512)
    unroll: int = flax.struct.field(pytree_node=False, default=4)
    # 'w': levels stored (B, Hl+U-1, Wp, C); 'c': C-major (B, Hl+U-1, C, Wp)
    # so the kernel's per-row volume matmul is natively oriented.
    f2_major: str = flax.struct.field(pytree_node=False, default="w")
    # 'dynamic': per-block row range from the query coords (production
    # default — converged flows give narrow ranges); 'full': static
    # whole-level loop (pipelineable; wins when flows are wildly scattered,
    # see _fused_lookup_kernel.py).
    rows: str = flax.struct.field(pytree_node=False, default="dynamic")

    @classmethod
    def build(cls, fmap1, fmap2, num_levels: int = 4, radius: int = 4,
              block_q: int = 512, unroll: int = 4, f2_major: str = "w",
              rows: str = "dynamic"):
        from streamflow_tpu.ops.pallas._fused_lookup_kernel import (
            pool_pyramid,
            prepare_inputs,
        )

        f1p, f2p, meta = prepare_inputs(
            fmap1, tuple(pool_pyramid(fmap2, num_levels)), radius,
            block_q=block_q, unroll=unroll, f2_major=f2_major)
        return cls(f1p=f1p, f2p=f2p, meta=meta, radius=radius,
                   block_q=block_q, unroll=unroll, f2_major=f2_major,
                   rows=rows)

    def lookup(self, coords, out_dtype=None):
        out = _fused_lookup(self.f1p, self.f2p, coords, self.meta,
                            self.radius, out_dtype, self.block_q,
                            self.unroll, self.f2_major, self.rows)
        # The Mosaic custom-call pins default layouts on its operands and
        # results; without a barrier XLA propagates that layout pressure
        # through the scan body and drops the spatially-tiled convolution
        # layouts of the whole update block (measured: flow_head 15x15 dw
        # went 4 -> 64 ms/clip). The barrier confines the kernel's layout
        # choices to the lookup itself.
        return jax.lax.optimization_barrier(out)
