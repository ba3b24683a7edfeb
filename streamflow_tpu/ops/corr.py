"""All-pairs correlation volume: construction, pyramid, and radius-window
lookup (reference core/corr.py:6-54), re-designed for TPU.

Differences from the CUDA/torch composite:

- The volume is built with a single batched matmul in fp32 on the MXU and kept
  in the layout (B, N1, H2, W2) with N1 = H1*W1 query pixels.
- The pyramid is exact 2x2/stride-2 average pooling (torch ``avg_pool2d(2,2)``
  drops trailing odd rows/cols; we reproduce that with a VALID reduce_window).
- The lookup exploits that the (2r+1)^2 sample offsets are integers: all 81
  bilinear samples of one query share a single fractional weight, so the
  gather collapses to one (2r+2)^2 integer-tap window per query per level,
  combined with 4 bilinear weights. Out-of-range taps contribute zero
  (grid_sample zero padding).
- Channel ordering of the 324-dim output matches the reference exactly:
  levels outermost, then the window flattened **x-major** (the reference adds
  delta[...,0] to x, core/corr.py:33-37 + utils.py:68).

A fused Pallas kernel that never materializes the full-rank volume lives in
``streamflow_tpu.ops.pallas.corr`` and is selected with ``corr_impl='pallas'``.
"""

from __future__ import annotations

import math
from typing import List, NamedTuple

import flax.struct
import jax
import jax.numpy as jnp


def corr_volume(fmap1: jax.Array, fmap2: jax.Array) -> jax.Array:
    """All-pairs correlation <f1_i, f2_j> / sqrt(C).

    fmap1, fmap2: (B, H, W, C) -> (B, H*W, H, W) fp32.
    """
    b, h, w, c = fmap1.shape
    f1 = fmap1.reshape(b, h * w, c)
    f2 = fmap2.reshape(b, h * w, c)
    vol = jax.lax.dot_general(
        f1,
        f2,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    return (vol / math.sqrt(c)).reshape(b, h * w, h, w)


def _avg_pool2(x: jax.Array) -> jax.Array:
    """2x2 stride-2 average pooling over the trailing two spatial dims of
    (B, N, H, W), VALID padding (drops odd remainders, as torch avg_pool2d).

    Written as strided slices + adds: XLA's reduce_window lowering for tiny
    windows costs ~8ms per level on the 600MB level-0 volume at 440x1024;
    the slicing form fuses to a single pass."""
    h2 = (x.shape[-2] // 2) * 2
    w2 = (x.shape[-1] // 2) * 2
    x = x[..., :h2, :w2]
    s = (x[..., 0::2, 0::2] + x[..., 0::2, 1::2]
         + x[..., 1::2, 0::2] + x[..., 1::2, 1::2])
    return s * 0.25


def corr_pyramid(vol: jax.Array, num_levels: int = 4) -> List[jax.Array]:
    """Average-pool pyramid over the *target* dims (reference core/corr.py:19-21)."""
    pyr = [vol]
    for _ in range(num_levels - 1):
        pyr.append(_avg_pool2(pyr[-1]))
    return pyr


def _onehot_bilinear(center: jax.Array, dim: int, radius: int) -> jax.Array:
    """Interpolation matrix for the k=2r+1 window samples along one axis.

    center: (B, N) fractional sample centers (already level-scaled).
    Returns (B, N, k, dim): row i holds the bilinear weights of sample
    center + (i - r) against the integer grid [0, dim). Out-of-range taps
    match no grid point, reproducing grid_sample's zero padding exactly.
    """
    r = radius
    k = 2 * r + 1
    c0 = jnp.floor(center)
    frac = (center - c0)[..., None, None]                      # (B, N, 1, 1)
    base = c0[..., None] + jnp.arange(-r, r + 1, dtype=center.dtype)  # (B, N, k)
    grid = jnp.arange(dim, dtype=center.dtype)
    lo = (base[..., None] == grid).astype(center.dtype)        # (B, N, k, dim)
    hi = (base[..., None] + 1 == grid).astype(center.dtype)
    return lo * (1 - frac) + hi * frac


def _lookup_level(corr_l: jax.Array, coords: jax.Array, level: int, radius: int) -> jax.Array:
    """Sample one pyramid level at a (2r+1)^2 window around coords / 2**level.

    corr_l: (B, N, Hl, Wl); coords: (B, N, 2) pixel xy at level 0.
    Returns (B, N, (2r+1)**2), window flattened x-major.

    TPU note: implemented gather-free as two one-hot bilinear matmuls per
    query (rows then columns) — batched (k, Hl) @ (Hl, Wl) @ (Wl, k)
    contractions the MXU eats, instead of a (2r+2)^2-taps-per-query gather
    (XLA's gather lowering costs ~30ms/iter at 1/8-res 512-wide inputs; the
    matmul form costs <1ms).
    """
    b, n, hl, wl = corr_l.shape
    ctr = coords.astype(jnp.float32) / (2.0 ** level)
    oy = _onehot_bilinear(ctr[..., 1], hl, radius)  # (B, N, k, Hl)
    ox = _onehot_bilinear(ctr[..., 0], wl, radius)  # (B, N, k, Wl)
    # int8-stored volumes contract in bf16 (int8 magnitudes <= 127 are exact
    # in bf16); the convert fuses into the dot so HBM reads stay 1 byte/elem.
    cd = jnp.bfloat16 if corr_l.dtype == jnp.int8 else corr_l.dtype
    rows = jnp.einsum("bnkh,bnhw->bnkw", oy.astype(cd), corr_l.astype(cd),
                      preferred_element_type=jnp.float32)
    # out[..., ix, iy]: x-major window order (reference flattens with
    # delta[...,0] added to x, core/corr.py:33-44)
    out = jnp.einsum("bnxw,bnyw->bnxy", ox.astype(cd),
                     rows.astype(cd),
                     preferred_element_type=jnp.float32)
    k = 2 * radius + 1
    return out.reshape(b, n, k * k)


@flax.struct.dataclass
class CorrPyramid:
    """Precomputed correlation pyramid for one frame pair.

    Functional analogue of the reference's CorrBlock object
    (core/corr.py:6-44): build once per forward pass, look up per iteration.
    radius/h/w are static pytree aux-data (safe under scan/remat/jit).
    """

    levels: tuple  # tuple of (B, N, Hl, Wl) arrays
    radius: int = flax.struct.field(pytree_node=False)
    h: int = flax.struct.field(pytree_node=False)
    w: int = flax.struct.field(pytree_node=False)
    # per-level (B,) fp32 dequantization scales when the volume is stored
    # int8; empty tuple = direct (fp32/bf16) storage
    scales: tuple = ()

    @classmethod
    def build(
        cls,
        fmap1: jax.Array,
        fmap2: jax.Array,
        num_levels: int = 4,
        radius: int = 4,
        store_dtype=None,
        quantize: bool = False,
    ) -> "CorrPyramid":
        """store_dtype=bf16 halves the volume's HBM residency and the
        per-iteration lookup reads; ``quantize=True`` stores each level as
        int8 with a per-(batch, level) absmax/127 scale — 4x less HBM
        traffic than fp32 on the dominant per-iteration volume stream, with
        the dequant applied AFTER the bilinear contraction (the lookup is
        linear in the volume).

        Each level is computed as fmap1 @ avgpool^l(fmap2): pooling commutes
        with the dot product, so this equals avg-pooling the level-0 volume
        (reference core/corr.py:19-21) in fp32 exactly — while replacing the
        ~600 MB/level fp32 pyramid pooling passes with one extra MXU matmul
        per level (~17 GMAC total at 440x1024, measured ~8 ms/clip saved)."""
        b, h, w, c = fmap1.shape
        f1 = fmap1.reshape(b, h * w, c)
        scale = 1.0 / math.sqrt(c)
        levels = []
        scales = []
        f2 = fmap2
        for lv in range(num_levels):
            if lv:
                h2 = (f2.shape[1] // 2) * 2
                w2 = (f2.shape[2] // 2) * 2
                x = f2[:, :h2, :w2]
                # pool in fp32: bilinearity keeps this exactly equal to
                # pooling the fp32 volume
                f2 = 0.25 * (
                    x[:, 0::2, 0::2].astype(jnp.float32)
                    + x[:, 0::2, 1::2] + x[:, 1::2, 0::2] + x[:, 1::2, 1::2]
                )
            hl, wl = f2.shape[1], f2.shape[2]
            # explicit channel dim: levels can pool to zero-size spatial
            # dims on tiny inputs (their windows are all out of range)
            vol = jax.lax.dot_general(
                f1, f2.reshape(b, hl * wl, c).astype(f1.dtype),
                (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            ) * scale
            vol = vol.reshape(b, h * w, hl, wl)
            if quantize:
                s = jnp.maximum(
                    jnp.max(jnp.abs(vol), axis=(1, 2, 3)), 1e-12) / 127.0
                scales.append(s)
                levels.append(
                    jnp.clip(jnp.round(vol / s[:, None, None, None]),
                             -127, 127).astype(jnp.int8))
            else:
                levels.append(vol.astype(store_dtype)
                              if store_dtype is not None else vol)
        return cls(levels=tuple(levels), radius=radius, h=h, w=w,
                   scales=tuple(scales))

    def lookup(self, coords: jax.Array, out_dtype=None) -> jax.Array:
        """coords: (B, H, W, 2) pixel xy -> (B, H, W, L*(2r+1)^2).

        ``out_dtype`` controls the dtype the per-level windows are emitted in
        (default fp32, matching the reference's corr.float()). Under mixed
        precision the consumer (convc1) runs bf16 anyway — emitting bf16 here
        halves the concat/reshape traffic and keeps the downstream SK blocks
        from being promoted to fp32 by the residual adds."""
        b, h, w, _ = coords.shape
        out_dtype = out_dtype or jnp.float32
        pts = coords.reshape(b, h * w, 2)
        outs = []
        for i, lvl in enumerate(self.levels):
            o = _lookup_level(lvl, pts, i, self.radius)
            if self.scales:
                o = o * self.scales[i][:, None, None]
            outs.append(o.astype(out_dtype))
        out = jnp.concatenate(outs, axis=-1)
        return out.reshape(b, h, w, -1)


def corr_lookup(
    fmap1: jax.Array,
    fmap2: jax.Array,
    coords: jax.Array,
    num_levels: int = 4,
    radius: int = 4,
) -> jax.Array:
    """One-shot build + lookup (convenience for tests)."""
    return CorrPyramid.build(fmap1, fmap2, num_levels, radius).lookup(coords)


@flax.struct.dataclass
class ChunkedCorr:
    """Memory-bounded correlation: never materializes the (N, N) volume.

    Stores fmap1 + the pooled fmap2 pyramid (O(N*C) HBM). ``lookup`` sweeps
    query chunks under lax.map: per chunk, an MXU matmul computes that
    chunk's volume rows against each pooled level, immediately consumed by
    the one-hot bilinear window contraction. Peak extra memory is
    chunk * N_level0 fp32 (e.g. 512 x 32400 = 66 MB at Spring 1080p, vs
    4.2 GB/pair for the full volume). This is the high-resolution path the
    reference needs flash-attn + tiling for (SURVEY §5.7).
    """

    fmap1: jax.Array     # (B, H, W, C)
    f2_levels: tuple     # pooled fmap2, (B, Hl, Wl, C) per level
    radius: int = flax.struct.field(pytree_node=False)
    chunk: int = flax.struct.field(pytree_node=False)

    @classmethod
    def build(cls, fmap1, fmap2, num_levels: int = 4, radius: int = 4,
              chunk: int = 1024) -> "ChunkedCorr":
        levels = [fmap2]
        for _ in range(num_levels - 1):
            s = jax.lax.reduce_window(
                levels[-1], 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1),
                "VALID")
            levels.append(s * 0.25)
        return cls(fmap1=fmap1, f2_levels=tuple(levels), radius=radius,
                   chunk=chunk)

    def lookup(self, coords: jax.Array, out_dtype=None) -> jax.Array:
        b, h, w, _ = coords.shape
        out_dtype = out_dtype or jnp.float32
        c = self.fmap1.shape[-1]
        n = h * w
        scale = 1.0 / math.sqrt(c)
        chunk = min(self.chunk, n)
        n_pad = (-n) % chunk
        f1 = self.fmap1.reshape(b, n, c)
        pts = coords.reshape(b, n, 2)
        if n_pad:
            f1 = jnp.pad(f1, ((0, 0), (0, n_pad), (0, 0)))
            pts = jnp.pad(pts, ((0, 0), (0, n_pad), (0, 0)))
        steps = (n + n_pad) // chunk
        f1 = f1.reshape(b, steps, chunk, c).transpose(1, 0, 2, 3)
        pts = pts.reshape(b, steps, chunk, 2).transpose(1, 0, 2, 3)
        f2_flat = [lvl.reshape(b, -1, c) for lvl in self.f2_levels]

        def one_chunk(args):
            f1c, ptc = args  # (B, chunk, C), (B, chunk, 2)
            outs = []
            for lvl, (f2f, f2l) in enumerate(zip(f2_flat, self.f2_levels)):
                hl, wl = f2l.shape[1], f2l.shape[2]
                vol = jax.lax.dot_general(
                    f1c, f2f, (((2,), (2,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                ) * scale
                vol = vol.reshape(b, chunk, hl, wl)
                outs.append(_lookup_level(vol, ptc, lvl, self.radius))
            return jnp.concatenate(outs, axis=-1)

        out = jax.lax.map(one_chunk, (f1, pts))  # (steps, B, chunk, 324)
        out = out.transpose(1, 0, 2, 3).reshape(b, n + n_pad, -1)
        return out[:, :n].reshape(b, h, w, -1).astype(out_dtype)
