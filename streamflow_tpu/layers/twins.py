"""Twins-SVT encoder, stages 1-2, with StreamFlow's temporal patch embedding
(reference core/encoders/twins_csc.py + timm's public twins_svt_large).

Architecture (twins_svt_large, truncated to stages 1-2 like the reference:
core/encoders/twins_csc.py:52-58):
  stage 1: patch 4, dim 128, depth 2, heads 4, mlp 4, sr 8, ws 7
  stage 2: patch 2, dim 256, depth 2, heads 8, mlp 4, sr 4, ws 7
Each stage: [LocallyGroupedAttn block, GlobalSubSampleAttn block], with the
conditional position encoding (PosConv/PEG, depthwise 3x3 + residual) applied
after the first block.

The temporal trick (Twins_CSC, core/encoders/twins_csc.py:14-34): tokens from
all T frames form ONE sequence laid out as an (H*T/ps, W/ps) grid — frames
stacked along the height axis — so window attention mixes adjacent frames at
window boundaries and the sub-sampled global attention spans all frames.

TPU design notes:
- Everything is (B, N, C) tokens with static (Ht, W) grid sizes, NHWC for the
  convs; all matmuls are MXU-shaped (C in {128, 256}).
- The GSA attention map is N x (N/sr^2); for 1080p inputs it dominates memory,
  so ``gsa_flash`` routes it through the Pallas flash-attention kernel (exact
  same math, O(n) memory); it auto-engages above 16k tokens either way.
"""

from __future__ import annotations

import functools
from functools import partial
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from streamflow_tpu.layers.common import (CollectableDense, CollectableLN,
                                          Mlp, conv2d)


class TemporalPatchEmbed(nn.Module):
    """Patch embedding over a T-frame clip producing one joint token sequence
    (reference PatchEmbed, core/encoders/twins_csc.py:14-34).

    (B, T, H, W, C_in) -> tokens (B, T*h*w, C), grid size (T*h, w).
    """

    patch_size: int
    embed_dim: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x) -> Tuple[jax.Array, Tuple[int, int]]:
        b, t, h, w, c = x.shape
        ps = self.patch_size
        x = x.reshape(b * t, h, w, c)
        x = conv2d(self.embed_dim, ps, stride=ps, padding="VALID",
                   dtype=self.dtype, name="proj")(x)
        hp, wp = x.shape[1], x.shape[2]
        x = x.reshape(b, t * hp * wp, self.embed_dim)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(x)
        return x, (t * hp, wp)


class PosConv(nn.Module):
    """Conditional position encoding (PEG): depthwise 3x3 conv + residual."""

    dim: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, size):
        b, n, c = x.shape
        ht, w = size
        feat = x.reshape(b, ht, w, c)
        out = conv2d(self.dim, 3, padding=1, groups=self.dim,
                     dtype=self.dtype, name="proj")(feat)
        out = out + feat
        return out.reshape(b, n, c)


def lga_xla(x, wqkv, bqkv, wproj, bproj, *, ws: int, nh: int):
    """Windowed MHA on the padded grid — the exact XLA composite the Pallas
    kernel (ops/pallas/_lga_kernel.py) fuses. x: (B, Hp, Wp, C) with Hp, Wp
    window multiples; weights in nn.Dense layout."""
    b, hp, wp, c = x.shape
    dt = x.dtype
    hd = c // nh
    gh, gw = hp // ws, wp // ws

    xw = x.reshape(b, gh, ws, gw, ws, c).transpose(0, 1, 3, 2, 4, 5)
    xw = xw.reshape(b, gh * gw, ws * ws, c)

    qkv = jax.lax.dot_general(
        xw, wqkv.astype(dt), (((3,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dt) + bqkv.astype(dt)
    qkv = qkv.reshape(b, gh * gw, ws * ws, 3, nh, hd)
    q, k, v = qkv[..., 0, :, :], qkv[..., 1, :, :], qkv[..., 2, :, :]
    # (B, G, S, nh, hd) -> (B, G, nh, S, hd)
    q = q.transpose(0, 1, 3, 2, 4) * jnp.asarray(hd ** -0.5, dt)
    k = k.transpose(0, 1, 3, 2, 4)
    v = v.transpose(0, 1, 3, 2, 4)
    attn = jnp.einsum("bgnsd,bgntd->bgnst", q, k,
                      preferred_element_type=jnp.float32)
    attn = jax.nn.softmax(attn, axis=-1).astype(v.dtype)
    out = jnp.einsum("bgnst,bgntd->bgnsd", attn, v)
    out = out.transpose(0, 1, 3, 2, 4).reshape(b, gh, gw, ws, ws, c)
    out = out.transpose(0, 1, 3, 2, 4, 5).reshape(b, hp, wp, c)
    out = jax.lax.dot_general(
        out, wproj.astype(dt), (((3,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dt) + bproj.astype(dt)
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def _lga_fused(x, wqkv, bqkv, wproj, bproj, ws, nh):
    """Hybrid fused forward: the qkv/proj Dense matmuls stay in XLA (they
    are MXU-shaped and fuse with the surrounding LayerNorms); the window
    partition + per-head softmax attention runs as the head-major Pallas
    kernel (ops/pallas/_lga_kernel.py). Backward recomputes through
    lga_xla. Numerics identical to lga_xla on TPU (same dots, same f32
    softmax; the partition commutes with the pointwise Dense)."""
    from streamflow_tpu.ops.pallas._lga_kernel import lga_attention

    dt = x.dtype
    qkv = jax.lax.dot_general(
        x, wqkv.astype(dt), (((3,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dt) + bqkv.astype(dt)
    out = lga_attention(qkv, ws=ws, nh=nh)
    return jax.lax.dot_general(
        out, wproj.astype(dt), (((3,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dt) + bproj.astype(dt)


def _lga_fwd(x, wqkv, bqkv, wproj, bproj, ws, nh):
    return (_lga_fused(x, wqkv, bqkv, wproj, bproj, ws, nh),
            (x, wqkv, bqkv, wproj, bproj))


def _lga_bwd(ws, nh, res, g):
    _, vjp = jax.vjp(lambda *a: lga_xla(*a, ws=ws, nh=nh), *res)
    return vjp(g)


_lga_fused.defvjp(_lga_fwd, _lga_bwd)


class LocallyGroupedAttn(nn.Module):
    """Windowed MHA over non-overlapping ws x ws groups (timm
    LocallyGroupedAttn). Zero-pads the grid to window multiples.

    ``impl='pallas'`` runs the hybrid head-major kernel (XLA qkv/proj
    around the fused window-partition + per-head attention,
    ops/pallas/_lga_kernel.py); 'xla' is the composite. Parameters are
    identical either way."""

    dim: int
    num_heads: int
    ws: int = 7
    impl: str = "xla"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, size):
        b, n, c = x.shape
        ht, w = size
        ws = self.ws
        nh = self.num_heads
        qkv = CollectableDense(3 * c, dtype=self.dtype, name="qkv")
        proj = CollectableDense(c, dtype=self.dtype, name="proj")
        wqkv, bqkv = qkv(None, in_dim=c, collect=True)
        wproj, bproj = proj(None, in_dim=c, collect=True)

        xg = x.reshape(b, ht, w, c)
        pad_b = (ws - ht % ws) % ws
        pad_r = (ws - w % ws) % ws
        xg = jnp.pad(xg, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))

        use_pallas = (self.impl == "pallas"
                      and jax.default_backend() == "tpu")
        if use_pallas:
            out = _lga_fused(xg, wqkv, bqkv, wproj, bproj, ws, nh)
        else:
            out = lga_xla(xg, wqkv, bqkv, wproj, bproj, ws=ws, nh=nh)
        return out[:, :ht, :w].reshape(b, n, c)


class GlobalSubSampleAttn(nn.Module):
    """Global attention with sr_ratio-subsampled keys/values (timm
    GlobalSubSampleAttn). ``gsa_flash`` forces the flash-attention path
    (auto-engaged anyway above 16k tokens) instead of the materialized
    (n, m) logits einsum."""

    dim: int
    num_heads: int
    sr_ratio: int
    gsa_flash: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, size):
        b, n, c = x.shape
        ht, w = size
        nh = self.num_heads
        hd = c // nh

        q = nn.Dense(c, dtype=self.dtype, name="q")(x)
        q = q.reshape(b, n, nh, hd).transpose(0, 2, 1, 3) * (hd ** -0.5)

        if self.sr_ratio > 1:
            feat = x.reshape(b, ht, w, c)
            feat = conv2d(c, self.sr_ratio, stride=self.sr_ratio,
                          padding="VALID", dtype=self.dtype, name="sr")(feat)
            kvin = feat.reshape(b, -1, c)
            kvin = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                                name="norm")(kvin)
        else:
            kvin = x
        kv = nn.Dense(2 * c, dtype=self.dtype, name="kv")(kvin)
        m = kv.shape[1]
        kv = kv.reshape(b, m, 2, nh, hd)
        k = kv[:, :, 0].transpose(0, 2, 1, 3)  # (B, nh, M, hd)
        v = kv[:, :, 1].transpose(0, 2, 1, 3)

        # Above ~32k tokens the materialized (n, m) logits stop being free:
        # the fp32 score matrix is n*m*heads*4 bytes (3.2 GB at 440x1024
        # stage 1), and even a chunked lax.map round-trips ~6 GB of fp32
        # logits through HBM (~12 ms/clip measured on v5e). The flash path
        # (Pallas kernel on TPU, streaming-softmax scan elsewhere) keeps the
        # logits in VMEM: exact same math, O(n) memory.
        if self.gsa_flash or n > 16384:
            from streamflow_tpu.ops.pallas.attention import flash_attention

            out = flash_attention(q, k, v, scaled=True)
        else:
            a = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                           preferred_element_type=jnp.float32)
            a = jax.nn.softmax(a, axis=-1).astype(v.dtype)
            out = jnp.einsum("bhqk,bhkd->bhqd", a, v)

        out = out.transpose(0, 2, 1, 3).reshape(b, n, c)
        return nn.Dense(c, dtype=self.dtype, name="proj")(out)


class TwinsBlock(nn.Module):
    """Pre-norm block: x + attn(LN(x)); x + mlp(LN(x)). ``ws=None`` selects
    GSA, otherwise LGA with that window size.

    ``temporal`` hooks reproduce the ablation encoders:
    - "1dconv": dirac-init temporal Conv1d on the MLP branch output
      (reference core/encoders/twins_1dconv.py:15-46)
    - "attn": zero-init temporal self-attention before spatial attention
      (reference core/encoders/twins_temporal_attention.py:15-64)
    Both operate on per-pixel T-token sequences; ``t`` is the frame count
    (tokens laid out as (B*T, h*w, C))."""

    dim: int
    num_heads: int
    mlp_ratio: int = 4
    sr_ratio: int = 1
    ws: Optional[int] = None
    gsa_flash: bool = False
    lga_impl: str = "xla"
    # Run the MLP pair as one Pallas ffn_pair kernel (the 4x hidden never
    # round-trips HBM). Independent of lga_impl='pallas' (which also implies
    # it) so the fused MLP is usable while the fused LGA kernel is gated off.
    ffn_fused: bool = False
    ffn_gelu: str = "erf"
    temporal: str = "none"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, size, t: int = 1):
        bt, n, c = x.shape
        ht, w = size

        def to_time(tok):  # (B*T, N, C) -> (B, N, T, C)
            return tok.reshape(bt // t, t, n, c).transpose(0, 2, 1, 3)

        def from_time(tok):
            return tok.transpose(0, 2, 1, 3).reshape(bt, n, c)

        if self.temporal == "attn":
            from streamflow_tpu.layers.temporal import TinyAttention

            tok = to_time(nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                                       name="norm0")(x))
            tattn = TinyAttention(self.dim, self.num_heads, dtype=self.dtype,
                                  name="temporal_attn")(tok)
            # zero-init projection gates the branch (reference temporal_fc)
            gate = nn.Dense(self.dim, kernel_init=nn.initializers.zeros,
                            bias_init=nn.initializers.zeros,
                            dtype=self.dtype, name="temporal_fc")(tattn)
            x = x + from_time(gate)

        if self.ws is None:
            attn = GlobalSubSampleAttn(
                self.dim, self.num_heads, self.sr_ratio, gsa_flash=self.gsa_flash,
                dtype=self.dtype, name="attn")
        else:
            attn = LocallyGroupedAttn(
                self.dim, self.num_heads, self.ws, impl=self.lga_impl,
                dtype=self.dtype, name="attn")
        norm1 = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")
        x = x + attn(norm1(x), size)

        fused_mlp = ((self.lga_impl == "pallas" or self.ffn_fused)
                     and jax.default_backend() == "tpu")
        norm2 = CollectableLN(epsilon=1e-5, dtype=self.dtype, name="norm2")
        mlp = Mlp(self.dim * self.mlp_ratio, self.dim, fused=fused_mlp,
                  dtype=self.dtype, ffn_gelu=self.ffn_gelu, name="mlp")
        if fused_mlp and self.temporal != "1dconv":
            # norm2 + MLP + residual ride ONE Pallas kernel (the normalized
            # activation and the residual re-read never touch HBM; the two
            # standalone fusions were ~2.4 ms/clip in the r4 trace).
            return mlp(x, ln=norm2(None, features=c, collect=True),
                       add_res=True)
        mlp_out = mlp(norm2(x))
        if self.temporal == "1dconv":
            # dirac-init temporal conv (identity at init) over the T axis
            def dirac(key, shape, dtype=jnp.float32):
                k_, _, o = shape
                w_ = jnp.zeros(shape, dtype)
                return w_.at[k_ // 2, jnp.arange(o) % shape[1], jnp.arange(o)].set(1.0)

            tok = to_time(mlp_out).reshape(-1, t, c)
            tok = nn.Conv(self.dim, (3,), padding=1, kernel_init=dirac,
                          dtype=self.dtype, name="temporal_conv")(tok)
            mlp_out = from_time(tok.reshape(bt // t, n, t, c))
        x = x + mlp_out
        return x


# twins_svt_large stage hyperparameters (stages 1-2 of 4).
SVT_LARGE = dict(
    embed_dims=(128, 256),
    depths=(2, 2),
    num_heads=(4, 8),
    mlp_ratios=(4, 4),
    sr_ratios=(8, 4),
    patch_sizes=(4, 2),
    ws=7,
)


class _TwinsStages(nn.Module):
    """Shared stage runner. ``temporal=True`` keeps all T frames in one token
    grid (Twins_CSC); ``temporal=False`` folds T into the batch (plain Twins,
    reference core/encoders/twins.py:15-52), optionally with per-block
    temporal hooks (``block_temporal``)."""

    temporal: bool = True
    gsa_flash: bool = False
    lga_impl: str = "xla"
    ffn_fused: bool = False
    ffn_gelu: str = "erf"
    block_temporal: str = "none"
    dtype: Optional[jnp.dtype] = None
    cfg: dict = None

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg or SVT_LARGE
        b, t = x.shape[0], x.shape[1]
        if not self.temporal:
            x = x.reshape(b * t, 1, *x.shape[2:])
        # per-block temporal hooks need the true frame count even though T is
        # folded into the batch axis
        t_blocks = t if (not self.temporal and self.block_temporal != "none") else 1
        for i in range(2):
            dim = cfg["embed_dims"][i]
            x, size = TemporalPatchEmbed(
                cfg["patch_sizes"][i], dim, dtype=self.dtype,
                name=f"patch_embed{i}")(x)
            for j in range(cfg["depths"][i]):
                ws = cfg["ws"] if j % 2 == 0 else None
                x = TwinsBlock(
                    dim, cfg["num_heads"][i], cfg["mlp_ratios"][i],
                    cfg["sr_ratios"][i], ws=ws, gsa_flash=self.gsa_flash,
                    lga_impl=self.lga_impl, ffn_fused=self.ffn_fused,
                    ffn_gelu=self.ffn_gelu,
                    temporal=self.block_temporal,
                    dtype=self.dtype, name=f"stage{i}_block{j}",
                )(x, size, t=t_blocks)
                if j == 0:
                    x = PosConv(dim, dtype=self.dtype, name=f"pos_block{i}")(x, size)
            ht, w = size
            tt = t if self.temporal else 1
            h = ht // tt
            # back to (B, T, h, w, C) for the next stage's patch embed
            x = x.reshape(x.shape[0], tt, h, w, dim)
        if not self.temporal:
            x = x.reshape(b, t, *x.shape[2:])
        return x


class TwinsCSC(nn.Module):
    """Twins_CSC: temporal-token-grid Twins-SVT-Large stages 1-2
    (reference core/encoders/twins_csc.py:37-85).

    (B, T, H, W, 3) -> (B, T, H/8, W/8, 256).
    """

    gsa_flash: bool = False
    lga_impl: str = "xla"
    ffn_fused: bool = False
    ffn_gelu: str = "erf"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        return _TwinsStages(temporal=True, gsa_flash=self.gsa_flash,
                            lga_impl=self.lga_impl, ffn_fused=self.ffn_fused,
                            ffn_gelu=self.ffn_gelu,
                            dtype=self.dtype, name="stages")(x)


class Twins(nn.Module):
    """Plain per-frame Twins-SVT-Large stages 1-2 (reference
    core/encoders/twins.py:15-52): no temporal mixing."""

    gsa_flash: bool = False
    lga_impl: str = "xla"
    ffn_fused: bool = False
    ffn_gelu: str = "erf"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        return _TwinsStages(temporal=False, gsa_flash=self.gsa_flash,
                            lga_impl=self.lga_impl, ffn_fused=self.ffn_fused,
                            ffn_gelu=self.ffn_gelu,
                            dtype=self.dtype, name="stages")(x)


class Twins1DConv(nn.Module):
    """Per-frame SVT with a dirac-init depth-3 temporal Conv1d on each MLP
    branch (reference core/encoders/twins_1dconv.py:50-120)."""

    gsa_flash: bool = False
    lga_impl: str = "xla"
    ffn_fused: bool = False
    ffn_gelu: str = "erf"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        return _TwinsStages(temporal=False, gsa_flash=self.gsa_flash,
                            lga_impl=self.lga_impl, ffn_fused=self.ffn_fused,
                            ffn_gelu=self.ffn_gelu,
                            block_temporal="1dconv", dtype=self.dtype,
                            name="stages")(x)


class TwinsTemporalAttention(nn.Module):
    """Per-frame SVT with zero-init temporal self-attention before each
    spatial attention (reference core/encoders/twins_temporal_attention.py)."""

    gsa_flash: bool = False
    lga_impl: str = "xla"
    ffn_fused: bool = False
    ffn_gelu: str = "erf"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        return _TwinsStages(temporal=False, gsa_flash=self.gsa_flash,
                            lga_impl=self.lga_impl, ffn_fused=self.ffn_fused,
                            ffn_gelu=self.ffn_gelu,
                            block_temporal="attn", dtype=self.dtype,
                            name="stages")(x)


class Twins3DConv(nn.Module):
    """Plain per-frame SVT + a single dirac-init 3x3x3 Conv over (T, H, W) at
    the end (reference core/encoders/twins_3dconv.py:16-70)."""

    gsa_flash: bool = False
    lga_impl: str = "xla"
    ffn_fused: bool = False
    ffn_gelu: str = "erf"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        y = _TwinsStages(temporal=False, gsa_flash=self.gsa_flash,
                         lga_impl=self.lga_impl, ffn_fused=self.ffn_fused,
                         ffn_gelu=self.ffn_gelu,
                         dtype=self.dtype, name="stages")(x)

        def dirac(key, shape, dtype=jnp.float32):
            kt, kh, kw, i, o = shape
            w_ = jnp.zeros(shape, dtype)
            return w_.at[kt // 2, kh // 2, kw // 2,
                         jnp.arange(o) % i, jnp.arange(o)].set(1.0)

        res = nn.Conv(y.shape[-1], (3, 3, 3), padding=1, kernel_init=dirac,
                      dtype=self.dtype, name="temporal_conv")(y)
        return y + res
