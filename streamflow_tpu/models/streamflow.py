"""StreamFlow: multi-frame iterative-refinement optical flow (the reference's
SKFlow_MF8, core/models/streamflow.py:30-149), designed TPU-first.

Differences from the torch graph (behavior-preserving):
- The T-1 frame pairs are folded into the batch axis once; no Python lists of
  per-pair tensors (reference keeps lists, core/models/streamflow.py:110-140).
- The refinement loop is a single ``nn.scan`` (jax.lax.scan) with the update
  block's parameters broadcast across iterations — one compiled iteration
  body instead of an unrolled 12-24x graph.
- ``stop_gradient`` on the flow carry replaces ``coords1.detach()``
  (reference :131).
- In test mode the convex upsampling runs once on the final iterate instead of
  every iteration (outputs identical; the reference upsamples every iteration
  and discards all but the last, :139-147).
- bf16 mixed precision inside encoders/update block (the reference's fp16
  autocast, :106-136); correlation volume and coords arithmetic stay fp32
  (reference casts corr .float(), core/corr.py:44).

I/O convention: images are (B, T, H, W, 3) in [0, 255]; flows are
(B, T-1, H, W, 2) with (x, y) channels.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from streamflow_tpu.config import StreamFlowConfig
from streamflow_tpu.ops.coords import coords_grid
from streamflow_tpu.ops.corr import CorrPyramid
from streamflow_tpu.ops.upsample import convex_upsample
from streamflow_tpu.layers.gma import GMAAttention
from streamflow_tpu.layers.twins import (
    Twins,
    Twins1DConv,
    Twins3DConv,
    TwinsCSC,
    TwinsTemporalAttention,
)
from streamflow_tpu.layers.basic_encoder import BasicEncoder
from streamflow_tpu.layers.update import SKUpdateBlockTAMv3

_TWINS_VARIANTS = {
    "twins_csc": TwinsCSC,
    "twins": Twins,
    "twins_1dconv": Twins1DConv,
    "twins_temporal_attention": TwinsTemporalAttention,
    "twins_3dconv": Twins3DConv,
}


def _gelu_of(cfg: StreamFlowConfig) -> str:
    """cfg.ffn_gelu with a leftover 'auto' materialized conservatively
    (mirrors the dw_impl != 'auto' guard below for unresolved configs)."""
    return cfg.ffn_gelu if cfg.ffn_gelu != "auto" else "erf"


def _make_encoder(cfg: StreamFlowConfig, dtype, norm_fn: str, name: str,
                  train: bool = False):
    if cfg.encoder in _TWINS_VARIANTS:
        return _TWINS_VARIANTS[cfg.encoder](gsa_flash=cfg.gsa_flash,
                                            lga_impl=cfg.lga_impl,
                                            ffn_fused=cfg.twins_ffn_fused,
                                            ffn_gelu=_gelu_of(cfg),
                                            dtype=dtype, name=name)
    if cfg.encoder == "umt":
        from streamflow_tpu.layers.umt import UMT

        return UMT(dtype=dtype, name=name)
    if cfg.encoder in ("basic", "resnet18", "mf_basic"):
        # reference ResNet18/MFBasicEncoder (core/encoders/resnet18.py:119-187,
        # core/extractor.py:359-429) are the RAFT CNN lifted over T with
        # output_dim=256; ``train`` reaches the BatchNorm layers (batch-norm
        # cnet trains its running stats, reference core/models/streamflow.py:46)
        return _PerFrameBasicEncoder(output_dim=256, norm_fn=norm_fn,
                                     train=train, dtype=dtype, name=name)
    if cfg.encoder == "res18_3d":
        from streamflow_tpu.layers.basic_encoder import Res18_3D

        return Res18_3D(output_dim=256, norm_fn=norm_fn, train=train,
                        dtype=dtype, name=name)
    raise ValueError(f"unknown encoder '{cfg.encoder}'")


class _PerFrameBasicEncoder(nn.Module):
    """BasicEncoder lifted over the T axis (T folds into batch)."""

    output_dim: int = 256
    norm_fn: str = "instance"
    train: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        b, t, h, w, c = x.shape
        y = BasicEncoder(self.output_dim, self.norm_fn, self.train,
                         dtype=self.dtype, name="enc")(x.reshape(b * t, h, w, c))
        return y.reshape(b, t, *y.shape[1:])


class _RefinementStep(nn.Module):
    """One GRU iteration: corr lookup -> update block -> coords update
    (reference hot loop, core/models/streamflow.py:130-140)."""

    cfg: StreamFlowConfig
    emit_flow: bool
    train: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, carry, x, is_last=None):
        cfg = self.cfg
        net, coords1, _ = carry
        inp, attn, pyramid, coords0 = x
        b, f, h, w, _ = net.shape

        coords1 = jax.lax.stop_gradient(coords1)
        corr = pyramid.lookup(coords1.reshape(b * f, h, w, 2),
                              out_dtype=self.dtype)
        corr = corr.reshape(b, f, h, w, -1)
        flow = coords1 - coords0

        net, mask, delta = SKUpdateBlockTAMv3(
            embed_dim=cfg.hidden_dim,
            num_frames=cfg.T - 1,
            k_conv=tuple(cfg.k_conv),
            pc_updater_conv=tuple(cfg.pc_updater_conv),
            num_heads=cfg.num_heads,
            use_gma=cfg.use_gma,
            ratio=cfg.ratio,
            attn_mode=cfg.attn_impl,
            joint_flow_head=cfg.update_block != "sk_tam_v1",
            temporal_zero_init=cfg.update_block != "sk_tam_v3_noinit",
            dw_impl=cfg.dw_impl if cfg.dw_impl != "auto" else "xla",
            ffn_gelu=_gelu_of(cfg),
            # Lane-padding under autodiff only for dot-only dw paths: the
            # XLA TPU miscompile is in the padded depthwise CONV weight
            # grad (see SKUpdateBlockTAMv3.align); the banded family
            # differentiates through dots, so it keeps whole-lane tiles
            # (and its Pallas kernels require them) in training too.
            align=(not self.train
                   or cfg.dw_impl.startswith("banded")),
            dtype=self.dtype,
            name="update_block",
        )(net, inp, corr, flow, attn,
          compute_mask=None if self.emit_flow else is_last)

        coords1 = coords1 + delta.astype(jnp.float32)

        if self.emit_flow:
            lowres = (coords1 - coords0).reshape(b * f, h, w, 2)
            m = mask.reshape(b * f, h, w, -1)
            up = convex_upsample(lowres, m, ratio=cfg.ratio)
            y = up.reshape(b, f, *up.shape[1:])
        else:
            y = 0.0  # scan needs a pytree; scalar keeps it free
        return (net, coords1, mask), y


class StreamFlow(nn.Module):
    """Flagship multi-frame model. Call with images (B, T, H, W, 3) in
    [0, 255]. Returns:

      test_mode=True : flows (B, T-1, H, W, 2) [+ lowres flows if
                       ``flow_init`` was given, for warm starts —
                       reference :142-147]
      test_mode=False: per-iteration flows (iters, B, T-1, H, W, 2)
    """

    cfg: StreamFlowConfig = StreamFlowConfig()

    @nn.compact
    def __call__(self, images, iters: Optional[int] = None, flow_init=None,
                 test_mode: bool = False, train: bool = False):
        cfg = self.cfg.resolve(training=train)
        iters = cfg.iters if iters is None else iters
        dtype = jnp.bfloat16 if cfg.mixed_precision else None
        b, t, hh, ww, _ = images.shape
        f = t - 1
        assert t == cfg.T, f"model is configured for T={cfg.T}, got {t} frames"

        x = 2.0 * (images.astype(jnp.float32) / 255.0) - 1.0
        if dtype is not None:
            x = x.astype(dtype)

        # fmaps stay in the encoder dtype: bf16 x bf16 MXU products with fp32
        # accumulation give bit-identical volumes to upcasting first (bf16
        # products are exact in fp32), at 2x the matmul rate and half the HBM.
        fmaps = _make_encoder(cfg, dtype, "instance", "fnet", train)(x)
        cnets = _make_encoder(cfg, dtype, "batch", "cnet", train)(x[:, :-1])

        h, w = fmaps.shape[2], fmaps.shape[3]

        # All-pairs correlation pyramids, frame pairs folded into batch.
        c = fmaps.shape[-1]
        f1 = fmaps[:, :-1].reshape(b * f, h, w, c)
        f2 = fmaps[:, 1:].reshape(b * f, h, w, c)
        if cfg.corr_impl == "pallas":
            from streamflow_tpu.ops.pallas.corr import PallasCorr

            pyramid = PallasCorr.build(f1, f2, cfg.corr_levels,
                                       cfg.corr_radius,
                                       block_q=cfg.lookup_block_q,
                                       unroll=cfg.lookup_unroll,
                                       f2_major=cfg.lookup_f2_major,
                                       rows=cfg.lookup_rows)
        elif cfg.corr_impl == "chunked":
            from streamflow_tpu.ops.corr import ChunkedCorr

            pyramid = ChunkedCorr.build(f1, f2, cfg.corr_levels,
                                        cfg.corr_radius)
        elif cfg.corr_store == "int8":
            pyramid = CorrPyramid.build(f1, f2, cfg.corr_levels,
                                        cfg.corr_radius, quantize=True)
        else:
            pyramid = CorrPyramid.build(f1, f2, cfg.corr_levels,
                                        cfg.corr_radius, store_dtype=dtype)

        net, inp = jnp.split(cnets, 2, axis=-1)
        net = jnp.tanh(net)
        inp = nn.relu(inp)

        if cfg.use_gma:
            attn = GMAAttention(
                heads=cfg.num_heads, dim_head=cfg.context_dim,
                mode=cfg.attn_impl, dtype=dtype, name="att",
            )(inp.reshape(b * f, h, w, cfg.context_dim))
        else:
            attn = None

        coords0 = coords_grid(b * f, h, w).reshape(b, f, h, w, 2)
        coords1 = coords0
        if flow_init is not None:
            coords1 = coords1 + flow_init

        mask0 = jnp.zeros((b, f, h, w, 9 * cfg.ratio * cfg.ratio),
                          dtype=dtype or jnp.float32)
        carry = (net, coords1, mask0)
        xs = (inp, attn, pyramid, coords0)

        emit = not test_mode
        step_cls = _RefinementStep
        if cfg.remat and train:
            step_cls = nn.remat(_RefinementStep, static_argnums=())
        scan = nn.scan(
            step_cls,
            variable_broadcast="params",
            variable_axes={"intermediates": 0},
            split_rngs={"params": False},
            in_axes=(nn.broadcast, 0),
            out_axes=0,
            length=iters,
            unroll=min(cfg.scan_unroll, iters) if iters else 1,
        )(cfg=cfg, emit_flow=emit, train=train, dtype=dtype, name="step")
        is_last = jnp.arange(iters) == iters - 1
        (net, coords1, mask), ys = scan(carry, xs, is_last)

        if test_mode:
            lowres = (coords1 - coords0).reshape(b * f, h, w, 2)
            up = convex_upsample(
                lowres, mask.reshape(b * f, h, w, -1), ratio=cfg.ratio
            )
            flows = up.reshape(b, f, *up.shape[1:])
            if flow_init is not None:
                return flows, (coords1 - coords0)
            return flows
        return ys
