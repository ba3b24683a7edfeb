"""Two-frame baselines: RAFT (reference core/models/raft.py:71-190), RAFT+GMA
(core/models/raftgma.py), and SKFlow (SK_Decoder, core/models/sk_decoder.py,
sans the debug-image writes the reference hard-codes into forward).

Shared machinery with StreamFlow: corr pyramid, convex upsampling, scan loop.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from streamflow_tpu.config import RAFTConfig
from streamflow_tpu.ops.coords import coords_grid
from streamflow_tpu.ops.corr import CorrPyramid
from streamflow_tpu.ops.upsample import convex_upsample
from streamflow_tpu.layers.basic_encoder import BasicEncoder
from streamflow_tpu.layers.gma import GMAAttention
from streamflow_tpu.layers.update import (
    BasicUpdateBlock,
    GMAUpdateBlock,
    SKUpdateBlockAllDecoder,
)


class _RAFTStep(nn.Module):
    cfg: RAFTConfig
    emit_flow: bool
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, carry, x):
        cfg = self.cfg
        net, coords1, _ = carry
        inp, attn, pyramid, coords0 = x

        coords1 = jax.lax.stop_gradient(coords1)
        corr = pyramid.lookup(coords1)
        flow = coords1 - coords0

        if cfg.update_block == "raft":
            blk = BasicUpdateBlock(cfg.hidden_dim, dtype=self.dtype, name="update_block")
        elif cfg.update_block == "gma":
            blk = GMAUpdateBlock(cfg.hidden_dim, cfg.num_heads,
                                 attn_mode=cfg.attn_impl, dtype=self.dtype,
                                 name="update_block")
        elif cfg.update_block == "sk":
            blk = SKUpdateBlockAllDecoder(
                cfg.hidden_dim, tuple(cfg.k_conv), tuple(cfg.pc_updater_conv),
                cfg.num_heads, use_gma=cfg.use_gma, attn_mode=cfg.attn_impl,
                dtype=self.dtype, name="update_block")
        else:
            raise ValueError(cfg.update_block)

        net, mask, delta = blk(net, inp, corr, flow, attn)
        coords1 = coords1 + delta.astype(jnp.float32)

        if self.emit_flow:
            y = convex_upsample(coords1 - coords0, mask, ratio=8)
        else:
            y = 0.0
        return (net, coords1, mask), y


class RAFT(nn.Module):
    """Two-frame model; image1/image2 are (B, H, W, 3) in [0, 255]."""

    cfg: RAFTConfig = RAFTConfig()

    @nn.compact
    def __call__(self, image1, image2, iters: Optional[int] = None,
                 flow_init=None, test_mode: bool = False, train: bool = False):
        cfg = self.cfg
        iters = cfg.iters if iters is None else iters
        dtype = jnp.bfloat16 if cfg.mixed_precision else None
        b = image1.shape[0]

        def norm(im):
            x = 2.0 * (im.astype(jnp.float32) / 255.0) - 1.0
            return x.astype(dtype) if dtype is not None else x

        both = jnp.concatenate([norm(image1), norm(image2)], axis=0)
        fmaps = BasicEncoder(256, "instance", dtype=dtype, name="fnet")(both)
        fmaps = fmaps.astype(jnp.float32)
        fmap1, fmap2 = fmaps[:b], fmaps[b:]
        cnet = BasicEncoder(cfg.hidden_dim + cfg.context_dim, "batch",
                            train=train, dtype=dtype, name="cnet")(norm(image1))

        net, inp = jnp.split(cnet, [cfg.hidden_dim], axis=-1)
        net = jnp.tanh(net)
        inp = nn.relu(inp)

        pyramid = CorrPyramid.build(fmap1, fmap2, cfg.corr_levels, cfg.corr_radius)

        use_attn = cfg.update_block == "gma" or (
            cfg.update_block == "sk" and cfg.use_gma
        )
        if use_attn:
            attn = GMAAttention(heads=cfg.num_heads, dim_head=cfg.context_dim,
                                mode=cfg.attn_impl, dtype=dtype, name="att")(inp)
        else:
            attn = None

        h, w = fmap1.shape[1], fmap1.shape[2]
        coords0 = coords_grid(b, h, w)
        coords1 = coords0 + (flow_init if flow_init is not None else 0.0)

        mask0 = jnp.zeros((b, h, w, 9 * 64), dtype=dtype or jnp.float32)
        scan = nn.scan(
            _RAFTStep,
            variable_broadcast="params",
            split_rngs={"params": False},
            in_axes=nn.broadcast,
            out_axes=0,
            length=iters,
        )(cfg=cfg, emit_flow=not test_mode, dtype=dtype, name="step")
        (net, coords1, mask), ys = scan((net, coords1, mask0),
                                        (inp, attn, pyramid, coords0))

        if test_mode:
            up = convex_upsample(coords1 - coords0, mask, ratio=8)
            return coords1 - coords0, up
        return ys
