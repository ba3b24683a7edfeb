"""Motion encoders and update blocks.

Canonical StreamFlow decoder: ``SKUpdateBlockTAMv3`` (reference
SKUpdateBlock_TAM_v3, core/update.py:739-782) = SK motion encoder + GMA
aggregate + zero-init temporal transformer + SK-GRU + joint flow head over all
T-1 frames + convex-upsample mask head.

Two-frame baselines for the RAFT/GMA/SKFlow model family are included:
``BasicMotionEncoder``/``BasicUpdateBlock``/``GMAUpdateBlock``/``SepConvGRU``/
``FlowHead`` (reference core/update.py:1793-1866, 2245-2312) and
``SKUpdateBlockAllDecoder`` (reference SKUpdateBlock6_Deep_nopoolres_AllDecoder,
core/update.py:410-448).

Layout: multi-frame tensors are (B, T, H, W, C); the per-frame convs run on
the flattened (B*T, H, W, C) batch — on TPU the T axis rides the batch
dimension for free.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from streamflow_tpu.layers.common import conv2d, gelu
from streamflow_tpu.layers.sk import SKBlock
from streamflow_tpu.layers.gma import GMAAggregate
from streamflow_tpu.layers.temporal import TemporalLayer


class SKMotionEncoder6(nn.Module):
    """SKMotionEncoder6_Deep_nopool_res (core/update.py:313-339).

    corr (324ch) -> SK(256) -> gelu -> SK(192); flow -> 1x1(128) -> SK(64);
    concat -> SK(out_dim-2); concat flow -> out_dim channels.
    """

    out_dim: int = 128
    k_conv: Sequence[int] = (1, 15)
    dtype: Optional[jnp.dtype] = None
    dw_impl: str = "auto"
    align: bool = True
    ffn_gelu: str = "erf"

    @nn.compact
    def __call__(self, flow, corr):
        def sk(dim, name):
            return SKBlock(dim, self.k_conv, dtype=self.dtype,
                           align=self.align, dw_impl=self.dw_impl,
                           ffn_gelu=self.ffn_gelu, name=name)

        cor = gelu(sk(256, "convc1")(corr))
        cor = sk(192, "convc2")(cor)

        flo = conv2d(128, 1, dtype=self.dtype, name="convf1")(flow)
        flo = sk(64, "convf2")(flo)

        out = sk(self.out_dim - 2, "conv")(
            jnp.concatenate([cor, flo], axis=-1)
        )
        return jnp.concatenate([out, flow.astype(out.dtype)], axis=-1)


class MaskHead(nn.Module):
    """Convex-upsample mask head: 3x3 conv -> ReLU -> 1x1 conv to 9*r*r,
    output pre-scaled by 0.25 (reference core/update.py:756-759, 777).

    ``as_dot`` issues the 3x3 conv as im2col+matmul so the scan body carries
    no convolution HLO (required next to Mosaic custom calls; params are
    bit-compatible either way)."""

    embed_dim: int
    ratio: int = 8
    as_dot: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, net):
        if self.as_dot:
            from streamflow_tpu.layers.common import Conv3x3AsDot

            x = Conv3x3AsDot(self.embed_dim * 2, dtype=self.dtype,
                             name="conv1")(net)
        else:
            x = conv2d(self.embed_dim * 2, 3, padding=1, dtype=self.dtype,
                       name="conv1")(net)
        x = nn.relu(x)
        x = conv2d(self.ratio * self.ratio * 9, 1, dtype=self.dtype, name="conv2")(x)
        return 0.25 * x


class SKUpdateBlockTAMv3(nn.Module):
    """The canonical StreamFlow decoder (core/update.py:739-782).

    Two ablation variants share this graph:
      - ``joint_flow_head=False`` is SKUpdateBlock_TAM (v1,
        core/update.py:691-735): per-frame flow head (D -> 2) instead of the
        joint (F*D -> 2F) head.
      - ``temporal_zero_init=False`` is SKUpdateBlock_TAM_v3_noinit
        (core/update.py:787-832): TemporalLayer_noinit, i.e. the temporal
        transformer starts live instead of as an identity.

    Inputs (multi-frame, F = T-1 flow fields):
      net:   (B, F, H, W, D)   hidden state
      inp:   (B, F, H, W, D)   context features
      corr:  (B, F, H, W, 324) correlation lookup
      flow:  (B, F, H, W, 2)
      attn:  GMA attention for the (B*F) frame batch — materialized map or
             (q, k) in flash mode.
    Returns (net, mask(B,F,H,W,9r^2), delta_flow(B,F,H,W,2)).
    """

    embed_dim: int = 128
    num_frames: int = 3
    k_conv: Sequence[int] = (1, 15)
    pc_updater_conv: Sequence[int] = (1, 7)
    num_heads: int = 1
    use_gma: bool = True
    ratio: int = 8
    attn_mode: str = "full"
    joint_flow_head: bool = True
    temporal_zero_init: bool = True
    dtype: Optional[jnp.dtype] = None
    dw_impl: str = "auto"
    # Lane-aligned execution padding inside SK blocks. MUST be False under
    # autodiff on TPU: XLA's post-optimization pass miscompiles the weight
    # gradient of a channel-padded depthwise conv ("output feature dimension
    # 324 not a multiple of batch group count 384") — reproduced on a lone
    # SKBlock grad; inference is unaffected.
    align: bool = True
    ffn_gelu: str = "erf"

    @nn.compact
    def __call__(self, net, inp, corr, flow, attn, compute_mask=None):
        """``compute_mask``: None computes the convex-upsample mask head
        unconditionally (training / reference semantics); a traced bool
        gates it behind lax.cond — in test mode only the final iteration's
        mask is consumed (reference upsamples every iteration and discards
        all but the last, core/models/streamflow.py:139-147)."""
        b, f, h, w, d = net.shape
        assert f == self.num_frames

        def flat(x):
            return x.reshape(b * f, h, w, x.shape[-1])

        def unflat(x):
            return x.reshape(b, f, h, w, x.shape[-1])

        mf = SKMotionEncoder6(
            self.embed_dim, self.k_conv, dtype=self.dtype,
            dw_impl=self.dw_impl, align=self.align,
            ffn_gelu=self.ffn_gelu, name="encoder"
        )(flat(flow), flat(corr))

        if self.use_gma:
            mf_global = GMAAggregate(
                heads=self.num_heads,
                dim_head=self.embed_dim,
                mode=self.attn_mode,
                dtype=self.dtype,
                name="aggregator",
            )(attn, mf)
        else:
            mf_global = mf

        mf_temporal = TemporalLayer(
            self.embed_dim, zero_init=self.temporal_zero_init,
            dtype=self.dtype, name="transformer_block"
        )(unflat(mf))

        inp_cat = jnp.concatenate(
            [flat(inp), mf, mf_global, flat(mf_temporal)], axis=-1
        )
        net_f = SKBlock(
            self.embed_dim, self.pc_updater_conv, dtype=self.dtype,
            align=self.align, dw_impl=self.dw_impl,
            ffn_gelu=self.ffn_gelu, name="gru"
        )(jnp.concatenate([flat(net), inp_cat], axis=-1))

        if self.joint_flow_head:
            # Joint flow head over all F frames:
            # (B, H, W, F*D) -> (B, H, W, 2F).
            net_joint = net_f.reshape(b, f, h, w, d).transpose(0, 2, 3, 1, 4)
            net_joint = net_joint.reshape(b, h, w, f * d)
            delta = SKBlock(
                2 * f, self.k_conv, dtype=self.dtype, align=self.align,
                dw_impl=self.dw_impl, ffn_gelu=self.ffn_gelu,
                name="flow_head"
            )(net_joint)
            delta = delta.reshape(b, h, w, f, 2).transpose(0, 3, 1, 2, 4)
        else:
            # TAM v1: per-frame flow head (core/update.py:716, :726).
            delta = unflat(SKBlock(
                2, self.k_conv, dtype=self.dtype, align=self.align,
                dw_impl=self.dw_impl, ffn_gelu=self.ffn_gelu,
                name="flow_head"
            )(net_f))

        mh = MaskHead(self.embed_dim, self.ratio,
                      as_dot=self.dw_impl in ("pallas", "shift", "banded",
                                              "banded_mxu", "banded_mxu_t",
                                              "banded_chain")
                      or self.dw_impl.startswith("xla_cond"),
                      dtype=self.dtype,
                      name="mask")
        if compute_mask is None or self.is_initializing():
            mask = mh(net_f)
        else:
            mask = jax.lax.cond(
                compute_mask, lambda n: mh(n),
                lambda n: jnp.zeros(
                    n.shape[:-1] + (9 * self.ratio * self.ratio,), n.dtype),
                net_f)
        return unflat(net_f), unflat(mask), delta


class SKUpdateBlockAllDecoder(nn.Module):
    """Two-frame SKFlow decoder (SKUpdateBlock6_Deep_nopoolres_AllDecoder,
    core/update.py:410-448)."""

    embed_dim: int = 128
    k_conv: Sequence[int] = (1, 15)
    pc_updater_conv: Sequence[int] = (1, 7)
    num_heads: int = 1
    use_gma: bool = False
    ratio: int = 8
    attn_mode: str = "full"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, net, inp, corr, flow, attn=None):
        mf = SKMotionEncoder6(
            self.embed_dim, self.k_conv, dtype=self.dtype, name="encoder"
        )(flow, corr)
        if self.use_gma:
            mf_global = GMAAggregate(
                heads=self.num_heads, dim_head=self.embed_dim,
                mode=self.attn_mode, dtype=self.dtype, name="aggregator",
            )(attn, mf)
            inp_cat = jnp.concatenate([inp, mf, mf_global], axis=-1)
            # NOTE: the reference declares the GRU input as embed_dim*4 in both
            # branches (core/update.py:421-424), which only type-checks for the
            # non-GMA branch; with GMA the concat is embed_dim*5. We size the
            # GRU from its actual input.
        else:
            inp_cat = jnp.concatenate([inp, mf], axis=-1)
        net = SKBlock(
            self.embed_dim, self.pc_updater_conv, dtype=self.dtype, name="gru"
        )(jnp.concatenate([net, inp_cat], axis=-1))
        delta = SKBlock(2, self.k_conv, dtype=self.dtype, name="flow_head")(net)
        mask = MaskHead(self.embed_dim, self.ratio, dtype=self.dtype, name="mask")(net)
        return net, mask, delta


class FlowHead(nn.Module):
    """RAFT flow head (core/update.py:1793-1801)."""

    hidden_dim: int = 256
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        x = conv2d(self.hidden_dim, 3, padding=1, dtype=self.dtype, name="conv1")(x)
        x = nn.relu(x)
        return conv2d(2, 3, padding=1, dtype=self.dtype, name="conv2")(x)


class SepConvGRU(nn.Module):
    """Separable 1x5/5x1 ConvGRU (core/update.py:1815-1842)."""

    hidden_dim: int = 128
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, h, x):
        d = self.hidden_dim
        for axis, name in ((1, "h"), (0, "v")):
            k = (1, 5) if axis == 1 else (5, 1)
            p = [(0, 0), (2, 2)] if axis == 1 else [(2, 2), (0, 0)]
            hx = jnp.concatenate([h, x], axis=-1)
            z = nn.sigmoid(conv2d(d, k, padding=p, dtype=self.dtype, name=f"convz_{name}")(hx))
            r = nn.sigmoid(conv2d(d, k, padding=p, dtype=self.dtype, name=f"convr_{name}")(hx))
            q = nn.tanh(
                conv2d(d, k, padding=p, dtype=self.dtype, name=f"convq_{name}")(
                    jnp.concatenate([r * h, x], axis=-1)
                )
            )
            h = (1 - z) * h + z * q
        return h


class BasicMotionEncoder(nn.Module):
    """RAFT motion encoder (core/update.py:1845-1866)."""

    corr_planes: int = 324
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, flow, corr):
        cor = nn.relu(conv2d(256, 1, dtype=self.dtype, name="convc1")(corr))
        cor = nn.relu(conv2d(192, 3, padding=1, dtype=self.dtype, name="convc2")(cor))
        flo = nn.relu(conv2d(128, 7, padding=3, dtype=self.dtype, name="convf1")(flow))
        flo = nn.relu(conv2d(64, 3, padding=1, dtype=self.dtype, name="convf2")(flo))
        out = nn.relu(
            conv2d(128 - 2, 3, padding=1, dtype=self.dtype, name="conv")(
                jnp.concatenate([cor, flo], axis=-1)
            )
        )
        return jnp.concatenate([out, flow.astype(out.dtype)], axis=-1)


class BasicUpdateBlock(nn.Module):
    """RAFT update block (core/update.py:2245-2268)."""

    hidden_dim: int = 128
    ratio: int = 8
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, net, inp, corr, flow, attn=None):
        mf = BasicMotionEncoder(dtype=self.dtype, name="encoder")(flow, corr)
        inp_cat = jnp.concatenate([inp, mf], axis=-1)
        net = SepConvGRU(self.hidden_dim, dtype=self.dtype, name="gru")(net, inp_cat)
        delta = FlowHead(256, dtype=self.dtype, name="flow_head")(net)
        mask = MaskHead(self.hidden_dim, self.ratio, dtype=self.dtype, name="mask")(net)
        return net, mask, delta


class GMAUpdateBlock(nn.Module):
    """GMA update block (core/update.py:2134-2168 GMAUpdateBlock)."""

    hidden_dim: int = 128
    num_heads: int = 1
    ratio: int = 8
    attn_mode: str = "full"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, net, inp, corr, flow, attn):
        mf = BasicMotionEncoder(dtype=self.dtype, name="encoder")(flow, corr)
        mf_global = GMAAggregate(
            heads=self.num_heads, dim_head=self.hidden_dim,
            mode=self.attn_mode, dtype=self.dtype, name="aggregator",
        )(attn, mf)
        inp_cat = jnp.concatenate([inp, mf, mf_global], axis=-1)
        net = SepConvGRU(self.hidden_dim, dtype=self.dtype, name="gru")(net, inp_cat)
        delta = FlowHead(256, dtype=self.dtype, name="flow_head")(net)
        mask = MaskHead(self.hidden_dim, self.ratio, dtype=self.dtype, name="mask")(net)
        return net, mask, delta
