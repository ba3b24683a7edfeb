"""RAFT's residual CNN encoder, stride 8 (reference core/extractor.py:11-194).

conv7x7/s2 -> norm -> relu -> 3 residual stages (64, 96/s2, 128/s2) -> 1x1 to
output_dim. Norm selectable per use: 'instance' for fnet, 'batch' for cnet,
plus 'group'/'none' (reference ResidualBlock norm dispatch,
core/extractor.py:20-43).

BatchNorm uses flax's running statistics; pass ``train=True`` with a mutable
``batch_stats`` collection during training (the reference's freeze_bn trick,
train_mf.py:173-174, corresponds to ``train=False``).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from streamflow_tpu.layers.common import conv2d, InstanceNorm


class _Norm(nn.Module):
    kind: str
    features: int
    train: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        if self.kind == "batch":
            return nn.BatchNorm(
                use_running_average=not self.train, momentum=0.9, epsilon=1e-5,
                dtype=self.dtype,
            )(x)
        if self.kind == "instance":
            return InstanceNorm()(x)
        if self.kind == "group":
            return nn.GroupNorm(num_groups=max(1, self.features // 8),
                                dtype=self.dtype)(x)
        return x  # 'none'


class ResidualBlock(nn.Module):
    planes: int
    norm_fn: str = "group"
    stride: int = 1
    train: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, residual=None):
        """``residual`` overrides the skip-connection source (reference
        ResidualBlock3D routes the skip from the PRE-temporal-attention
        input, core/extractor.py:269-273)."""
        r = x if residual is None else residual
        y = conv2d(self.planes, 3, stride=self.stride, padding=1,
                   dtype=self.dtype, name="conv1")(x)
        y = nn.relu(_Norm(self.norm_fn, self.planes, self.train,
                          dtype=self.dtype, name="norm1")(y))
        y = conv2d(self.planes, 3, padding=1, dtype=self.dtype, name="conv2")(y)
        y = nn.relu(_Norm(self.norm_fn, self.planes, self.train,
                          dtype=self.dtype, name="norm2")(y))
        if self.stride != 1 or r.shape[-1] != self.planes:
            r = conv2d(self.planes, 1, stride=self.stride, padding="VALID",
                       dtype=self.dtype, name="downsample")(r)
            r = _Norm(self.norm_fn, self.planes, self.train,
                      dtype=self.dtype, name="norm3")(r)
        return nn.relu(r + y)


class BasicEncoder(nn.Module):
    output_dim: int = 128
    norm_fn: str = "batch"
    train: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        x = conv2d(64, 7, stride=2, padding=3, dtype=self.dtype, name="conv1")(x)
        x = nn.relu(_Norm(self.norm_fn, 64, self.train, dtype=self.dtype,
                          name="norm1")(x))
        dims = (64, 96, 128)
        strides = (1, 2, 2)
        for i, (d, s) in enumerate(zip(dims, strides)):
            x = ResidualBlock(d, self.norm_fn, s, self.train, dtype=self.dtype,
                              name=f"layer{i + 1}_0")(x)
            x = ResidualBlock(d, self.norm_fn, 1, self.train, dtype=self.dtype,
                              name=f"layer{i + 1}_1")(x)
        return conv2d(self.output_dim, 1, padding="VALID", dtype=self.dtype,
                      name="conv2")(x)


class TemporalResidualBlock(nn.Module):
    """ResidualBlock3D (reference core/extractor.py:198-273): a zero-gated
    per-pixel temporal self-attention (LN -> 4-head attention -> zero-init
    temporal_fc, exact identity at init) followed by the spatial residual
    block. Input (B, T, H, W, C)."""

    planes: int
    norm_fn: str = "batch"
    stride: int = 1
    train: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        from streamflow_tpu.layers.temporal import TinyAttention

        b, t, h, w, c = x.shape
        tok = x.transpose(0, 2, 3, 1, 4)               # (B, H, W, T, C)
        tok = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm0")(tok)
        tok = TinyAttention(c, num_heads=4, zero_init=False,
                            dtype=self.dtype, name="temporal_attn")(tok)
        gate = nn.Dense(c, kernel_init=nn.initializers.zeros,
                        bias_init=nn.initializers.zeros, dtype=self.dtype,
                        name="temporal_fc")(tok)
        y = x + gate.transpose(0, 3, 1, 2, 4)
        # the skip connection bypasses the temporal hook (reference
        # core/extractor.py:256-273: downsample/identity runs on the
        # pre-temporal x, only the conv branch sees the attended tokens)
        y = ResidualBlock(self.planes, self.norm_fn, self.stride, self.train,
                          dtype=self.dtype, name="spatial")(
            y.reshape(b * t, h, w, c), residual=x.reshape(b * t, h, w, c))
        return y.reshape(b, t, *y.shape[1:])


class Res18_3D(nn.Module):
    """Res18_3D (reference core/extractor.py:276-356): the RAFT CNN with a
    temporal-attention hook before every residual block.
    (B, T, H, W, 3) -> (B, T, H/8, W/8, 256)."""

    output_dim: int = 256
    norm_fn: str = "batch"
    train: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        b, t, hh, ww, c = x.shape
        y = conv2d(64, 7, stride=2, padding=3, dtype=self.dtype,
                   name="conv1")(x.reshape(b * t, hh, ww, c))
        y = nn.relu(_Norm(self.norm_fn, 64, self.train, dtype=self.dtype,
                          name="norm1")(y))
        y = y.reshape(b, t, *y.shape[1:])
        dims = (64, 96, 128)
        strides = (1, 2, 2)
        for i, (d, s) in enumerate(zip(dims, strides)):
            y = TemporalResidualBlock(d, self.norm_fn, s, self.train,
                                      dtype=self.dtype,
                                      name=f"layer{i + 1}_0")(y)
            y = TemporalResidualBlock(d, self.norm_fn, 1, self.train,
                                      dtype=self.dtype,
                                      name=f"layer{i + 1}_1")(y)
        bt = b * t
        out = conv2d(self.output_dim, 1, padding="VALID", dtype=self.dtype,
                     name="conv2")(y.reshape(bt, *y.shape[2:]))
        return out.reshape(b, t, *out.shape[1:])


class AttnBasicEncoder(nn.Module):
    """AttnBasicEncoder (reference core/extractor.py:434-511): BasicEncoder
    that additionally returns the (H2*W2 x H2*W2) self-similarity softmax of
    the first image's layer-2 features (used by the cost-encoder RAFT
    ablations). Call with (2B, H, W, 3) stacked image pairs; returns
    (feat1, feat2, attn)."""

    output_dim: int = 128
    norm_fn: str = "batch"
    train: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        b2 = x.shape[0]
        b = b2 // 2
        y = conv2d(64, 7, stride=2, padding=3, dtype=self.dtype,
                   name="conv1")(x)
        y = nn.relu(_Norm(self.norm_fn, 64, self.train, dtype=self.dtype,
                          name="norm1")(y))
        dims = (64, 96, 128)
        strides = (1, 2, 2)
        for i, (d, s) in enumerate(zip(dims, strides)):
            y = ResidualBlock(d, self.norm_fn, s, self.train,
                              dtype=self.dtype, name=f"layer{i + 1}_0")(y)
            y = ResidualBlock(d, self.norm_fn, 1, self.train,
                              dtype=self.dtype, name=f"layer{i + 1}_1")(y)
            if i == 1:  # after layer2 (reference :489-491)
                f1 = y[:b]
                n = f1.shape[1] * f1.shape[2]
                flat = f1.reshape(b, n, -1).astype(jnp.float32)
                sim = jnp.einsum("bnc,bmc->bnm", flat, flat)
                attn = jax.nn.softmax(sim, axis=-1)
        out = conv2d(self.output_dim, 1, padding="VALID", dtype=self.dtype,
                     name="conv2")(y)
        return out[:b], out[b:], attn
