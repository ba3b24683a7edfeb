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
    def __call__(self, x):
        y = conv2d(self.planes, 3, stride=self.stride, padding=1,
                   dtype=self.dtype, name="conv1")(x)
        y = nn.relu(_Norm(self.norm_fn, self.planes, self.train,
                          dtype=self.dtype, name="norm1")(y))
        y = conv2d(self.planes, 3, padding=1, dtype=self.dtype, name="conv2")(y)
        y = nn.relu(_Norm(self.norm_fn, self.planes, self.train,
                          dtype=self.dtype, name="norm2")(y))
        if self.stride != 1 or x.shape[-1] != self.planes:
            x = conv2d(self.planes, 1, stride=self.stride, padding="VALID",
                       dtype=self.dtype, name="downsample")(x)
            x = _Norm(self.norm_fn, self.planes, self.train,
                      dtype=self.dtype, name="norm3")(x)
        return nn.relu(x + y)


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
