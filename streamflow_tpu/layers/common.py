"""Shared building blocks. All modules are flax.linen, channel-last (NHWC).

GELU is the exact (erf) variant everywhere, matching torch's default
``F.gelu`` used throughout the reference.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import flax.linen as nn


def gelu(x: jax.Array) -> jax.Array:
    return jax.nn.gelu(x, approximate=False)


class Mlp(nn.Module):
    """Transformer MLP: Linear -> GELU -> Linear (timm Mlp semantics)."""

    hidden: int
    out: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden, dtype=self.dtype, name="fc1")(x)
        x = gelu(x)
        x = nn.Dense(self.out, dtype=self.dtype, name="fc2")(x)
        return x


class LayerNorm(nn.Module):
    """LayerNorm over the trailing channel dim (torch nn.LayerNorm eps=1e-5)."""

    epsilon: float = 1e-5
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        return nn.LayerNorm(epsilon=self.epsilon, dtype=self.dtype)(x)


def conv2d(
    features: int,
    kernel: int | tuple,
    stride: int | tuple = 1,
    padding="SAME",
    groups: int = 1,
    use_bias: bool = True,
    dtype=None,
    name: Optional[str] = None,
):
    """nn.Conv with torch-Conv2d-like defaults; NHWC."""
    if isinstance(kernel, int):
        kernel = (kernel, kernel)
    if isinstance(stride, int):
        stride = (stride, stride)
    if isinstance(padding, int):
        padding = [(padding, padding), (padding, padding)]
    return nn.Conv(
        features=features,
        kernel_size=kernel,
        strides=stride,
        padding=padding,
        feature_group_count=groups,
        use_bias=use_bias,
        dtype=dtype,
        name=name,
    )


class InstanceNorm(nn.Module):
    """InstanceNorm2d (torch affine=False default): normalize each (H, W)
    plane per sample per channel. Used by the fnet of the CNN encoders."""

    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x):
        mean = jnp.mean(x, axis=(1, 2), keepdims=True)
        var = jnp.var(x, axis=(1, 2), keepdims=True)
        return (x - mean) * jax.lax.rsqrt(var + self.epsilon)


def zeros_init():
    return nn.initializers.zeros


def drop_path(x: jax.Array, rate: float, deterministic: bool, rng) -> jax.Array:
    """Stochastic depth (timm DropPath). The canonical StreamFlow config uses
    rate 0, so this is an identity in practice."""
    if deterministic or rate == 0.0:
        return x
    keep = 1.0 - rate
    shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    mask = jax.random.bernoulli(rng, keep, shape).astype(x.dtype)
    return x / keep * mask
