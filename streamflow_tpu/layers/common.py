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


class CollectableDense(nn.Module):
    """nn.Dense-compatible params (kernel (in, out), bias (out,)) returned as
    (dtype-cast) arrays instead of applied — for handing them to a fused
    Pallas kernel. Callers apply the weights themselves."""

    features: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, in_dim: Optional[int] = None, collect: bool = True):
        assert collect and x is None, "CollectableDense only collects"
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (in_dim, self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,),
                          jnp.float32)
        dt = self.dtype or jnp.float32
        return kernel.astype(dt), bias.astype(dt)


class CollectableLN(nn.Module):
    """nn.LayerNorm-compatible params (scale/bias over the trailing dim),
    applicable directly OR collectable for a fused Pallas kernel. The
    applied math matches torch nn.LayerNorm: f32 stats, biased variance."""

    epsilon: float = 1e-5
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x=None, features: Optional[int] = None,
                 collect: bool = False):
        f = features if x is None else x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (f,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (f,), jnp.float32)
        if collect:
            dt = self.dtype or jnp.float32
            return scale.astype(dt), bias.astype(dt)
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean(xf * xf, axis=-1, keepdims=True) - mean * mean
        y = (xf - mean) * jax.lax.rsqrt(var + self.epsilon) * scale + bias
        return y.astype(self.dtype or x.dtype)


class Mlp(nn.Module):
    """Transformer MLP: Linear -> GELU -> Linear (timm Mlp semantics).

    ``fused=True`` on TPU runs the pair as ONE Pallas kernel
    (ops/pallas/_ffn_kernel.py, residual=False): the 4x-wide hidden
    activation never round-trips HBM. Exact same math (erf gelu, f32 MXU
    accumulation); parameters identical.

    ``ln=(gamma, beta)`` fuses a LayerNorm prologue and ``add_res=True`` a
    plain residual epilogue into the same kernel — the full Twins pre-norm
    MLP branch x + mlp(norm2(x)) in one pass (fused path only; callers keep
    the unfused flow themselves when not on TPU)."""

    hidden: int
    out: int
    fused: bool = False
    dtype: Optional[jnp.dtype] = None
    # 'erf' (exact rational) or 'poly' (divide-free, max|err| 4e-4) gelu
    # inside the fused kernel; the unfused path always uses exact erf.
    ffn_gelu: str = "erf"

    @nn.compact
    def __call__(self, x, ln=None, add_res: bool = False):
        if self.fused and jax.default_backend() == "tpu":
            from streamflow_tpu.ops.pallas._ffn_kernel import (ffn_pair,
                                                               ln_ffn_pair)

            c = x.shape[-1]
            w1, b1 = CollectableDense(self.hidden, dtype=self.dtype,
                                      name="fc1")(None, in_dim=c,
                                                  collect=True)
            w2, b2 = CollectableDense(self.out, dtype=self.dtype,
                                      name="fc2")(None, in_dim=self.hidden,
                                                  collect=True)
            dt = self.dtype or x.dtype
            if ln is not None:
                return ln_ffn_pair(x.astype(dt), ln[0], ln[1], w1, b1,
                                   w2, b2, add_res, self.ffn_gelu)
            return ffn_pair(x.astype(dt), w1, b1, w2, b2, False,
                            self.ffn_gelu)
        assert ln is None, "ln prologue is for the fused TPU path"
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


class Conv1x1(nn.Module):
    """1x1 conv issued as a plain dot_general on the channel axis.

    Parameters are bit-compatible with nn.Conv (kernel (1,1,cin,cout), bias
    (cout,)), but the HLO carries no `convolution` op: XLA's conv layout
    assignment degrades badly when a Mosaic custom call (the fused corr
    lookup / dw chain) shares the refinement-loop body, so every pointwise
    conv on that path is a matmul instead."""

    features: int
    use_bias: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        w = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (1, 1, x.shape[-1], self.features),
            jnp.float32,
        )
        # match nn.Conv dtype promotion: with dtype=None, bf16 x and f32
        # params promote to f32
        dt = self.dtype or jnp.promote_types(x.dtype, jnp.float32)
        y = jax.lax.dot_general(
            x.astype(dt), w[0, 0].astype(dt),
            (((x.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=dt,
        )
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.features,),
                           jnp.float32)
            y = y + b.astype(dt)
        return y


class Conv3x3AsDot(nn.Module):
    """3x3 SAME conv issued as im2col (9 shifted views, ky/kx-major) + one
    dot_general — nn.Conv-compatible params (kernel (3,3,cin,cout)). Used
    where the refinement-loop body must stay free of `convolution` HLOs
    (see Conv1x1)."""

    features: int
    use_bias: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        w = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (3, 3, cin, self.features),
            jnp.float32,
        )
        dt = self.dtype or jnp.promote_types(x.dtype, jnp.float32)
        x = x.astype(dt)
        b_, h, w_, _ = x.shape
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        cols = jnp.concatenate(
            [xp[:, ky:ky + h, kx:kx + w_, :] for ky in range(3)
             for kx in range(3)], axis=-1)
        y = jax.lax.dot_general(
            cols, w.reshape(9 * cin, self.features).astype(dt),
            (((3,), (0,)), ((), ())),
            preferred_element_type=dt,
        )
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros,
                              (self.features,), jnp.float32)
            y = y + bias.astype(dt)
        return y


class PatchifyConv(nn.Module):
    """stride==kernel padding-VALID conv (patch embeds, the GSA subsample)
    as space-to-depth + matmul — exact same math and parameter layout as
    nn.Conv ((k, k, cin, features) kernel + bias), but the contraction runs
    as one MXU dot over the flattened (k, k, cin) patch. XLA's conv emitter
    runs the cin=3 stage-1 patch embed at ~0.3 TFLOP/s in-context (r4
    trace: 5.7 ms/clip across the Twins embeds). Rows/cols beyond the last
    whole patch are cropped, matching VALID windows for stride==kernel."""

    features: int
    kernel: int
    use_bias: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        k = self.kernel
        b, h, w, c = x.shape
        hp, wp = h // k, w // k
        kern = self.param("kernel", nn.initializers.lecun_normal(),
                          (k, k, c, self.features), jnp.float32)
        x = x[:, : hp * k, : wp * k]
        # explicit space-to-depth transpose + 2-D-contraction dot. The
        # transpose costs ~2.1 ms/clip (r4s2 trace) but contracting the
        # (k, k, c) dims in place via dot_general is WORSE: 152.3 vs 140.8
        # ms/clip e2e (XLA lowers the multi-dim contraction poorly).
        x = x.reshape(b, hp, k, wp, k, c).transpose(0, 1, 3, 2, 4, 5)
        x = x.reshape(b, hp, wp, k * k * c)
        dt = self.dtype or jnp.promote_types(x.dtype, jnp.float32)
        y = jax.lax.dot_general(
            x.astype(dt),
            kern.reshape(k * k * c, self.features).astype(dt),
            (((3,), (0,)), ((), ())),
            preferred_element_type=dt,
        )
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros,
                              (self.features,), jnp.float32)
            y = y + bias.astype(dt)
        return y


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
    """nn.Conv with torch-Conv2d-like defaults; NHWC. 1x1/stride-1 convs
    dispatch to the matmul-form Conv1x1; stride==kernel VALID convs to the
    space-to-depth matmul PatchifyConv (identical params either way)."""
    if isinstance(kernel, int):
        kernel = (kernel, kernel)
    if isinstance(stride, int):
        stride = (stride, stride)
    if (kernel == (1, 1) and stride == (1, 1) and groups == 1
            and padding in ("SAME", "VALID", 0, [(0, 0), (0, 0)])):
        return Conv1x1(features=features, use_bias=use_bias, dtype=dtype,
                       name=name)
    if (groups == 1 and padding == "VALID" and kernel == stride
            and kernel[0] == kernel[1]):
        return PatchifyConv(features=features, kernel=kernel[0],
                            use_bias=use_bias, dtype=dtype, name=name)
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
