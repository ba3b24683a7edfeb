"""Static input padding (reference InputPadder, core/utils/utils.py:7-31, with
the kitti432/kitti400/kitti376 variants of evaluate_mf.py:858-884).

TPU twist: padding targets are computed from *static* shapes at trace time, so
each (H, W) bucket compiles exactly once. ``pad`` uses edge replication like
the reference; ``unpad`` slices the same region back out.
"""

from __future__ import annotations

import jax.numpy as jnp


class InputPadder:
    """Pads (..., H, W, C) images so H and W are divisible by ``factor``."""

    def __init__(self, dims, mode: str = "sintel", factor: int = 8):
        self.ht, self.wd = int(dims[-3]), int(dims[-2])  # NHWC: (..., H, W, C)
        f = factor
        pad_ht = (((self.ht // f) + 1) * f - self.ht) % f
        pad_wd = (((self.wd // f) + 1) * f - self.wd) % f
        if mode == "sintel":
            self._pad = (
                pad_wd // 2,
                pad_wd - pad_wd // 2,
                pad_ht // 2,
                pad_ht - pad_ht // 2,
            )
        elif mode == "kitti432":
            self._pad = (pad_wd // 2, pad_wd - pad_wd // 2, 0, 432 - self.ht)
        elif mode == "kitti400":
            self._pad = (pad_wd // 2, pad_wd - pad_wd // 2, 0, 400 - self.ht)
        elif mode == "kitti376":
            self._pad = (pad_wd // 2, pad_wd - pad_wd // 2, 0, 376 - self.ht)
        else:  # 'kitti' and others: pad bottom only
            self._pad = (pad_wd // 2, pad_wd - pad_wd // 2, 0, pad_ht)

    @property
    def padded_shape(self):
        l, r, t, b = self._pad
        return (self.ht + t + b, self.wd + l + r)

    def pad(self, *inputs):
        out = [self._pad_one(x) for x in inputs]
        return out if len(out) > 1 else out[0]

    def pad_list(self, inputs):
        return [self._pad_one(x) for x in inputs]

    def _pad_one(self, x):
        l, r, t, b = self._pad
        ndim = x.ndim
        cfg = [(0, 0)] * (ndim - 3) + [(t, b), (l, r), (0, 0)]
        return jnp.pad(x, cfg, mode="edge")

    def unpad(self, x):
        l, r, t, b = self._pad
        h, w = x.shape[-3], x.shape[-2]
        return x[..., t : h - b, l : w - r, :]
