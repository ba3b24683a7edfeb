"""Sequence loss over refinement iterates (reference train_mf.py:52-76):
gamma-weighted L1 across iterations, with invalid pixels and displacements
above MAX_FLOW=400 excluded; metrics EPE/1px/3px/5px on the final iterate.

Shapes (channel-last): preds (I, B, H, W, 2) or (I, B, F, H, W, 2),
gt matching minus the leading I, valid (..., H, W).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

MAX_FLOW = 400.0


def sequence_loss(
    flow_preds: jax.Array,
    flow_gt: jax.Array,
    valid: jax.Array,
    gamma: float = 0.8,
    max_flow: float = MAX_FLOW,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    n = flow_preds.shape[0]
    mag = jnp.sqrt(jnp.sum(flow_gt.astype(jnp.float32) ** 2, axis=-1))
    v = (valid >= 0.5) & (mag < max_flow)
    vf = v.astype(jnp.float32)[..., None]

    weights = gamma ** jnp.arange(n - 1, -1, -1, dtype=jnp.float32)
    l1 = jnp.abs(flow_preds.astype(jnp.float32) - flow_gt[None].astype(jnp.float32))
    # reference: (valid[:, None] * i_loss).mean() — mean over ALL elements,
    # masked ones contributing zero (not a masked mean).
    per_iter = jnp.mean(vf[None] * l1, axis=tuple(range(1, l1.ndim)))
    loss = jnp.sum(weights * per_iter)

    epe = jnp.sqrt(jnp.sum((flow_preds[-1] - flow_gt) ** 2, axis=-1))
    vsum = jnp.maximum(jnp.sum(vf), 1.0)
    masked = lambda x: jnp.sum(x[..., None] * vf) / vsum
    metrics = {
        "epe": masked(epe),
        "1px": masked((epe < 1).astype(jnp.float32)),
        "3px": masked((epe < 3).astype(jnp.float32)),
        "5px": masked((epe < 5).astype(jnp.float32)),
    }
    return loss, metrics
