"""Train state: params + optimizer + step counter, mirroring the reference's
checkpoint dict {model, optimizer, scheduler, total_steps}
(train_mf.py:207-212). The LR schedule lives inside the optax transform, so
there is no separate scheduler state."""

from __future__ import annotations

from typing import Any

import flax.struct
import jax
import optax


@flax.struct.dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: jax.Array

    @classmethod
    def create(cls, params, tx: optax.GradientTransformation):
        import jax.numpy as jnp

        return cls(params=params, opt_state=tx.init(params),
                   step=jnp.zeros((), jnp.int32))
