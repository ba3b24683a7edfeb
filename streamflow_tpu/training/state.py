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
    # Non-trained variable collections (e.g. BatchNorm 'batch_stats' for the
    # basic/resnet CNN encoders). Kept OUT of the optimizer: running stats
    # are updated by the mutable apply in the train step, never by gradient
    # descent (the reference trains cnet BN the torch way,
    # core/models/streamflow.py:46).
    model_state: Any = flax.struct.field(default_factory=dict)

    @classmethod
    def create(cls, params, tx: optax.GradientTransformation,
               model_state=None):
        import jax.numpy as jnp

        return cls(params=params, opt_state=tx.init(params),
                   step=jnp.zeros((), jnp.int32),
                   model_state=model_state or {})

    @classmethod
    def from_variables(cls, variables, tx: optax.GradientTransformation):
        """Split a flax init() dict into trained params vs auxiliary
        collections (batch_stats etc.)."""
        params = {"params": variables["params"]}
        aux = {k: v for k, v in variables.items() if k != "params"}
        return cls.create(params, tx, model_state=aux)

    @property
    def variables(self):
        return {**self.params, **self.model_state}
