"""Optimizer: AdamW + linear OneCycle schedule with gradient clipping
(reference fetch_optimizer, train_mf.py:79-85: OneCycleLR pct_start=0.05,
anneal_strategy='linear', total_steps=num_steps+100; grad clip 1.0 at
train_mf.py:254).

On TPU there is no GradScaler: bf16 has fp32-range exponents, so the
reference's AMP loss-scaling machinery (train_mf.py:190,251-257) has no
equivalent here by design.
"""

from __future__ import annotations

import optax


def onecycle_linear(max_lr: float, total_steps: int, pct_start: float = 0.05,
                    div_factor: float = 25.0, final_div_factor: float = 1e4):
    """Linear one-cycle LR: warm up from max_lr/div_factor to max_lr over
    pct_start, then anneal linearly to max_lr/(div_factor*final_div_factor)
    (torch OneCycleLR semantics with anneal_strategy='linear')."""
    warm = max(1, int(total_steps * pct_start))
    init_lr = max_lr / div_factor
    final_lr = init_lr / final_div_factor
    return optax.join_schedules(
        [
            optax.linear_schedule(init_lr, max_lr, warm),
            optax.linear_schedule(max_lr, final_lr, total_steps - warm),
        ],
        boundaries=[warm],
    )


def make_optimizer(
    lr: float,
    num_steps: int,
    weight_decay: float = 1e-5,
    epsilon: float = 1e-8,
    clip: float = 1.0,
    pct_start: float = 0.05,
) -> optax.GradientTransformation:
    schedule = onecycle_linear(lr, num_steps + 100, pct_start)
    return optax.chain(
        optax.clip_by_global_norm(clip),
        optax.adamw(schedule, b1=0.9, b2=0.999, eps=epsilon,
                    weight_decay=weight_decay),
    )
