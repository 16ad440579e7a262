"""Learning-rate schedules.

The reference wraps ``CosineAnnealingLR(T_max=500)`` in
``GradualWarmupScheduler(multiplier=1, total_epoch=1000)`` and steps it once
per *batch* (reference ``betaVAE_training.py:164-166``, ``betaVAE.py:234-235``):
lr ramps linearly 0 -> base over 1000 steps, then follows the (periodic) cosine
closed form. Implemented here as a pure optax-compatible ``step -> lr``
function.
"""

from __future__ import annotations

import jax.numpy as jnp


def gradual_warmup_cosine(
    base_lr: float,
    warmup_steps: int = 1000,
    cosine_steps: int = 500,
    multiplier: float = 1.0,
    eta_min: float = 0.0,
):
    peak = base_lr * multiplier

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        if multiplier == 1.0:
            warm = base_lr * step / max(1, warmup_steps)
        else:
            warm = base_lr * ((multiplier - 1.0) * step / max(1, warmup_steps) + 1.0)
        t = step - warmup_steps
        # torch CosineAnnealingLR closed form — deliberately periodic past T_max
        cos = eta_min + (peak - eta_min) * 0.5 * (1.0 + jnp.cos(jnp.pi * t / cosine_steps))
        return jnp.where(step < warmup_steps, warm, cos)

    return schedule


def constant(lr: float):
    def schedule(step):
        return jnp.asarray(lr, jnp.float32)

    return schedule
