"""Learning-rate schedules (optax).

Functional equivalents of the reference's step-based linear warmup followed by
cosine annealing / exponential decay (analysisgnn/models/analysis.py:104-275),
with warmup sizing per ``configure_optimizers`` (:1380-1410):
``warmup = min(500, total_steps // 20)`` and ``eta_min = lr * 0.01``.
"""

from __future__ import annotations

import jax.numpy as jnp
import optax


def warmup_cosine_schedule(
    base_lr: float,
    total_steps: int,
    warmup_steps: int | None = None,
    warmup_start_lr: float = 0.0,
    eta_min_ratio: float = 0.01,
) -> optax.Schedule:
    if warmup_steps is None:
        warmup_steps = min(500, max(total_steps // 20, 1))
    eta_min = base_lr * eta_min_ratio

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = warmup_start_lr + (base_lr - warmup_start_lr) * (
            step / jnp.maximum(warmup_steps, 1)
        )
        progress = jnp.clip(
            (step - warmup_steps) / jnp.maximum(total_steps - warmup_steps, 1), 0.0, 1.0
        )
        cos = eta_min + 0.5 * (base_lr - eta_min) * (1 + jnp.cos(jnp.pi * progress))
        return jnp.where(step < warmup_steps, warm, cos)

    return schedule


def warmup_exponential_schedule(
    base_lr: float,
    decay_steps: int,
    warmup_steps: int = 500,
    gamma: float = 0.999,
    eta_min: float = 0.0,
) -> optax.Schedule:
    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = base_lr * step / jnp.maximum(warmup_steps, 1)
        decay = base_lr * gamma ** ((step - warmup_steps) / decay_steps)
        return jnp.where(step < warmup_steps, warm, jnp.maximum(decay, eta_min))

    return schedule
