"""Loss functions: masked label-smoothed CE, uncertainty-weighted multi-task
loss, FAMO, knowledge distillation, EWC.

References: per-task ``nn.CrossEntropyLoss(ignore_index=-1,
label_smoothing=0.1)`` (analysisgnn/models/analysis.py:881-888);
``MultiTaskLoss`` homoscedastic uncertainty weighting (models/chord.py:16-49);
``FAMO`` (models/analysis.py:278-357); distillation KL with T=2
(:1040-1063); EWC quadratic penalty (:1479-1495).

All functions are pure and jit-friendly: raggedness is expressed with weight
masks, never boolean indexing.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax


def masked_cross_entropy(
    logits: jax.Array,
    labels: jax.Array,
    weight: jax.Array,
    label_smoothing: float = 0.1,
) -> jax.Array:
    """Mean label-smoothed CE over positions with nonzero ``weight``.

    Matches torch CE semantics: smoothing distributes ``ε/K`` to every class;
    ``ignore_index`` is expressed by zero weight (labels are clipped first so
    gathers stay in range).
    """
    num_classes = logits.shape[-1]
    labels = jnp.clip(labels, 0, num_classes - 1)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
    smooth = -logp.mean(axis=-1)
    per_elem = (1.0 - label_smoothing) * nll + label_smoothing * smooth
    weight = weight.astype(per_elem.dtype)
    denom = jnp.maximum(weight.sum(), 1.0)
    return (per_elem * weight).sum() / denom


def init_mt_params(num_tasks: int) -> jax.Array:
    """Learnable uncertainty parameters, initialized to 1
    (reference MultiTaskLoss, models/chord.py:35)."""
    return jnp.ones((num_tasks,), jnp.float32)


def multi_task_loss(
    task_losses: Dict[str, jax.Array],
    mt_params: Optional[jax.Array],
    task_order: Tuple[str, ...],
    strategy: str = "wloss",
) -> jax.Array:
    """Combine per-task losses.

    ``wloss``: Σ 0.5/p_i² · L_i + log(1 + p_i²) with trainable p
    (reference models/chord.py:39-49).  Anything else: plain sum.
    """
    if strategy == "wloss" and mt_params is not None:
        total = 0.0
        for i, t in enumerate(task_order):
            if t in task_losses:
                p = mt_params[i]
                total = total + 0.5 / (p**2) * task_losses[t] + jnp.log1p(p**2)
        return total
    return sum(task_losses.values())


# --------------------------------------------------------------------------- #
# FAMO — Fast Adaptive Multitask Optimization (reference :278-357)
# --------------------------------------------------------------------------- #


class FAMOState(NamedTuple):
    w: jax.Array  # task logits
    opt_state: optax.OptState
    prev_loss: jax.Array
    min_losses: jax.Array


def famo_init(num_tasks: int, w_lr: float = 0.025, gamma: float = 0.01) -> Tuple[FAMOState, optax.GradientTransformation]:
    opt = optax.adamw(w_lr, weight_decay=gamma)
    w = jnp.zeros((num_tasks,), jnp.float32)
    return (
        FAMOState(
            w=w,
            opt_state=opt.init(w),
            prev_loss=jnp.zeros((num_tasks,), jnp.float32),
            min_losses=jnp.zeros((num_tasks,), jnp.float32),
        ),
        opt,
    )


def famo_weighted_loss(
    state: FAMOState, losses: jax.Array, mask: jax.Array
) -> Tuple[jax.Array, FAMOState]:
    """FAMO surrogate loss: Σ log(D_i)·z_i / c (reference :310-321)."""
    z = jax.nn.softmax(jnp.where(mask, state.w, -jnp.inf), axis=-1)
    d = jnp.where(mask, losses - state.min_losses + 1e-8, 1.0)
    c = jax.lax.stop_gradient((z / d).sum())
    loss = (jnp.log(d) * z / jnp.maximum(c, 1e-12)).sum()
    new_state = state._replace(
        prev_loss=jnp.where(mask, losses, state.prev_loss)
    )
    return loss, new_state


def famo_update(
    state: FAMOState, opt: optax.GradientTransformation, curr_loss: jax.Array
) -> FAMOState:
    """Post-step task-logit update (reference :323-332)."""
    delta = jnp.log(state.prev_loss - state.min_losses + 1e-8) - jnp.log(
        curr_loss - state.min_losses + 1e-8
    )
    _, vjp = jax.vjp(lambda w: jax.nn.softmax(w, -1), state.w)
    (grad,) = vjp(delta)
    updates, new_opt_state = opt.update(grad, state.opt_state, state.w)
    return state._replace(
        w=optax.apply_updates(state.w, updates), opt_state=new_opt_state
    )


# --------------------------------------------------------------------------- #
# Continual-learning auxiliary losses
# --------------------------------------------------------------------------- #


def distillation_loss(
    student_logits: Dict[str, jax.Array],
    teacher_logits: Dict[str, jax.Array],
    weight: jax.Array,
    tasks: Tuple[str, ...],
    temperature: float = 2.0,
) -> jax.Array:
    """Mean over tasks of KL(teacher ‖ student) at temperature T, scaled T²
    (reference :1053-1061), masked to valid rows."""
    if not tasks:
        return jnp.asarray(0.0)
    losses = []
    w = weight.astype(jnp.float32)
    denom = jnp.maximum(w.sum(), 1.0)
    for t in tasks:
        sp = jax.nn.log_softmax(student_logits[t] / temperature, axis=-1)
        tp = jax.nn.softmax(teacher_logits[t] / temperature, axis=-1)
        kl = (tp * (jnp.log(jnp.maximum(tp, 1e-12)) - sp)).sum(-1)
        losses.append((kl * w).sum() / denom * temperature**2)
    return jnp.stack(losses).mean()


def ewc_penalty(params, means, fisher) -> jax.Array:
    """Σ F · (θ - θ*)² over all parameters (reference :1479-1495)."""
    leaves = jax.tree_util.tree_leaves(
        jax.tree_util.tree_map(
            lambda p, m, f: (f * (p - m) ** 2).sum(), params, means, fisher
        )
    )
    return sum(leaves) if leaves else jnp.asarray(0.0)
