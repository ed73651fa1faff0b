"""Standalone cadence training wrappers.

TPU-native equivalents of the reference Lightning wrappers
``CadencePLModel`` / ``CadenceNeighborPLModel`` / ``CadenceAssistedPLModel``
(analysisgnn/models/cadence.py:347-607): SMOTE oversampling in embedding
space, the synthetic-vs-real feature-distance penalty, label-smoothed CE
on the oversampled batch, inverse-class-frequency weighted validation CE,
and the MultiStepLR([10, 40, 80], gamma=0.2) schedule — all as pure jitted
functions over a single train-state pytree.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from analysisgnn_tpu.train.smote import smote_feature_penalty, smote_oversample


@dataclasses.dataclass(frozen=True)
class CadenceStepConfig:
    num_classes: int = 5
    reg_loss_weight: float = 0.1  # reference :359
    smote_k: int = 3  # CadenceNeighborPLModel uses k=3 euclid (:478)
    num_synthetic: int = 256  # static synthetic-row budget (masked)
    label_smoothing: float = 0.1  # reference :372
    # CadencePLModel scales the feature penalty by 0.01·epoch (:422);
    # CadenceNeighborPLModel does not (:505-510).  Keep as a knob.
    epoch_scaled_penalty: bool = False


def multistep_lr(
    base_lr: float = 1e-4,
    steps_per_epoch: int = 1,
    milestones: Tuple[int, ...] = (10, 40, 80),
    gamma: float = 0.2,
) -> optax.Schedule:
    """``MultiStepLR(milestones=[10, 40, 80], gamma=0.2)`` (reference
    configure_optimizers, models/cadence.py:448-451) as an optax schedule
    over steps (milestones are epochs)."""
    return optax.piecewise_constant_schedule(
        base_lr, {m * steps_per_epoch: gamma for m in milestones}
    )


def cadence_train_loss(
    encode: Callable[..., jax.Array],
    clf: Callable[..., jax.Array],
    y: jax.Array,
    weight: jax.Array,
    rng: jax.Array,
    cfg: CadenceStepConfig,
    epoch: jax.Array | int = 0,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """The reference training_step loss (models/cadence.py:395-423):

    feature_loss = mean(x²) + Σ_class clamp(min‖x_syn − x_real‖ − 1, 0)
    total = CE_ls0.1(clf(x ⊕ x_syn), y ⊕ y_syn) + w_reg·feature_loss

    ``encode``/``clf`` are thunks already bound to params/batch so this
    composes with any of the three model variants.
    """
    x = encode()
    feature_loss = (x * x * weight[:, None]).sum() / jnp.maximum(
        weight.sum() * x.shape[-1], 1.0
    )
    x_syn, y_syn, w_syn = smote_oversample(
        x, y, weight.astype(bool), rng, cfg.num_classes, cfg.num_synthetic,
        k=cfg.smote_k,
    )
    feature_loss = feature_loss + smote_feature_penalty(
        x_syn, w_syn, x, y, y_syn, weight.astype(bool)
    )
    x_all = jnp.concatenate([x, x_syn], axis=0)
    y_all = jnp.concatenate([y, y_syn], axis=0)
    w_all = jnp.concatenate(
        [weight.astype(jnp.float32), w_syn.astype(jnp.float32)], axis=0
    )
    logits = clf(x_all)
    # label smoothing applied explicitly (matches torch CE(label_smoothing=.1))
    logp = jax.nn.log_softmax(logits)
    smooth = cfg.label_smoothing
    onehot = jax.nn.one_hot(jnp.clip(y_all, 0, cfg.num_classes - 1), cfg.num_classes)
    soft = onehot * (1.0 - smooth) + smooth / cfg.num_classes
    ce = -(soft * logp).sum(-1)
    clf_loss = (ce * w_all).sum() / jnp.maximum(w_all.sum(), 1.0)
    reg_w = cfg.reg_loss_weight * (
        (0.01 * epoch) if cfg.epoch_scaled_penalty else 1.0
    )
    total = clf_loss + reg_w * feature_loss
    return total, {"clf_loss": clf_loss, "feature_loss": feature_loss}


def cadence_val_loss(
    logits: jax.Array, y: jax.Array, weight: jax.Array, num_classes: int
) -> jax.Array:
    """Inverse-class-frequency weighted CE (reference validation_step,
    models/cadence.py:426-436)."""
    y = jnp.clip(y, 0, num_classes - 1)
    counts = jax.ops.segment_sum(
        weight.astype(jnp.float32), y, num_classes
    )
    class_w = 1.0 / (counts + 1e-6)
    w = class_w[y] * weight.astype(jnp.float32)
    ce = optax.softmax_cross_entropy_with_integer_labels(logits, y)
    return (ce * w).sum() / jnp.maximum(w.sum(), 1e-9)


def make_cadence_train_step(
    model,
    optimizer: optax.GradientTransformation,
    cfg: CadenceStepConfig,
    edge_key=("note", "onset", "note"),
):
    """Jitted train step for ``CadenceGNNNeighbor`` (and, via the same
    encode/clf protocol, ``CadenceGNN``): grads of ``cadence_train_loss``
    through encoder + SMOTE + head."""

    def loss_fn(params, batch_inputs, y, weight, rng, epoch):
        x_dict, edge_index_dict = batch_inputs
        drop_rng, smote_rng = jax.random.split(rng)

        def encode():
            return model.apply(
                params, x_dict, edge_index_dict, deterministic=False,
                method=model.encode, rngs={"dropout": drop_rng},
            )

        def clf(x):
            return model.apply(
                params, x, deterministic=False, method=model.clf,
                rngs={"dropout": drop_rng},
            )

        return cadence_train_loss(encode, clf, y, weight, smote_rng, cfg, epoch)

    @jax.jit
    def step(params, opt_state, x_dict, edge_index_dict, y, weight, rng, epoch):
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, (x_dict, edge_index_dict), y, weight, rng, epoch
        )
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, aux

    return step
