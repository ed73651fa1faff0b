"""The jitted multi-task train/eval step.

Functional re-design of ``ContinualAnalysisGNN.common_step``
(analysisgnn/models/analysis.py:947-1080): label clipping (:954-956),
validity masking (:963-973) as weight masks, encoder forward, feature-norm
loss (:984), per-task label-smoothed CE through the multi-task combiner
(:1035-1037), distillation from the frozen teacher over previous tasks
(:1040-1063), EWC penalty (:1064-1068), all inside ONE ``jax.jit`` with a
single optimizer update (AdamW + clip, :1380-1410).

Task presence and the previous-task set are *static* arguments baked into the
compiled step (they change only at CL task switches — a handful of
recompiles per run, reference :1166-1182).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import optax

from analysisgnn_tpu.core.graph import HeteroGraph, NOTE
from analysisgnn_tpu.train.losses import (
    distillation_loss,
    ewc_penalty,
    famo_init,
    famo_update,
    famo_weighted_loss,
    masked_cross_entropy,
    multi_task_loss,
)
from analysisgnn_tpu.train.metrics import masked_accuracy
from analysisgnn_tpu.train.state import TrainState

# task → per-task validity-mask attribute (reference create_mask_dict,
# models/analysis.py:935-945; the reference's "has_phrase" lookup never
# matches the DLC attr "valid_phrase_label" — fixed here so phrase masking
# actually applies).
TASK_MASK_ATTRS: Dict[str, str] = {
    "cadence": "valid_cadence_label",
    "phrase": "valid_phrase_label",
    "organ_point": "valid_organ_point_label",
    "section": "valid_section_start_label",
}


@dataclasses.dataclass(frozen=True)
class StepConfig:
    task_dict: Tuple[Tuple[str, int], ...]  # all heads (static)
    active_tasks: Tuple[str, ...]  # tasks with labels in this dataset
    previous_tasks: Tuple[str, ...] = ()  # distillation targets
    mt_strategy: str = "wloss"
    lambda_dctn: float = 0.5
    lambda_featl: float = 0.1
    lambda_ewc: float = 2.0
    use_ewc: bool = False
    label_smoothing: float = 0.1
    use_edge_loss: bool = False
    lambda_edge: float = 0.1
    use_smote: bool = False
    smote_synthetic: int = 256
    # "float32" | "bfloat16": compute dtype for fwd/bwd; the optimizer and
    # loss accumulation stay fp32 (standard TPU mixed precision — params are
    # cast at apply time, flax modules infer compute dtype from operands)
    compute_dtype: str = "float32"

# RNA label set defining edge-consistency targets (reference :988)
EDGE_LOSS_RNA_KEYS = ("quality", "inversion", "degree1", "degree2", "localkey")


def _task_weights(
    batch: HeteroGraph, cfg: StepConfig
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """target ∧ valid_label base weight + per-task extra masks."""
    attrs = batch.node_attrs[NOTE]
    base = batch.target_mask()
    if "valid_label" in attrs:
        base = base & attrs["valid_label"].astype(bool)
    weights = {}
    for task in cfg.active_tasks:
        w = base
        mask_attr = TASK_MASK_ATTRS.get(task)
        if mask_attr and mask_attr in attrs:
            w = w & attrs[mask_attr].astype(bool)
        weights[task] = w
    return base, weights


def compute_losses(
    model,
    params,
    mt_params,
    teacher_params,
    batch: HeteroGraph,
    cfg: StepConfig,
    rngs: Optional[dict],
    deterministic: bool,
    famo_state=None,
):
    """Shared forward + loss assembly for train and eval."""
    task_sizes = dict(cfg.task_dict)
    attrs = batch.node_attrs[NOTE]
    base_w, task_w = _task_weights(batch, cfg)
    if cfg.compute_dtype == "bfloat16":
        cast = lambda t: jax.tree_util.tree_map(
            lambda a: a.astype(jnp.bfloat16)
            if hasattr(a, "dtype") and a.dtype == jnp.float32
            else a,
            t,
        )
        params = cast(params)
        teacher_params = cast(teacher_params)
        batch = dataclasses.replace(batch, node_features=cast(batch.node_features))
    args = (
        batch.x_dict(),
        batch.edge_index_dict(),
        batch.batch,
        attrs["pitch_spelling"],
        attrs["key_signature"],
        batch.num_target_nodes,
    )
    x = model.apply(
        params, *args, deterministic=deterministic, method=model.encode, rngs=rngs
    )
    # feature-norm regularizer over valid target rows (reference :984)
    fw = base_w.astype(jnp.float32)
    x32 = x.astype(jnp.float32)
    feature_loss = (jnp.sum(x32**2, axis=-1) * fw).sum() / jnp.maximum(
        fw.sum() * x.shape[-1], 1.0
    )
    logits = model.apply(
        params, x, deterministic=deterministic, method=model.classify, rngs=rngs
    )
    # SMOTE embedding-space oversampling for single-task cadence training
    # (reference common_step :1023-1029): synthetic minority-class points
    # contribute extra CE terms, plus the distance penalty on feature_loss.
    smote_extra = None
    if (
        cfg.use_smote
        and cfg.active_tasks == ("cadence",)
        and rngs is not None
        and "cadence" in attrs
    ):
        from analysisgnn_tpu.train.smote import (
            smote_feature_penalty,
            smote_oversample,
        )

        n_cls = dict(cfg.task_dict)["cadence"]
        y = jnp.where(attrs["cadence"] < n_cls, attrs["cadence"], 0)
        x_syn, y_syn, w_syn = smote_oversample(
            x, y, base_w, rngs["dropout"], n_cls, cfg.smote_synthetic
        )
        feature_loss = feature_loss + smote_feature_penalty(
            x_syn, w_syn, x, y, y_syn, base_w
        )
        smote_extra = (x_syn, y_syn, w_syn)

    task_losses: Dict[str, jax.Array] = {}
    metrics: Dict[str, jax.Array] = {}
    for task in cfg.active_tasks:
        n_cls = task_sizes[task]
        labels = attrs[task]
        # clip out-of-range labels to 0 (reference :954-956)
        labels = jnp.where(labels < n_cls, labels, 0)
        w = task_w[task]
        task_losses[task] = masked_cross_entropy(
            logits[task], labels, w, cfg.label_smoothing
        )
        if task == "cadence" and smote_extra is not None:
            x_syn, y_syn, w_syn = smote_extra
            syn_logits = model.apply(
                params, x_syn, deterministic=deterministic,
                method=model.classify, rngs=rngs,
            )["cadence"]
            task_losses[task] = 0.5 * task_losses[task] + 0.5 * masked_cross_entropy(
                syn_logits, y_syn, w_syn, cfg.label_smoothing
            )
        metrics[f"{task}_acc"] = masked_accuracy(logits[task], labels, w)
        metrics[f"{task}_acc__w"] = w.sum().astype(jnp.float32)
    task_order = tuple(t for t, _ in cfg.task_dict)
    if cfg.mt_strategy == "famo" and famo_state is not None:
        loss_vec = jnp.stack(
            [task_losses.get(t, jnp.asarray(0.0)) for t in task_order]
        )
        mask_vec = jnp.asarray([t in task_losses for t in task_order])
        total, _ = famo_weighted_loss(famo_state, loss_vec, mask_vec)
    else:
        # NOTE: the reference sums the weighted task losses WITHOUT dividing
        # by the task count (MultiTaskLoss, models/chord.py:39-49) and relies
        # on gradient clipping at 1.0 — keep that scaling exactly (dividing
        # here pushed the gradient norm under the clip threshold and changed
        # the optimization dynamics measurably; scripts/variant_sweep.py).
        total = multi_task_loss(task_losses, mt_params, task_order, cfg.mt_strategy)

    # edge-consistency loss (reference :986-1019): binary per-edge labels,
    # true when ALL RNA labels agree between endpoints
    if cfg.use_edge_loss and all(k in attrs for k in EDGE_LOSS_RNA_KEYS):
        from analysisgnn_tpu.models.analysis import restrict_edges_to_targets

        n_cap = x.shape[0]
        note_note = {
            et: restrict_edges_to_targets(
                ei, batch.num_target_nodes, n_cap, drop_self_loops=False
            )
            for et, ei in batch.edge_index_dict().items()
            if et[0] == NOTE and et[2] == NOTE
        }
        edge_logits = model.apply(
            params, x, note_note, deterministic=deterministic,
            method=model.decode_edges, rngs=rngs,
        )
        e_losses = []
        for et, logits_e in edge_logits.items():
            ei = note_note[et]
            valid_e = (ei[0] < n_cap) & (ei[1] < n_cap)
            same = jnp.ones_like(valid_e)
            for k in EDGE_LOSS_RNA_KEYS:
                lab = attrs[k]
                a = lab[jnp.minimum(ei[0], n_cap - 1)]
                b = lab[jnp.minimum(ei[1], n_cap - 1)]
                same = same & (a == b)
            e_losses.append(
                masked_cross_entropy(
                    logits_e, same.astype(jnp.int32), valid_e, cfg.label_smoothing
                )
            )
        if e_losses:
            edge_loss = cfg.lambda_edge * jnp.stack(e_losses).mean()
            total = total + edge_loss
            metrics["edge_loss"] = edge_loss

    memory_loss = jnp.asarray(0.0)
    if cfg.previous_tasks and cfg.lambda_dctn > 0:
        x_t = model.apply(
            teacher_params, *args, deterministic=True, method=model.encode
        )
        teacher_logits = model.apply(
            teacher_params, x_t, deterministic=True, method=model.classify
        )
        student_logits = model.apply(
            params, x_t, deterministic=deterministic, method=model.classify, rngs=rngs
        )
        memory_loss = cfg.lambda_dctn * distillation_loss(
            student_logits, teacher_logits, base_w, cfg.previous_tasks
        )
    return total, feature_loss, memory_loss, task_losses, metrics


def _make_step_body(model, optimizer: optax.GradientTransformation, cfg: StepConfig):
    """The pure (unjitted) ``(state, batch) -> (state, aux)`` step body.

    Shared by :func:`make_train_step` (one jit per batch) and
    :func:`make_train_step_multi` (``lax.scan`` over K stacked batches in a
    single dispatch — on runtimes where per-dispatch latency rivals the
    compute, e.g. remote-tunnel TPU links, this amortizes the launch cost
    across K optimizer updates with bit-identical math)."""

    def loss_fn(trainables, state: TrainState, batch: HeteroGraph, rng):
        params, mt_params = trainables
        rngs = {"dropout": rng}
        total, feature_loss, memory_loss, task_losses, metrics = compute_losses(
            model, params, mt_params, state.teacher_params, batch, cfg, rngs,
            False, famo_state=state.famo,
        )
        loss = total + memory_loss + cfg.lambda_featl * feature_loss
        if cfg.use_ewc:
            loss = loss + cfg.lambda_ewc * ewc_penalty(
                params, state.means, state.fisher
            )
        aux = {
            "total_loss": loss,
            "task_loss": total,
            "feature_loss": feature_loss,
            "memory_loss": memory_loss,
            **{f"{k}_loss": v for k, v in task_losses.items()},
            **metrics,
        }
        return loss, aux

    task_order = tuple(t for t, _ in cfg.task_dict)
    famo_opt = famo_init(len(task_order))[1] if cfg.mt_strategy == "famo" else None

    def step_body(state: TrainState, batch: HeteroGraph):
        rng, new_rng = jax.random.split(state.rng)
        grads, aux = jax.grad(loss_fn, has_aux=True)(
            (state.params, state.mt_params), state, batch, rng
        )
        updates, new_opt_state = optimizer.update(
            grads, state.opt_state, (state.params, state.mt_params)
        )
        new_params, new_mt = optax.apply_updates(
            (state.params, state.mt_params), updates
        )
        new_famo = state.famo
        if cfg.mt_strategy == "famo" and state.famo is not None:
            # task-logit update from the previous step's losses vs this
            # step's (reference FAMO.update, models/analysis.py:323-332),
            # then record this step's losses as the new anchor
            curr = jnp.stack(
                [aux.get(f"{t}_loss", jnp.asarray(0.0)) for t in task_order]
            )
            active = jnp.asarray([t in cfg.active_tasks for t in task_order])
            new_famo = famo_update(state.famo, famo_opt, curr)._replace(
                prev_loss=jnp.where(active, curr, state.famo.prev_loss)
            )
        # NaN/Inf-loss step skip (reference models/analysis.py:732-733 returns
        # None from training_step on non-finite loss): keep params/optimizer
        # untouched for this batch, still advance step + rng.
        finite = jnp.isfinite(aux["total_loss"])
        keep = lambda new, old: jax.tree_util.tree_map(
            lambda n, o: jnp.where(finite, n, o), new, old
        )
        new_state = dataclasses.replace(
            state,
            step=state.step + 1,
            params=keep(new_params, state.params),
            mt_params=keep(new_mt, state.mt_params),
            opt_state=keep(new_opt_state, state.opt_state),
            rng=new_rng,
            famo=keep(new_famo, state.famo) if new_famo is not None else None,
        )
        aux["skipped_nonfinite"] = (~finite).astype(jnp.float32)
        return new_state, aux

    return step_body


def make_train_step(model, optimizer: optax.GradientTransformation, cfg: StepConfig):
    """Build the jitted training step for a fixed (static) StepConfig."""
    # donate the state: params/opt-state buffers are updated in place instead
    # of being copied every step (~6× params worth of HBM traffic saved)
    return partial(jax.jit, donate_argnums=(0,))(
        _make_step_body(model, optimizer, cfg)
    )


def make_train_step_multi(model, optimizer: optax.GradientTransformation, cfg: StepConfig):
    """Jitted K-step trainer: ``(state, stacked_batches) -> (state, auxes)``.

    ``stacked_batches`` is a :class:`HeteroGraph` pytree whose every leaf has
    a leading ``[K]`` axis (see :func:`stack_batches`); the body runs K full
    optimizer updates under one ``lax.scan``, so host→device dispatch cost is
    paid once per K steps instead of per step.  ``auxes`` leaves are stacked
    ``[K]``."""
    body = _make_step_body(model, optimizer, cfg)

    @partial(jax.jit, donate_argnums=(0,))
    def train_step_multi(state: TrainState, stacked_batches: HeteroGraph):
        return jax.lax.scan(body, state, stacked_batches)

    return train_step_multi


def stack_batches(batches: Sequence[HeteroGraph]) -> HeteroGraph:
    """Stack identically-shaped sampler batches along a new leading axis for
    :func:`make_train_step_multi` (static-shape sampling guarantees the
    shapes match)."""
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *batches)


def make_eval_step(model, cfg: StepConfig):
    @jax.jit
    def eval_step(state: TrainState, batch: HeteroGraph):
        total, feature_loss, _, task_losses, metrics = compute_losses(
            model, state.params, state.mt_params, state.teacher_params,
            batch, cfg, None, True,
        )
        base_w, task_w = _task_weights(batch, cfg)
        out = {
            "total_loss": total,
            "total_loss__w": base_w.sum().astype(jnp.float32),
            **{f"{k}_loss": v for k, v in task_losses.items()},
            **{
                f"{k}_loss__w": task_w[k].sum().astype(jnp.float32)
                for k in task_losses
            },
            **metrics,
        }
        return out

    return eval_step


def make_test_step(model, cfg: StepConfig):
    """Evaluation step with the reference's composite test metrics: per-task
    accuracy plus onset-wise RNA accuracy (models/analysis.py:1226-1264) and
    the NCT-masked variant (:1271-1282) when their task sets are active."""
    from analysisgnn_tpu.train.metrics import (
        NCT_RNA_KEYS,
        RNA_KEYS,
        f1_stats,
        nct_rna_accuracy,
        onsetwise_rna_accuracy,
    )

    @jax.jit
    def test_step(state: TrainState, batch: HeteroGraph):
        attrs = batch.node_attrs[NOTE]
        base_w, task_w = _task_weights(batch, cfg)
        args = (
            batch.x_dict(),
            batch.edge_index_dict(),
            batch.batch,
            attrs["pitch_spelling"],
            attrs["key_signature"],
            batch.num_target_nodes,
        )
        logits = model.apply(state.params, *args, deterministic=True)
        task_sizes = dict(cfg.task_dict)
        out: Dict[str, jax.Array] = {}
        labels_dict = {}
        for task in cfg.active_tasks:
            labels = attrs[task]
            labels = jnp.where(labels < task_sizes[task], labels, 0)
            labels_dict[task] = labels
            out[f"{task}_acc"] = masked_accuracy(logits[task], labels, task_w[task])
            out[f"{task}_acc__w"] = task_w[task].sum().astype(jnp.float32)
            # split-level macro-F1 sufficient statistics (reference logs
            # torchmetrics F1Score(average="macro") per task,
            # models/analysis.py:890-891, 1147-1150)
            out[f"{task}_f1_stats"] = f1_stats(
                logits[task], labels, task_w[task], task_sizes[task]
            )
        if all(k in cfg.active_tasks for k in RNA_KEYS):
            onset = batch.edges((NOTE, "onset", NOTE))
            acc, wsum = onsetwise_rna_accuracy(
                logits,
                labels_dict,
                onset,
                attrs["onset_div"],
                batch.batch[NOTE],
                base_w,
                with_weight=True,
            )
            out["rna_onset_acc"] = acc
            out["rna_onset_acc__w"] = wsum
        if "tpc_in_label" in cfg.active_tasks and all(
            k in cfg.active_tasks for k in NCT_RNA_KEYS
        ):
            acc, wsum = nct_rna_accuracy(
                logits, labels_dict, base_w, with_weight=True
            )
            out["rna_nct_acc"] = acc
            out["rna_nct_acc__w"] = wsum
        return out

    return test_step


def make_fisher_step(model, cfg: StepConfig):
    """Gradient² accumulation step for EWC memory replay
    (reference memory_replay + compute_fisher, :1326-1368, :1440-1455)."""

    @jax.jit
    def fisher_step(state: TrainState, batch: HeteroGraph, scale: jax.Array):
        def loss_only(params):
            total, _, _, _, _ = compute_losses(
                model, params, state.mt_params, state.teacher_params,
                batch, cfg, None, True,
            )
            return total

        grads = jax.grad(loss_only)(state.params)
        fisher = jax.tree_util.tree_map(
            lambda f, g: f + (g**2) / scale, state.fisher, grads
        )
        return dataclasses.replace(state, fisher=fisher)

    return fisher_step
