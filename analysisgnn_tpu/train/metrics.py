"""Jit-friendly masked evaluation metrics.

Functional equivalents of the torchmetrics usage in the reference: per-task
accuracy and macro-F1 (models/analysis.py:890-891), the composite onset-wise
RNA accuracy with Cantor-pair onset dedup (:1226-1264) and the NCT-masked
variant (:1271-1282).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

RNA_KEYS: Tuple[str, ...] = ("quality", "inversion", "degree1", "degree2")
NCT_RNA_KEYS: Tuple[str, ...] = ("quality", "inversion", "degree1", "degree2", "localkey")


def masked_accuracy(logits: jax.Array, labels: jax.Array, weight: jax.Array) -> jax.Array:
    pred = jnp.argmax(logits, axis=-1)
    correct = (pred == labels).astype(jnp.float32) * weight
    return correct.sum() / jnp.maximum(weight.sum(), 1.0)


def masked_macro_f1(
    logits: jax.Array, labels: jax.Array, weight: jax.Array, num_classes: int
) -> jax.Array:
    """Macro F1 over classes present in the (masked) labels."""
    pred = jnp.argmax(logits, axis=-1)
    w = weight.astype(jnp.float32)
    labels = jnp.clip(labels, 0, num_classes - 1)
    onehot_true = jax.nn.one_hot(labels, num_classes) * w[:, None]
    onehot_pred = jax.nn.one_hot(pred, num_classes) * w[:, None]
    tp = (onehot_true * onehot_pred).sum(0)
    fp = onehot_pred.sum(0) - tp
    fn = onehot_true.sum(0) - tp
    f1 = 2 * tp / jnp.maximum(2 * tp + fp + fn, 1e-9)
    present = (onehot_true.sum(0) > 0).astype(jnp.float32)
    return (f1 * present).sum() / jnp.maximum(present.sum(), 1.0)


def f1_stats(
    logits: jax.Array, labels: jax.Array, weight: jax.Array, num_classes: int
) -> jax.Array:
    """Sufficient statistics [tp, fp, fn] per class, shape [3, C].

    Accumulated additively across batches and finalized by
    :func:`finalize_f1` — this reproduces torchmetrics' split-level macro-F1
    accumulation (reference models/analysis.py:890-891) instead of averaging
    per-batch F1 values.
    """
    pred = jnp.argmax(logits, axis=-1)
    w = weight.astype(jnp.float32)
    labels = jnp.clip(labels, 0, num_classes - 1)
    onehot_true = jax.nn.one_hot(labels, num_classes) * w[:, None]
    onehot_pred = jax.nn.one_hot(pred, num_classes) * w[:, None]
    tp = (onehot_true * onehot_pred).sum(0)
    fp = onehot_pred.sum(0) - tp
    fn = onehot_true.sum(0) - tp
    return jnp.stack([tp, fp, fn])


def finalize_f1(stats) -> float:
    """Macro-F1 over classes present in the accumulated labels."""
    import numpy as np

    tp, fp, fn = np.asarray(stats, dtype=np.float64)
    f1 = 2 * tp / np.maximum(2 * tp + fp + fn, 1e-9)
    present = (tp + fn) > 0
    return float(f1[present].mean()) if present.any() else 0.0


def accumulate_weighted(acc: Dict[str, object], batch_metrics: Dict[str, jax.Array]) -> None:
    """Accumulate one batch of step-metric outputs into ``acc``.

    Convention: a key ``X__w`` is the weight (note count) for metric ``X``;
    a key ``X_stats`` is an additively-accumulated statistics array
    (e.g. per-class [tp, fp, fn] for macro-F1). Metrics accumulate as
    ``Σ value·weight`` so a 10-note batch no longer counts as much as a
    10,000-note one (fixes the batch-mean bias the reference's torchmetrics
    never had).
    """
    import numpy as np

    host = {k: np.asarray(v) for k, v in batch_metrics.items()}
    for k, v in host.items():
        if k.endswith("__w"):
            continue
        if k.endswith("_stats"):
            acc[k] = acc.get(k, 0.0) + v.astype(np.float64)
            continue
        w = float(host.get(k + "__w", 1.0))
        num, den = acc.get(k, (0.0, 0.0))
        acc[k] = (num + float(v) * w, den + w)


def finalize_weighted(acc: Dict[str, object]) -> Dict[str, float]:
    out: Dict[str, float] = {}
    for k, v in acc.items():
        if k.endswith("_stats"):
            out[k[: -len("_stats")]] = finalize_f1(v)
        else:
            num, den = v
            out[k] = num / den if den > 0 else 0.0
    return out


def cantor_pair(a: jax.Array, b: jax.Array) -> jax.Array:
    """(a + b)(a + b + 1)/2 + b — the onset/graph dedup key the reference uses
    (models/analysis.py:36-41, :1246)."""
    s = a + b
    return s * (s + 1) // 2 + b


def onset_aggregate_softmax(
    probs: jax.Array,
    onset_edge_index: jax.Array,
    num_nodes: int,
) -> jax.Array:
    """scatter-mean softmax probs over onset edges then renormalize
    (reference :1237-1239: ``scatter_mean(v[src], dst, out=v).softmax(-1)``)."""
    from analysisgnn_tpu.kernels.segment_ops import segment_mean_with_base

    src, dst = onset_edge_index[0], onset_edge_index[1]
    msgs = probs[jnp.minimum(src, num_nodes - 1)]
    pooled = segment_mean_with_base(msgs, dst, base=probs)
    return jax.nn.softmax(pooled, axis=-1)


def onsetwise_rna_accuracy(
    logits_dict: Dict[str, jax.Array],
    labels_dict: Dict[str, jax.Array],
    onset_edge_index: jax.Array,
    onset_div: jax.Array,
    batch_ids: jax.Array,
    weight: jax.Array,
    rna_keys: Tuple[str, ...] = RNA_KEYS,
    with_weight: bool = False,
) -> jax.Array:
    """Composite RNA accuracy: all of quality∧inversion∧degree1∧degree2
    correct, evaluated once per unique (graph, onset) pair.

    Static-shape realization of reference test_step :1226-1264: instead of
    ``torch.unique`` + permutation gymnastics, each (graph, onset) group's
    *first* row (in node order) is selected with a one-per-group mask.
    """
    n = weight.shape[0]
    probs = {
        k: onset_aggregate_softmax(jax.nn.softmax(logits_dict[k], -1), onset_edge_index, n)
        for k in rna_keys
    }
    key = cantor_pair(onset_div - onset_div.min(), batch_ids)
    # first-of-group mask: a row whose key differs from every earlier row.
    # Node order groups equal keys contiguously (notes sorted by onset per
    # graph), so "differs from previous row" suffices.
    prev = jnp.roll(key, 1)
    first = (key != prev).at[0].set(True)
    w = (weight & first).astype(jnp.float32)
    ok = jnp.ones(n, bool)
    for k in rna_keys:
        ok = ok & (jnp.argmax(probs[k], -1) == labels_dict[k])
    acc = (ok.astype(jnp.float32) * w).sum() / jnp.maximum(w.sum(), 1.0)
    if with_weight:
        return acc, w.sum()
    return acc


def roc_auc(scores: jax.Array, labels: jax.Array, weight: jax.Array) -> jax.Array:
    """Binary ROC-AUC via the rank-sum (Mann-Whitney) identity, masked —
    the jit-friendly replacement for sklearn's roc_auc_score used by the
    reference VoiceSeparationAUC (analysisgnn/metrics/eval.py:7-23)."""
    w = weight.astype(jnp.float32)
    pos = labels.astype(jnp.float32) * w
    neg = (1.0 - labels.astype(jnp.float32)) * w
    # rank scores (average ranks for ties via double argsort on perturbed keys)
    order = jnp.argsort(scores)
    ranks = jnp.zeros_like(scores).at[order].set(
        jnp.arange(1, scores.shape[0] + 1, dtype=scores.dtype)
    )
    n_pos = pos.sum()
    n_neg = neg.sum()
    rank_sum = (ranks * pos).sum()
    auc = (rank_sum - n_pos * (n_pos + 1) / 2) / jnp.maximum(n_pos * n_neg, 1.0)
    return jnp.where((n_pos > 0) & (n_neg > 0), auc, 0.5)


def linear_assignment_score(
    edge_index: jax.Array,
    scores: jax.Array,
    target_node_mask: jax.Array,
    num_nodes: int,
    threshold: float = 0.3,
) -> jax.Array:
    """Degree-deviation score for link-prediction assignments (reference
    LinearAssignmentScore, analysisgnn/metrics/eval.py:26-43): thresholded
    predictions should form a near-perfect matching on target nodes."""
    pred = (scores > threshold).astype(jnp.float32)
    add_row = jax.ops.segment_sum(pred, edge_index[0], num_segments=num_nodes)
    add_col = jax.ops.segment_sum(pred, edge_index[1], num_segments=num_nodes)
    ones = target_node_mask.astype(jnp.float32)
    score = jnp.sqrt(((ones - add_row) ** 2).sum()) + jnp.sqrt(
        ((ones - add_col) ** 2).sum()
    )
    return score / num_nodes


def nct_rna_accuracy(
    logits_dict: Dict[str, jax.Array],
    labels_dict: Dict[str, jax.Array],
    weight: jax.Array,
    rna_keys: Tuple[str, ...] = NCT_RNA_KEYS,
    with_weight: bool = False,
) -> jax.Array:
    """RNA accuracy over predicted chord-tone notes only (``tpc_in_label``
    argmax as mask; reference :1271-1282)."""
    mask = jnp.argmax(logits_dict["tpc_in_label"], -1).astype(bool)
    w = (weight & mask).astype(jnp.float32)
    ok = jnp.ones(w.shape[0], bool)
    for k in rna_keys:
        ok = ok & (jnp.argmax(logits_dict[k], -1) == labels_dict[k])
    acc = (ok.astype(jnp.float32) * w).sum() / jnp.maximum(w.sum(), 1.0)
    if with_weight:
        return acc, w.sum()
    return acc
