"""SMOTE minority oversampling in embedding space (jit-friendly).

Re-design of the reference SMOTE (analysisgnn/models/cadence.py:13-118, used
at models/analysis.py:1023-1029): kNN in embedding space per minority class,
synthetic points interpolated toward random neighbors.  The torch version
grows tensors dynamically per class; the static-shape version emits a FIXED
number of synthetic rows (``num_synthetic``) with a validity mask, sampling
minority classes proportionally to their deficit vs the dominant class —
identical distributional intent, jit-stable shapes.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def smote_oversample(
    x: jax.Array,  # [N, D] embeddings
    y: jax.Array,  # [N] int labels
    weight: jax.Array,  # [N] bool validity
    rng: jax.Array,
    num_classes: int,
    num_synthetic: int,
    k: int = 3,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Returns (x_syn [S, D], y_syn [S], w_syn [S]).

    Each synthetic point: pick a class c with probability ∝ its deficit
    (count of dominant class − count of c), pick a random member i of c and
    one of its k nearest same-class neighbours j, emit x_i + u·(x_j − x_i).
    Classes with fewer than k valid members get zero probability (reference
    guard, cadence.py:107-109).
    """
    n, d = x.shape
    w = weight.astype(jnp.float32)
    counts = jax.ops.segment_sum(w, jnp.clip(y, 0, num_classes - 1), num_classes)
    dominant = counts.max()
    deficit = jnp.where(counts >= k, dominant - counts, 0.0)
    total = deficit.sum()
    probs = jnp.where(total > 0, deficit / jnp.maximum(total, 1e-9), 0.0)

    rng_c, rng_i, rng_j, rng_u = jax.random.split(rng, 4)
    classes = jax.random.categorical(
        rng_c, jnp.log(jnp.maximum(probs, 1e-30)), shape=(num_synthetic,)
    )

    # member selection: logits -inf outside (class, valid)
    onehot = (y[None, :] == classes[:, None]) & weight[None, :]  # [S, N]
    logits_i = jnp.where(onehot, 0.0, -jnp.inf)
    idx_i = jax.random.categorical(rng_i, logits_i, axis=-1)  # [S]

    # kNN among same class: squared euclidean distances
    xi = x[idx_i]  # [S, D]
    d2 = jnp.sum((xi[:, None, :] - x[None, :, :]) ** 2, axis=-1)  # [S, N]
    d2 = jnp.where(onehot, d2, jnp.inf)
    d2 = d2.at[jnp.arange(num_synthetic), idx_i].set(jnp.inf)  # exclude self
    _, nbr_idx = jax.lax.top_k(-d2, k)  # [S, k]
    pick = jax.random.randint(rng_j, (num_synthetic,), 0, k)
    idx_j = nbr_idx[jnp.arange(num_synthetic), pick]

    u = jax.random.uniform(rng_u, (num_synthetic, d))
    x_syn = xi + u * (x[idx_j] - xi)
    w_syn = (total > 0) & jnp.isfinite(d2[jnp.arange(num_synthetic), idx_j])
    return x_syn, classes, w_syn


def smote_feature_penalty(
    x_syn: jax.Array,
    w_syn: jax.Array,
    x: jax.Array,
    y: jax.Array,
    y_syn: jax.Array,
    weight: jax.Array,
    threshold: float = 1.0,
) -> jax.Array:
    """Penalize synthetic points far from real same-class points (reference
    update_feature_loss, models/analysis.py:1412-1438) — masked min-distance
    clamp."""
    d2 = jnp.sum((x_syn[:, None, :] - x[None, :, :]) ** 2, axis=-1)
    same = (y_syn[:, None] == y[None, :]) & weight[None, :]
    d2 = jnp.where(same, d2, jnp.inf)
    min_d = jnp.sqrt(jnp.maximum(d2.min(axis=-1), 0.0))
    pen = jnp.maximum(min_d - threshold, 0.0)
    wm = w_syn.astype(jnp.float32) * jnp.isfinite(min_d)
    return (jnp.where(jnp.isfinite(min_d), pen, 0.0) * wm).sum() / jnp.maximum(
        wm.sum(), 1.0
    )
