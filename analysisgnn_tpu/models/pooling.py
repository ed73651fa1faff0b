"""Onset pooling and onset dedup utilities.

Reference: the scatter-based ``OnsetEdgePoolingVersion2`` (analysisgnn/
models/chord.py:255-325) contracts each onset group of notes to one node;
``unique_onsets`` (chord.py:1692-1702) finds the representative rows.  The
static-shape formulation keeps array sizes fixed: the pooled sequence lives
in the same [N]-shaped buffers with a validity mask selecting one
representative per (graph, onset) group.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from analysisgnn_tpu.kernels.segment_ops import segment_mean_with_base, segment_sum
from analysisgnn_tpu.train.metrics import cantor_pair


def onset_group_ids(onset_div: jax.Array, batch_ids: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """(group_first_mask, group_index) per note, notes ordered by
    (graph, onset).  ``group_index`` numbers the (graph, onset) groups
    0..G-1 in order; the first note of each group is the representative."""
    key = cantor_pair(onset_div - onset_div.min(), batch_ids)
    prev = jnp.roll(key, 1)
    first = (key != prev).at[0].set(True)
    gid = jnp.cumsum(first.astype(jnp.int32)) - 1
    return first, gid


class OnsetPooling(nn.Module):
    """Mean-pool note states per (graph, onset) group onto group slots.

    Functional analog of OnsetEdgePoolingVersion2: the per-group transform is
    a Dense over the mean of member states; output is [N, F] where row g of
    the first G rows holds group g's pooled state (extra rows zero)."""

    features: int

    @nn.compact
    def __call__(
        self, x: jax.Array, onset_div: jax.Array, batch_ids: jax.Array,
        weight: jax.Array,
    ) -> Tuple[jax.Array, jax.Array, jax.Array]:
        n = x.shape[0]
        first, gid = onset_group_ids(onset_div, batch_ids)
        gid = jnp.where(weight, gid, n)  # masked rows drop
        total = segment_sum(x, gid, n)
        count = segment_sum(jnp.ones((n, 1), x.dtype), gid, n)
        pooled = total / jnp.maximum(count, 1.0)
        pooled = nn.Dense(self.features)(pooled)
        group_valid = (count[:, 0] > 0)
        group_batch = segment_sum(
            jnp.where(weight, batch_ids, 0)[:, None].astype(jnp.float32), gid, n
        )[:, 0] / jnp.maximum(count[:, 0], 1.0)
        return pooled, group_valid, group_batch.astype(jnp.int32)


def unique_onset_mask(onset_div: jax.Array, batch_ids: jax.Array, weight: jax.Array) -> jax.Array:
    """Boolean mask selecting one representative note per (graph, onset)
    among valid rows (reference unique_onsets, chord.py:1692-1702)."""
    first, _ = onset_group_ids(onset_div, batch_ids)
    return first & weight
