"""Sequence cells over padded node sequences with graph-boundary resets.

The reference packs per-graph note/beat sequences into torch padded batches
for GRU/LSTM processing (models/analysis.py:527-537, models/core/gnn.py:
506-539).  The TPU-native formulation runs ONE ``lax.scan`` over the whole
padded node axis and multiplies the carried state by a per-step *reset mask*
(0 at the first node of each graph) — identical math, no ragged splitting, no
recompile per batch composition.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


class _ResetGRUCell(nn.Module):
    """GRU cell that zeroes its carry wherever ``reset`` is set."""

    features: int

    @nn.compact
    def __call__(self, carry, inputs):
        x, reset = inputs
        carry = jnp.where(reset, jnp.zeros_like(carry), carry)
        return nn.GRUCell(features=self.features)(carry, x)


class ResetGRU(nn.Module):
    """Unidirectional GRU with state resets at sequence starts.

    ``xs``: [T, F]; ``starts``: [T] bool, True at the first step of each
    segment.  With ``reverse`` the scan runs right-to-left and resets at
    segment *ends* (the step before the next start).
    """

    features: int
    reverse: bool = False

    @nn.compact
    def __call__(self, xs: jax.Array, starts: jax.Array) -> jax.Array:
        if self.reverse:
            resets = jnp.roll(starts, -1).at[-1].set(True)
            xs, resets = xs[::-1], resets[::-1]
        else:
            resets = starts
        scan = nn.scan(
            _ResetGRUCell,
            variable_broadcast="params",
            split_rngs={"params": False},
            in_axes=0,
            out_axes=0,
        )
        h0 = jnp.zeros((self.features,), xs.dtype)
        _, ys = scan(features=self.features, name="cell")(h0, (xs, resets))
        return ys[::-1] if self.reverse else ys


class BiResetGRU(nn.Module):
    """Bidirectional reset-GRU; concatenates both directions ([T, 2F])."""

    features: int

    @nn.compact
    def __call__(self, xs: jax.Array, starts: jax.Array) -> jax.Array:
        fwd = ResetGRU(self.features, reverse=False)(xs, starts)
        bwd = ResetGRU(self.features, reverse=True)(xs, starts)
        return jnp.concatenate([fwd, bwd], axis=-1)


class AssocResetGRU(nn.Module):
    """Gated linear recurrence with segment resets, parallelized via
    ``jax.lax.associative_scan`` (O(log T) depth instead of T sequential
    steps).

    h_t = (1 − z_t)·h_{t−1} + z_t·h̃_t, with update gate z_t and candidate
    h̃_t computed from the input only (a "light GRU" / LRU-style recurrence).
    The recurrence is affine in h, so prefix products evaluate exactly with
    an associative scan — the TPU-idiomatic replacement for the reference's
    sequential ``nn.GRU`` over ~2k beat/measure steps (the round-1
    MetricalGNN bottleneck; docs/STATUS.md per-encoder table).  Resets zero
    the carry at segment starts by forcing a_t = 0 there.
    """

    features: int
    reverse: bool = False

    @nn.compact
    def __call__(self, xs: jax.Array, starts: jax.Array) -> jax.Array:
        if self.reverse:
            resets = jnp.roll(starts, -1).at[-1].set(True)
            xs, resets = xs[::-1], resets[::-1]
        else:
            resets = starts
        zc = nn.Dense(2 * self.features, name="gates")(xs)
        z = jax.nn.sigmoid(zc[..., : self.features])
        cand = jnp.tanh(zc[..., self.features :])
        keep = (1.0 - z) * (1.0 - resets[:, None].astype(xs.dtype))
        b = z * cand

        def combine(left, right):
            a1, b1 = left
            a2, b2 = right
            return a1 * a2, a2 * b1 + b2

        _, h = jax.lax.associative_scan(combine, (keep, b))
        return h[::-1] if self.reverse else h


class AssocBiGRU(nn.Module):
    """Bidirectional associative-scan GRU ([T, 2F])."""

    features: int

    @nn.compact
    def __call__(self, xs: jax.Array, starts: jax.Array) -> jax.Array:
        fwd = AssocResetGRU(self.features, reverse=False)(xs, starts)
        bwd = AssocResetGRU(self.features, reverse=True)(xs, starts)
        return jnp.concatenate([fwd, bwd], axis=-1)


class StackedBiGRU(nn.Module):
    """N-layer bidirectional GRU projecting back to ``features`` per layer —
    the analog of ``nn.GRU(..., num_layers, bidirectional=True)``
    (reference models/analysis.py:513)."""

    features: int
    num_layers: int = 2

    @nn.compact
    def __call__(self, xs: jax.Array, starts: jax.Array) -> jax.Array:
        h = xs
        for i in range(self.num_layers):
            h = BiResetGRU(self.features, name=f"layer_{i}")(h, starts)
            if i < self.num_layers - 1:
                h = nn.Dense(self.features, name=f"proj_{i}")(h)
        return h


class LayerAttentionJK(nn.Module):
    """Jumping-Knowledge combiner: BiLSTM over the layer axis + attention
    (reference models/core/gnn.py:345-365).

    Input: list of L per-layer states, each [N, F].  The LSTM runs over the
    (static, small) layer axis via vmap across nodes.
    """

    hidden: int

    @nn.compact
    def __call__(self, layer_states) -> jax.Array:
        x = jnp.stack(layer_states, axis=1)  # [N, L, F]
        n_layers = x.shape[1]
        lstm_feats = max((n_layers * self.hidden) // 2, 1)
        fwd_cell = nn.OptimizedLSTMCell(features=lstm_feats)
        bwd_cell = nn.OptimizedLSTMCell(features=lstm_feats)

        def run(cell, seq):
            carry = cell.initialize_carry(jax.random.PRNGKey(0), seq[:, 0].shape)
            ys = []
            for t in range(n_layers):
                carry, y = cell(carry, seq[:, t])
                ys.append(y)
            return jnp.stack(ys, axis=1)

        fwd = run(fwd_cell, x)
        bwd = run(bwd_cell, x[:, ::-1])[:, ::-1]
        alpha = nn.Dense(1)(jnp.concatenate([fwd, bwd], axis=-1))[..., 0]  # [N, L]
        alpha = jax.nn.softmax(alpha, axis=-1)
        return jnp.sum(x * alpha[..., None], axis=1)


def segment_starts(batch_ids: jax.Array) -> jax.Array:
    """[T] bool — True where a new segment (graph) begins, padding included."""
    prev = jnp.roll(batch_ids, 1)
    starts = batch_ids != prev
    return starts.at[0].set(True)
