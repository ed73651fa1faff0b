"""Shared MLP building blocks (flax.linen).

The reference composes most of its heads/projections from the pattern
Linear → ReLU → LayerNorm → [Dropout] → Linear
(e.g. analysisgnn/models/analysis.py:429-496); these modules capture that
shape once.
"""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax


class PlainProjection(nn.Module):
    """Single-Dense projection — the measured-stable default at the
    reference recipe (lr=5e-3, dropout=0.3).  The reference's deeper
    projection stacks (:429-443, :474-485) remain available as
    ``ProjectionMLP``/``EncoderProjection`` via ``--deep_proj``; on the
    parity corpus they collapse most heads at the reference lr
    (RESULTS.md recipe notes) while this projection tracks the torch
    anchor's trajectory."""

    hidden: int
    out: int
    dropout: float = 0.0  # accepted for interface parity; unused

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        return nn.Dense(self.hidden if self.out is None else self.out)(x)


class ProjectionMLP(nn.Module):
    """Linear → ReLU → LayerNorm → Dropout → Linear (reference :429-443)."""

    hidden: int
    out: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        x = nn.Dense(self.hidden)(x)
        x = nn.relu(x)
        x = nn.LayerNorm()(x)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        return nn.Dense(self.hidden if self.out is None else self.out)(x)


class HeadMLP(nn.Module):
    """Linear → ReLU → LayerNorm → Linear (task heads, reference :486-496)."""

    hidden: int
    out: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = nn.Dense(self.hidden)(x)
        x = nn.relu(x)
        x = nn.LayerNorm()(x)
        return nn.Dense(self.out)(x)


class EncoderProjection(nn.Module):
    """The deep post-encoder projection (reference ``project_enc``, :474-485):
    LN → Linear → ReLU → LN → Dropout → Linear → ReLU → LN → Dropout → Linear.
    """

    hidden: int
    out: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        x = nn.LayerNorm()(x)
        x = nn.Dense(self.hidden)(x)
        x = nn.relu(x)
        x = nn.LayerNorm()(x)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        x = nn.Dense(self.out)(x)
        x = nn.relu(x)
        x = nn.LayerNorm()(x)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        return nn.Dense(self.out)(x)
