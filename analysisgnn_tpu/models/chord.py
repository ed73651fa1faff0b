"""The chord / Roman-numeral-analysis model family.

TPU-native equivalents of the reference chord stack (analysisgnn/models/
chord.py): ``MultiTaskMLP`` (:357-375), NADE-style autoregressive heads
(:328-354), ``ChordEncoder`` = GNN → onset pooling → BiGRU (:442-503),
``MetricalChordEncoder`` adding beat/measure convs (:506-583),
``HybridChordEncoder`` (:586-602), and the ``PostProcessingMLTModel`` LSTM
smoother over task softmaxes (:751-783).

All modules operate on padded static-shape inputs; onset sequences are
processed with reset-mask GRUs (models/rnn.py) instead of pad/pack.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from analysisgnn_tpu.core.graph import EdgeType, NOTE
from analysisgnn_tpu.models.encoders import HybridGNN, MetricalGNN
from analysisgnn_tpu.models.mlp import HeadMLP
from analysisgnn_tpu.models.pooling import OnsetPooling, onset_group_ids
from analysisgnn_tpu.models.rnn import BiResetGRU, segment_starts


class MultiTaskMLP(nn.Module):
    """Per-task shallow MLP heads over a shared input (reference
    MultiTaskMLP, chord.py:357-375)."""

    hidden: int
    task_dict: Tuple[Tuple[str, int], ...]

    @nn.compact
    def __call__(self, x: jax.Array) -> Dict[str, jax.Array]:
        return {
            task: HeadMLP(self.hidden, n_cls, name=f"head_{task}")(x)
            for task, n_cls in self.task_dict
        }


class NadeClassifierLayer(nn.Module):
    """Autoregressive task head: each task's logits condition on the previous
    task's prediction embedding (reference NadeClf/NadeClassifierLayer,
    chord.py:328-354)."""

    hidden: int
    task_dict: Tuple[Tuple[str, int], ...]

    @nn.compact
    def __call__(self, x: jax.Array) -> Dict[str, jax.Array]:
        out: Dict[str, jax.Array] = {}
        carry = x
        for task, n_cls in self.task_dict:
            logits = nn.Dense(n_cls, name=f"logits_{task}")(carry)
            out[task] = logits
            probs = jax.nn.softmax(logits, axis=-1)
            cond = nn.Dense(self.hidden, name=f"cond_{task}")(probs)
            carry = nn.relu(nn.LayerNorm(name=f"norm_{task}")(carry + cond))
        return out


class ChordEncoder(nn.Module):
    """GNN over the note graph → onset pooling → BiGRU over the onset
    sequence (reference ChordEncoder, chord.py:442-503)."""

    hidden: int
    num_layers: int = 3
    dropout: float = 0.0
    edge_types: Tuple[EdgeType, ...] = ()
    metrical: bool = False

    @nn.compact
    def __call__(
        self,
        x_dict: Dict[str, jax.Array],
        edge_index_dict: Dict[EdgeType, jax.Array],
        batch_dict: Dict[str, jax.Array],
        onset_div: jax.Array,
        weight: jax.Array,
        deterministic: bool = True,
    ) -> Tuple[jax.Array, jax.Array, jax.Array]:
        """Returns (onset_states [N, H], group_valid [N], group_batch [N])."""
        enc_cls = MetricalGNN if self.metrical else HybridGNN
        h = enc_cls(
            hidden=self.hidden,
            num_layers=self.num_layers,
            dropout=self.dropout,
            use_jk=False,
            edge_types=self.edge_types,
            name="gnn",
        )(x_dict, edge_index_dict, batch_dict, deterministic=deterministic)
        pooled, group_valid, group_batch = OnsetPooling(self.hidden, name="pool")(
            h, onset_div, batch_dict[NOTE], weight
        )
        starts = segment_starts(jnp.where(group_valid, group_batch, -1))
        seq = BiResetGRU(self.hidden, name="gru")(pooled, starts)
        seq = nn.Dense(self.hidden, name="proj")(seq)
        return seq, group_valid, group_batch


class OnsetEdgePooling(nn.Module):
    """Onset-clique contraction pooling — the static-shape analog of the
    reference ``OnsetEdgePoolingVersion2`` (chord.py:255-325).

    Reference semantics: mean-aggregate each node with its onset neighbors
    (self-loops included), then greedily keep one representative node per
    onset clique.  Because onset edges form complete cliques, the greedy
    scan's fixed point is "keep the minimum-id node of each clique" — here
    computed in one ``segment_min`` instead of a Python loop, and expressed
    as a [N] keep-mask rather than a dynamic trim (shapes stay static).
    """

    hidden: int
    dropout: float = 0.0

    @nn.compact
    def __call__(
        self,
        x: jax.Array,  # [N, F]
        onset_edge_index: jax.Array,  # [2, E] same-onset clique edges
        keep: Optional[jax.Array] = None,  # precomputed keep mask
        deterministic: bool = True,
    ) -> Tuple[jax.Array, jax.Array]:
        from analysisgnn_tpu.kernels.segment_ops import (
            segment_count,
            segment_min,
            segment_sum,
        )

        n = x.shape[0]
        src, dst = onset_edge_index[0], onset_edge_index[1]
        t = nn.Dense(self.hidden, name="trans")(x)
        # mean over onset neighbors + self (reference scatter(..., 'mean')
        # over edge_index ++ self-loops, chord.py:286-288)
        agg = segment_sum(t[jnp.minimum(src, n - 1)], dst, n) + t
        deg = segment_count(dst, n) + 1.0
        h = agg / deg[:, None]
        if keep is None:
            ids = jnp.arange(n)
            rep = jnp.minimum(
                segment_min(jnp.minimum(src, n - 1), dst, n), ids
            )
            keep = rep == ids
        return h, keep


class SpellingAwareChordEncoder(nn.Module):
    """Reference-style chord encoder head: pitch + spelling embeddings →
    GNN → onset-edge pooling → two projections → BiGRU over the pooled
    onset sequence (reference ChordEncoder/MetricalChordEncoder forward,
    chord.py:479-503, 560-583).

    ``metrical=True`` interleaves beat/measure aggregation (the
    MetricalChordEncoder variant); ``metrical=False`` is the plain variant.
    """

    hidden: int
    num_layers: int = 3
    dropout: float = 0.0
    edge_types: Tuple[EdgeType, ...] = ()
    metrical: bool = False

    @nn.compact
    def __call__(
        self,
        x_dict: Dict[str, jax.Array],
        edge_index_dict: Dict[EdgeType, jax.Array],
        batch_dict: Dict[str, jax.Array],
        pitch: jax.Array,  # [N] midi pitch ids
        spelling: jax.Array,  # [N] pitch-spelling class ids
        onset_edge_index: jax.Array,
        deterministic: bool = True,
    ) -> Tuple[jax.Array, jax.Array]:
        from analysisgnn_tpu.models.encoders import l2_normalize

        h_pitch = nn.Embed(128, 16, name="pitch_embedding")(pitch)
        h_spell = nn.Embed(49, 16, name="spelling_embedding")(spelling)
        h0 = nn.Dense(32, name="embedding")(x_dict[NOTE])
        h = jnp.concatenate([h0, h_pitch, h_spell], axis=-1)
        enc_cls = MetricalGNN if self.metrical else HybridGNN
        h = enc_cls(
            hidden=self.hidden,
            num_layers=self.num_layers,
            dropout=self.dropout,
            use_jk=False,
            edge_types=self.edge_types,
            name="gnn",
        )({**x_dict, NOTE: h}, edge_index_dict, batch_dict, deterministic)
        h = l2_normalize(nn.relu(h))
        h, keep = OnsetEdgePooling(self.hidden, self.dropout, name="pool")(
            h, onset_edge_index, deterministic=deterministic
        )
        h = nn.relu(nn.Dense(self.hidden, name="proj1")(h))
        h = nn.LayerNorm(name="norm1")(h)
        h = nn.relu(nn.Dense(self.hidden // 2, name="proj2")(h))
        h = nn.LayerNorm(name="norm2")(h)
        # BiGRU over kept onset representatives: mask dropped rows from the
        # recurrence by treating them as zero inputs (static shape)
        starts = segment_starts(jnp.where(keep, batch_dict[NOTE], -1))
        seq = BiResetGRU(self.hidden // 2, name="gru")(
            jnp.where(keep[:, None], h, 0.0), starts
        )
        seq = nn.LayerNorm(name="normgru")(seq)
        return seq, keep


class HybridChordEncoder(nn.Module):
    """Spelling-embedding + per-node-type input maps + HybridGNN
    (reference HybridChordEncoder, chord.py:586-602)."""

    hidden: int
    num_layers: int = 3
    dropout: float = 0.0
    edge_types: Tuple[EdgeType, ...] = ()
    node_types: Tuple[str, ...] = (NOTE,)
    spelling_dim: int = 49

    @nn.compact
    def __call__(
        self,
        pitch_spelling: jax.Array,
        x_dict: Dict[str, jax.Array],
        edge_index_dict: Dict[EdgeType, jax.Array],
        batch_dict: Dict[str, jax.Array],
        deterministic: bool = True,
    ) -> jax.Array:
        h_spell = nn.Embed(self.spelling_dim, 128, name="spelling_embedding")(
            pitch_spelling
        )
        mapped = {}
        for t in self.node_types:
            if t not in x_dict:
                continue
            v = x_dict[t]
            if t == NOTE:
                v = jnp.concatenate([v, h_spell], axis=-1)
            mapped[t] = nn.Dense(128, name=f"x_map_{t}")(v)
        return HybridGNN(
            hidden=self.hidden,
            num_layers=self.num_layers,
            dropout=self.dropout,
            use_jk=False,
            edge_types=self.edge_types,
            name="gnn",
        )(mapped, edge_index_dict, batch_dict, deterministic)


class ChordPredictionModel(nn.Module):
    """Full RNA prediction model: encoder + multi-task (or NADE) heads
    (reference ChordPrediction family, chord.py:605-748)."""

    hidden: int
    task_dict: Tuple[Tuple[str, int], ...]
    num_layers: int = 3
    dropout: float = 0.0
    edge_types: Tuple[EdgeType, ...] = ()
    metrical: bool = False
    use_nade: bool = False

    @nn.compact
    def __call__(
        self,
        x_dict,
        edge_index_dict,
        batch_dict,
        onset_div,
        weight,
        deterministic: bool = True,
    ) -> Tuple[Dict[str, jax.Array], jax.Array]:
        seq, group_valid, _ = ChordEncoder(
            hidden=self.hidden,
            num_layers=self.num_layers,
            dropout=self.dropout,
            edge_types=self.edge_types,
            metrical=self.metrical,
            name="encoder",
        )(x_dict, edge_index_dict, batch_dict, onset_div, weight, deterministic)
        heads = (
            NadeClassifierLayer(self.hidden, self.task_dict, name="nade")
            if self.use_nade
            else MultiTaskMLP(self.hidden, self.task_dict, name="mlp")
        )
        return heads(seq), group_valid


class PostProcessingMLT(nn.Module):
    """BiLSTM-style smoother over concatenated task softmaxes on the onset
    grid (reference PostProcessingMLTModel, chord.py:751-783)."""

    hidden: int
    task_dict: Tuple[Tuple[str, int], ...]

    @nn.compact
    def __call__(
        self, probs_dict: Dict[str, jax.Array], starts: jax.Array
    ) -> Dict[str, jax.Array]:
        x = jnp.concatenate([probs_dict[t] for t, _ in self.task_dict], axis=-1)
        h = BiResetGRU(self.hidden, name="smoother")(x, starts)
        return {
            task: nn.Dense(n_cls, name=f"out_{task}")(h)
            for task, n_cls in self.task_dict
        }


def romnum_accuracy(
    logits_dict: Dict[str, jax.Array],
    labels_dict: Dict[str, jax.Array],
    weight: jax.Array,
    keys: Sequence[str] = ("degree1", "degree2", "quality", "root", "inversion", "localkey"),
) -> jax.Array:
    """Composite Roman-numeral accuracy — ALL of degree∧quality∧root∧
    inversion∧key correct (reference chord.py:872-880)."""
    ok = jnp.ones(weight.shape[0], bool)
    for k in keys:
        if k in logits_dict and k in labels_dict:
            ok = ok & (jnp.argmax(logits_dict[k], -1) == labels_dict[k])
    w = weight.astype(jnp.float32)
    return (ok.astype(jnp.float32) * w).sum() / jnp.maximum(w.sum(), 1.0)


def chord_symbol_recall(
    logits_dict: Dict[str, jax.Array],
    labels_dict: Dict[str, jax.Array],
    durations: jax.Array,
    weight: jax.Array,
    keys: Sequence[str] = ("degree1", "degree2", "quality", "root", "inversion", "localkey"),
) -> jax.Array:
    """Time-weighted chord symbol recall (CSR): fraction of musical time with
    a fully-correct chord symbol (reference time-step CSR, chord.py:967-986)."""
    ok = jnp.ones(weight.shape[0], bool)
    for k in keys:
        if k in logits_dict and k in labels_dict:
            ok = ok & (jnp.argmax(logits_dict[k], -1) == labels_dict[k])
    w = weight.astype(jnp.float32) * durations.astype(jnp.float32)
    return (ok.astype(jnp.float32) * w).sum() / jnp.maximum(w.sum(), 1.0)
