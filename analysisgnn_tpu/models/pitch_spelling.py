"""Pitch-spelling model family.

TPU-native equivalents of the reference pitch-spelling stack
(analysisgnn/models/pitch_spelling.py): the RNN-based ``PKSpell`` baseline
(Foscarin et al., ISMIR 2021; reference :50-151) and the graph-based
``PitchSpellingGNN`` (MetricalGNN encoder + pitch-class head whose
prediction conditions the key-signature head, :155-260).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from analysisgnn_tpu.core.graph import EdgeType, NOTE
from analysisgnn_tpu.models.encoders import MetricalGNN
from analysisgnn_tpu.models.mlp import ProjectionMLP
from analysisgnn_tpu.models.rnn import BiResetGRU, segment_starts

PITCH_CLASSES = 35
KS_CLASSES = 15


class PKSpell(nn.Module):
    """Sequence-only pitch-spelling: BiGRU over the note sequence → pitch
    head; second BiGRU over [features ‖ pitch probs] → key-signature head."""

    hidden: int
    out_pitch: int = PITCH_CLASSES
    out_ks: int = KS_CLASSES
    dropout: float = 0.0

    @nn.compact
    def __call__(
        self,
        x: jax.Array,  # [N, F] note features in sequence order
        batch_ids: jax.Array,  # [N] graph ids
        deterministic: bool = True,
    ) -> Tuple[jax.Array, jax.Array]:
        starts = segment_starts(batch_ids)
        h = BiResetGRU(self.hidden // 2, name="rnn1")(x, starts)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        pitch_logits = nn.Dense(self.out_pitch, name="pitch_head")(h)
        z = jnp.concatenate([h, jax.nn.softmax(pitch_logits, -1)], axis=-1)
        h2 = BiResetGRU(self.hidden // 2, name="rnn2")(z, starts)
        ks_logits = nn.Dense(self.out_ks, name="ks_head")(h2)
        return pitch_logits, ks_logits


class PitchSpellingGNN(nn.Module):
    """Metrical GNN encoder; the pitch-class prediction feeds the
    key-signature head (reference :155-260)."""

    hidden: int
    out_enc: int
    num_layers: int = 3
    dropout: float = 0.0
    edge_types: Tuple[EdgeType, ...] = ()
    add_seq: bool = False

    @nn.compact
    def __call__(
        self,
        x_dict: Dict[str, jax.Array],
        edge_index_dict: Dict[EdgeType, jax.Array],
        batch_dict: Dict[str, jax.Array],
        deterministic: bool = True,
    ) -> Tuple[jax.Array, jax.Array]:
        z = MetricalGNN(
            hidden=self.hidden,
            num_layers=self.num_layers,
            dropout=self.dropout,
            use_jk=False,
            edge_types=self.edge_types,
            name="encoder",
        )(x_dict, edge_index_dict, batch_dict, deterministic=deterministic)
        z = nn.Dense(self.out_enc, name="enc_proj")(z)
        z = nn.LayerNorm(name="enc_norm")(z)
        if self.add_seq:
            starts = segment_starts(batch_dict[NOTE])
            r = BiResetGRU(self.hidden // 2, name="rnn")(x_dict[NOTE], starts)
            r = nn.LayerNorm(name="rnn_norm")(r)
            r = nn.Dense(self.out_enc, name="rnn_proj")(r)
            z = nn.Dense(self.out_enc, name="cat_lin")(
                jnp.concatenate([z, r], axis=-1)
            )
        pc_logits = ProjectionMLP(
            self.out_enc // 2, PITCH_CLASSES, self.dropout, name="mlp_pc"
        )(z, deterministic=deterministic)
        zk = jnp.concatenate([z, jax.nn.softmax(pc_logits, -1)], axis=-1)
        if self.add_seq:
            starts = segment_starts(batch_dict[NOTE])
            rk = BiResetGRU(self.hidden // 2, name="rnn_ks")(zk, starts)
            rk = nn.LayerNorm(name="rnn_norm_ks")(rk)
            zk = nn.Dense(zk.shape[-1], name="rnn_project_ks")(rk)
        ks_logits = ProjectionMLP(
            self.out_enc // 2, KS_CLASSES, self.dropout, name="mlp_ks"
        )(zk, deterministic=deterministic)
        return pc_logits, ks_logits


class PitchSpellingNeighborGNN(nn.Module):
    """Neighbor-sampled variant: HierarchicalHeteroSage encoder → norm →
    pitch-class head conditioning the key-signature head (reference
    ``PitchSpellingNeighborGNN``, pitch_spelling.py:239-266; LayerNorm in
    place of BatchNorm1d — batch statistics are ill-defined under padded
    static-shape batches)."""

    hidden: int
    out_enc: int
    num_layers: int = 2
    dropout: float = 0.0
    edge_types: Tuple[EdgeType, ...] = ()

    @nn.compact
    def __call__(
        self,
        x_dict: Dict[str, jax.Array],
        edge_index_dict: Dict[EdgeType, jax.Array],
        deterministic: bool = True,
    ) -> Tuple[jax.Array, jax.Array]:
        from analysisgnn_tpu.models.cadence import HierarchicalHeteroSage

        z = HierarchicalHeteroSage(
            self.hidden, self.out_enc, self.num_layers,
            edge_types=self.edge_types, name="encoder",
        )(x_dict, edge_index_dict)
        z = nn.LayerNorm(name="norm")(z)
        pc_logits = ProjectionMLP(
            self.out_enc // 2, PITCH_CLASSES, self.dropout, name="mlp_pc"
        )(z, deterministic=deterministic)
        zk = jnp.concatenate([z, jax.nn.softmax(pc_logits, -1)], axis=-1)
        ks_logits = ProjectionMLP(
            self.out_enc // 2, KS_CLASSES, self.dropout, name="mlp_ks"
        )(zk, deterministic=deterministic)
        return pc_logits, ks_logits
