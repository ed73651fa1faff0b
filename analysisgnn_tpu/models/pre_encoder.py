"""Pre-training encoder: staff/voice link prediction + fifths/spelling heads.

TPU-native equivalent of the reference ``PreEncoder`` (analysisgnn/models/
analysis.py:360-407) and its Lightning wrapper ``PreEncoderPL`` (:659-781):
an HGT encoder whose note embeddings drive (a) dot-product link logits over
candidate staff/voice edges and (b) key-signature (15) and pitch-spelling
(35) classification heads.  ``isin_pairwise`` edge labeling via Cantor
pairing (:23-41) is provided as a jit-friendly function.
"""

from __future__ import annotations

from typing import Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from analysisgnn_tpu.core.graph import EdgeType
from analysisgnn_tpu.models.encoders import HybridHGT
from analysisgnn_tpu.train.metrics import cantor_pair

PITCH_SPELLING_CLASSES = 35
FIFTHS_CLASSES = 15


def isin_pairwise(
    element: jax.Array, test_elements: jax.Array, element_valid: jax.Array,
    test_valid: jax.Array,
) -> jax.Array:
    """For each column pair in ``element`` [2, N], is it present in
    ``test_elements`` [2, M]?  Cantor-projected membership (reference
    isin_pairwise, models/analysis.py:23-41) with validity masks replacing
    dynamic slicing."""
    e = cantor_pair(element[0], element[1])
    t = cantor_pair(test_elements[0], test_elements[1])
    t = jnp.where(test_valid, t, -1)
    hits = (e[:, None] == t[None, :]).any(axis=1)
    return hits & element_valid


class _EmbedHead(nn.Module):
    out: int

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(x.shape[-1])(x)
        x = nn.relu(x)
        x = nn.LayerNorm()(x)
        return nn.Dense(self.out)(x)


class PreEncoder(nn.Module):
    """HGT encoder + staff/voice link scorers + fifths/spelling heads."""

    hidden: int
    num_layers: int = 3
    heads: int = 4
    dropout: float = 0.0
    edge_types: Tuple[EdgeType, ...] = ()

    @nn.compact
    def __call__(
        self,
        x_dict,
        edge_index_dict,
        batch_dict,
        staff_candidate_edges: jax.Array,
        voice_candidate_edges: jax.Array,
        deterministic: bool = True,
        return_embedding: bool = False,
    ):
        x = HybridHGT(
            hidden=self.hidden,
            num_layers=self.num_layers,
            heads=self.heads,
            dropout=self.dropout,
            use_jk=True,
            edge_types=self.edge_types,
            name="encoder",
        )(x_dict, edge_index_dict, batch_dict, deterministic=deterministic)
        staff_x = _EmbedHead(self.hidden, name="staff_clf")(x)
        voice_x = _EmbedHead(self.hidden, name="voice_clf")(x)
        n = x.shape[0]

        def link_logits(h, edges):
            a = h[jnp.minimum(edges[0], n - 1)]
            b = h[jnp.minimum(edges[1], n - 1)]
            return jnp.sum(a * b, axis=-1)

        staff_logits = link_logits(staff_x, staff_candidate_edges)
        voice_logits = link_logits(voice_x, voice_candidate_edges)
        fifths_logits = _EmbedHead(FIFTHS_CLASSES, name="fifths_clf")(x)
        spelling_logits = _EmbedHead(PITCH_SPELLING_CLASSES, name="spelling_clf")(x)
        if return_embedding:
            return staff_logits, voice_logits, fifths_logits, spelling_logits, x
        return staff_logits, voice_logits, fifths_logits, spelling_logits


def derive_truth_edges(
    consecutive_edges: jax.Array,
    onset_edges: jax.Array,
    voice: jax.Array,
    staff: jax.Array,
    num_nodes_cap: int,
) -> Tuple[jax.Array, jax.Array]:
    """(voice_true, staff_true) edges from per-note voice/staff attributes —
    the datamodule's ``transform_graph`` (reference data/datamodules/
    analysis.py:135-149) as static masking: non-matching edges are rewritten
    to one-past-the-end."""
    n = num_nodes_cap

    def mask_edges(edges, keep):
        fill = jnp.int32(n)
        return jnp.stack(
            [jnp.where(keep, edges[0], fill), jnp.where(keep, edges[1], fill)]
        )

    def attr_eq(attr, edges):
        a = attr[jnp.minimum(edges[0], attr.shape[0] - 1)]
        b = attr[jnp.minimum(edges[1], attr.shape[0] - 1)]
        return a == b

    voice_keep = attr_eq(voice, consecutive_edges) & attr_eq(staff, consecutive_edges)
    staff_keep_c = attr_eq(staff, consecutive_edges)
    staff_keep_o = attr_eq(staff, onset_edges)
    voice_true = mask_edges(consecutive_edges, voice_keep)
    staff_true = jnp.concatenate(
        [mask_edges(consecutive_edges, staff_keep_c), mask_edges(onset_edges, staff_keep_o)],
        axis=1,
    )
    return voice_true, staff_true
