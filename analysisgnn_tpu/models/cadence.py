"""The cadence-detection model family.

TPU-native equivalents of the reference cadence stack (analysisgnn/models/
cadence.py): ``CadenceGNNPytorch`` = MetricalGNN + optional hybrid GRU +
onset pooling (:229-344) and the neighbor-sampled hetero-SAGE variant
``CadenceGNNNeighbor``/``HierarchicalHeteroGraphSage`` (:142-227).  The SMOTE
embedding-space oversampling used by the training wrappers lives in
analysisgnn_tpu/train/smote.py.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from analysisgnn_tpu.core.graph import EdgeType, NOTE
from analysisgnn_tpu.kernels.segment_ops import segment_mean_with_base
from analysisgnn_tpu.models.encoders import HybridGNN, MetricalGNN
from analysisgnn_tpu.models.hetero import HeteroConv
from analysisgnn_tpu.models.mlp import HeadMLP, ProjectionMLP
from analysisgnn_tpu.models.rnn import BiResetGRU, segment_starts


class CadenceGNN(nn.Module):
    """Metrical (or plain hetero) encoder + onset-neighbour pooling +
    optional BiGRU over the note sequence + cadence head.

    num_classes defaults to the 4 cadence classes trained by the unified
    model (TASK_DICT) — the standalone 5-class encoder is available by
    passing ``num_classes=5``.
    """

    hidden: int
    num_classes: int = 4
    num_layers: int = 3
    dropout: float = 0.0
    edge_types: Tuple[EdgeType, ...] = ()
    metrical: bool = True
    use_gru: bool = True

    @nn.compact
    def __call__(
        self,
        x_dict: Dict[str, jax.Array],
        edge_index_dict: Dict[EdgeType, jax.Array],
        batch_dict: Dict[str, jax.Array],
        num_target_nodes: jax.Array,
        deterministic: bool = True,
        return_embedding: bool = False,
    ):
        enc_cls = MetricalGNN if self.metrical else HybridGNN
        h = enc_cls(
            hidden=self.hidden,
            num_layers=self.num_layers,
            dropout=self.dropout,
            use_jk=False,
            edge_types=self.edge_types,
            name="encoder",
        )(x_dict, edge_index_dict, batch_dict, deterministic=deterministic)
        # onset pooling (reference :329-344): mean over same-onset neighbours
        onset = edge_index_dict[(NOTE, "onset", NOTE)]
        msgs = h[jnp.minimum(onset[1], h.shape[0] - 1)]
        pooled = segment_mean_with_base(msgs, onset[0], base=h)
        z = jnp.concatenate([h, pooled], axis=-1)
        z = nn.Dense(self.hidden, name="pool_proj")(z)
        if self.use_gru:
            starts = segment_starts(batch_dict[NOTE])
            z = BiResetGRU(self.hidden, name="gru")(z, starts)
            z = nn.Dense(self.hidden, name="gru_proj")(z)
        z = nn.relu(nn.LayerNorm(name="norm")(z))
        logits = HeadMLP(self.hidden // 2, self.num_classes, name="clf")(z)
        if return_embedding:
            return logits, z
        return logits


class CadenceHead(nn.Module):
    """Cadence classifier head: Linear → ReLU → norm → Dropout → Linear
    (reference ``cad_clf``, models/cadence.py:193-199/268-274 — its
    BatchNorm1d is replaced by LayerNorm: identical shape, jit-pure, no
    mutable batch statistics to thread through the train state)."""

    hidden: int
    num_classes: int
    dropout: float = 0.5

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        x = nn.Dense(self.hidden // 2)(x)
        x = nn.relu(x)
        x = nn.LayerNorm()(x)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        return nn.Dense(self.num_classes)(x)


class HierarchicalHeteroSage(nn.Module):
    """Hetero-SAGE stack with SUM aggregation over edge types, ReLU between
    layers, final Linear (reference ``HierarchicalHeteroGraphSage``,
    models/cadence.py:140-174).

    The reference trims nodes/edges per layer (``trim_to_layer``) because its
    neighbor loader over-samples; the static-shape sampler here pads instead,
    so every layer runs the full padded buffer under masks — same math,
    shape-stable under jit.
    """

    hidden: int
    out: int
    num_layers: int
    edge_types: Tuple[EdgeType, ...] = ()

    @nn.compact
    def __call__(
        self,
        x_dict: Dict[str, jax.Array],
        edge_index_dict: Dict[EdgeType, jax.Array],
    ) -> jax.Array:
        h = x_dict
        for i in range(self.num_layers):
            h = HeteroConv(
                self.hidden, self.edge_types, aggr="sum", name=f"conv_{i}"
            )(h, edge_index_dict)
            h = {k: nn.relu(v) for k, v in h.items()}
        return nn.Dense(self.out, name="lin")(h[NOTE])


class CadenceGNNNeighbor(nn.Module):
    """Neighbor-sampled cadence model (reference ``CadenceGNNNeighbor``,
    models/cadence.py:177-227): hierarchical hetero-SAGE → onset pooling
    with ``out=x.clone()`` scatter-mean semantics → LayerNorm → pool MLP →
    cadence head.  ``encode``/``clf`` mirror the reference's two-phase API so
    the SMOTE training wrapper can oversample in embedding space.
    """

    hidden: int
    num_classes: int = 5
    num_layers: int = 2
    dropout: float = 0.5
    edge_types: Tuple[EdgeType, ...] = ()

    def setup(self):
        self.gnn = HierarchicalHeteroSage(
            hidden=self.hidden,
            out=self.hidden // 2,
            num_layers=self.num_layers,
            edge_types=self.edge_types,
            name="gnn",
        )
        half = self.hidden // 2
        self.norm = nn.LayerNorm(name="norm")
        self.pool_mlp = ProjectionMLP(half, half, self.dropout, name="pool_mlp")
        self.cad_clf = CadenceHead(half, self.num_classes, self.dropout, name="cad_clf")

    def encode(
        self,
        x_dict: Dict[str, jax.Array],
        edge_index_dict: Dict[EdgeType, jax.Array],
        deterministic: bool = True,
    ) -> jax.Array:
        x = self.gnn(x_dict, edge_index_dict)
        onset = edge_index_dict[(NOTE, "onset", NOTE)]
        msgs = x[jnp.minimum(onset[0], x.shape[0] - 1)]
        x = segment_mean_with_base(msgs, onset[1], base=x)
        x = self.norm(x)
        return self.pool_mlp(x, deterministic=deterministic)

    def clf(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        return self.cad_clf(x, deterministic=deterministic)

    def __call__(
        self,
        x_dict: Dict[str, jax.Array],
        edge_index_dict: Dict[EdgeType, jax.Array],
        deterministic: bool = True,
    ) -> jax.Array:
        x = self.encode(x_dict, edge_index_dict, deterministic=deterministic)
        return self.clf(x, deterministic=deterministic)


class CadenceAssisted(nn.Module):
    """Cadence head on top of a (possibly frozen) pre-trained encoder
    (reference ``CadenceAssistedPLModel``, models/cadence.py:564-607).

    Takes ``[N, encoder_dim]`` embeddings produced by a pre-trained encoder
    (typically ``AnalysisGNN.encode``, applied by the training wrapper).
    ``linear_probing=True`` reproduces the reference's ``freeze_encoder``
    with ``stop_gradient`` (the functional equivalent of
    ``requires_grad=False``).
    """

    encoder_dim: int
    hidden: int
    num_classes: int = 5
    dropout: float = 0.5
    linear_probing: bool = False

    def setup(self):
        half = self.hidden // 2
        self.proj = nn.Dense(half, name="proj")
        self.cad_clf = CadenceHead(half, self.num_classes, self.dropout, name="cad_clf")

    def head(self, emb: jax.Array, deterministic: bool = True) -> jax.Array:
        if self.linear_probing:
            emb = jax.lax.stop_gradient(emb)
        return self.cad_clf(nn.relu(self.proj(emb)), deterministic=deterministic)

    def __call__(self, emb: jax.Array, deterministic: bool = True) -> jax.Array:
        return self.head(emb, deterministic=deterministic)
