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
from analysisgnn_tpu.models.mlp import HeadMLP
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
