"""Heterogeneous conv dispatch: one conv per edge type, reduce across types.

The analog of the reference hetero wrappers (analysisgnn/models/core/
hgnn.py:98-140, :435-484) generalized to typed node dicts: node type ``t``'s
next state is the mean of the per-edge-type conv outputs over all edge types
whose *source* type is ``t`` (aggregation at the source node, reference
message direction).
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from analysisgnn_tpu.core.graph import EdgeType
from analysisgnn_tpu.models.conv import SageConv


class HeteroConv(nn.Module):
    """Apply a conv per edge type; mean-reduce contributions per node type.

    ``edge_types`` is the static metadata tuple.  Node types with no incident
    edge type get a plain Dense so every type advances to ``out_features``.
    """

    out_features: int
    edge_types: Tuple[EdgeType, ...]
    conv_cls: Callable = SageConv

    @nn.compact
    def __call__(
        self,
        x_dict: Dict[str, jax.Array],
        edge_index_dict: Dict[EdgeType, jax.Array],
    ) -> Dict[str, jax.Array]:
        contributions: Dict[str, list] = {t: [] for t in x_dict}
        for et in self.edge_types:
            src_t, rel, dst_t = et
            if et not in edge_index_dict or src_t not in x_dict or dst_t not in x_dict:
                continue
            name = f"conv_{src_t}__{rel}__{dst_t}"
            conv = self.conv_cls(self.out_features, name=name)
            out = conv(x_dict[src_t], edge_index_dict[et], x_dict[dst_t])
            contributions[src_t].append(out)
        result: Dict[str, jax.Array] = {}
        for t, outs in contributions.items():
            if outs:
                result[t] = jnp.mean(jnp.stack(outs, axis=0), axis=0)
            else:
                result[t] = nn.Dense(self.out_features, name=f"self_{t}")(x_dict[t])
        return result
