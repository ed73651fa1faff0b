"""Remaining layer-zoo members: OnsetEmbedding, HGPS graph-transformer,
hetero ResGated stack.

References: ``OnsetEmbedding`` (analysisgnn/models/core/gnn.py:294-311),
``HGPSLayer``/``HGPS`` — the General-Powerful-Scalable graph transformer
combining a local gated conv with global self-attention within the
(sub)graph (core/hgnn.py:220-320), and ``HResGatedConv`` (hgnn.py:182-217).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from analysisgnn_tpu.core.graph import EdgeType, NOTE
from analysisgnn_tpu.kernels.segment_ops import segment_mean_with_base
from analysisgnn_tpu.models.conv import ResGatedConv, _gather
from analysisgnn_tpu.models.encoders import l2_normalize
from analysisgnn_tpu.models.hetero import HeteroConv


class OnsetEmbedding(nn.Module):
    """Mean |Δx| over onset neighbours (+self loop) then Dense — the
    onset-contrast embedding of reference core/gnn.py:294-311."""

    out_features: int

    @nn.compact
    def __call__(self, x: jax.Array, edge_index: jax.Array) -> jax.Array:
        n = x.shape[0]
        src, dst = edge_index[0], edge_index[1]
        diffs = jnp.abs(_gather(x, src) - _gather(x, dst))
        # self loops contribute |x - x| = 0 to every node, so the
        # mean-with-base over the original x matches the reference's
        # add_self_loops + scatter(out=x.clone()) semantics
        agg = segment_mean_with_base(diffs, src, base=x)
        return nn.Dense(self.out_features)(agg)


class HGPSLayer(nn.Module):
    """Local hetero gated conv + masked global self-attention + FFN
    (reference HGPSLayer, core/hgnn.py:220-287).  Attention is restricted to
    valid nodes of the same graph via an additive mask."""

    out_features: int
    num_heads: int = 4
    dropout: float = 0.2
    edge_types: Tuple[EdgeType, ...] = ()

    @nn.compact
    def __call__(
        self,
        x: jax.Array,  # [N, F] note states
        edge_index_dict: Dict[EdgeType, jax.Array],
        batch_ids: jax.Array,  # [N]
        valid: jax.Array,  # [N] bool
        deterministic: bool = True,
    ) -> jax.Array:
        h_init = nn.Dense(self.out_features, name="embedding")(x)
        # local: mean over per-relation gated convs
        outs = []
        for et in self.edge_types:
            if et not in edge_index_dict or et[0] != NOTE or et[2] != NOTE:
                continue
            outs.append(
                ResGatedConv(self.out_features, name=f"local_{et[1]}")(
                    h_init, edge_index_dict[et]
                )
            )
        local = jnp.mean(jnp.stack(outs), 0) if outs else h_init
        local = nn.relu(local)
        local = nn.LayerNorm(name="norm_local")(local)
        local = nn.Dropout(self.dropout)(local, deterministic=deterministic)
        local = local + h_init

        # global: self-attention within each graph (masked)
        same_graph = (batch_ids[:, None] == batch_ids[None, :]) & (
            valid[:, None] & valid[None, :]
        )
        attn_mask = same_graph[None, None]  # [1,1,N,N] for MHA
        attended = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads,
            dropout_rate=self.dropout,
            deterministic=deterministic,
            name="attn",
        )(h_init[None], h_init[None], mask=attn_mask)[0]
        attended = nn.relu(attended)
        attended = nn.LayerNorm(name="norm_attn")(attended)
        attended = nn.Dropout(self.dropout)(attended, deterministic=deterministic)
        attended = attended + h_init

        out = local + attended
        h = nn.Dense(self.out_features * 2, name="ff1")(out)
        h = nn.relu(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = nn.Dense(self.out_features, name="ff2")(h)
        return l2_normalize(out + h)


class HGPS(nn.Module):
    """Stack of HGPS layers over note states (reference hgnn.py:290-320)."""

    hidden: int
    num_layers: int = 2
    num_heads: int = 4
    dropout: float = 0.2
    edge_types: Tuple[EdgeType, ...] = ()

    @nn.compact
    def __call__(
        self,
        x_dict: Dict[str, jax.Array],
        edge_index_dict: Dict[EdgeType, jax.Array],
        batch_dict: Dict[str, jax.Array],
        valid: Optional[jax.Array] = None,
        deterministic: bool = True,
    ) -> jax.Array:
        h = x_dict[NOTE]
        if valid is None:
            valid = jnp.ones(h.shape[0], bool)
        for i in range(self.num_layers):
            h = HGPSLayer(
                self.hidden,
                self.num_heads,
                self.dropout,
                self.edge_types,
                name=f"layer_{i}",
            )(h, edge_index_dict, batch_dict[NOTE], valid, deterministic)
        return h


class HResGatedConv(nn.Module):
    """Hetero ResGated stack (reference HResGatedConv, hgnn.py:182-217)."""

    hidden: int
    num_layers: int = 3
    dropout: float = 0.0
    edge_types: Tuple[EdgeType, ...] = ()

    @nn.compact
    def __call__(
        self,
        x_dict: Dict[str, jax.Array],
        edge_index_dict: Dict[EdgeType, jax.Array],
        batch_dict=None,
        deterministic: bool = True,
    ) -> jax.Array:
        h = dict(x_dict)
        for i in range(self.num_layers):
            h = HeteroConv(
                self.hidden, self.edge_types, conv_cls=ResGatedConv,
                fused=False, name=f"layer_{i}",
            )(h, edge_index_dict)
            h = {t: nn.relu(v) for t, v in h.items()}
            h = {t: l2_normalize(v) for t, v in h.items()}
            h = {
                t: nn.Dropout(self.dropout)(v, deterministic=deterministic)
                for t, v in h.items()
            }
        return h[NOTE]
