"""Single-relation graph convolutions (flax.linen) over padded edge lists.

Message direction follows the reference convention: for an edge ``(u, v)``
node ``u`` (``edge_index[0]``) aggregates the representation of ``v``
(``edge_index[1]``) — see ``SageConvScatter.forward``
(analysisgnn/models/core/gnn.py:62-76).  Padded edges carry one-past-the-end
ids on both rows, so scatters drop them and gathers clamp harmlessly.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from analysisgnn_tpu.kernels.segment_ops import (
    segment_mean_with_base,
    segment_sum,
)


def _gather(x: jax.Array, idx: jax.Array) -> jax.Array:
    return x[jnp.minimum(idx, x.shape[0] - 1)]


class SageConv(nn.Module):
    """GraphSAGE with mean aggregation (reference SageConvScatter,
    core/gnn.py:39-76): ``z = W [x_src ‖ mean'(W_n x_dst)]`` where mean'
    folds the aggregating node's own features into the message mean.
    """

    out_features: int
    use_bias: bool = True

    @nn.compact
    def __call__(
        self,
        x_src: jax.Array,
        edge_index: jax.Array,
        x_dst: Optional[jax.Array] = None,
    ) -> jax.Array:
        if x_dst is None:
            x_dst = x_src
        in_features = x_dst.shape[-1]
        h = nn.Dense(in_features, use_bias=self.use_bias, name="neigh")(x_dst)
        msgs = _gather(h, edge_index[1])
        agg = segment_mean_with_base(msgs, edge_index[0], base=x_src)
        z = jnp.concatenate([x_src, agg], axis=-1)
        return nn.Dense(self.out_features, use_bias=self.use_bias, name="out")(z)


class ResGatedConv(nn.Module):
    """Residual gated graph conv (reference ResGatedGraphConv,
    core/gnn.py:212-258, including its double-counting of the root term:
    ``z = h1 + (h1 + Σ gate·h2[dst])``)."""

    out_features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, x_src: jax.Array, edge_index: jax.Array,
                 x_dst: Optional[jax.Array] = None) -> jax.Array:
        if x_dst is None:
            x_dst = x_src
        dense = lambda name: nn.Dense(self.out_features, use_bias=self.use_bias, name=name)
        h1 = dense("w1")(x_src)
        h2 = dense("w2")(x_dst)
        h3 = dense("w3")(x_src)
        h4 = dense("w4")(x_dst)
        gate = jax.nn.sigmoid(_gather(h3, edge_index[0]) + _gather(h4, edge_index[1]))
        msgs = gate * _gather(h2, edge_index[1])
        s = h1 + segment_sum(msgs, edge_index[0], h1.shape[0])
        return h1 + s


class GATConv(nn.Module):
    """Attention conv with the reference's head-wise softmax variant
    (core/gnn.py:154-209)."""

    out_features: int
    num_heads: int = 3
    negative_slope: float = 0.2
    dropout: float = 0.0

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        edge_index: jax.Array,
        deterministic: bool = True,
    ) -> jax.Array:
        n, f = x.shape
        h_heads = self.num_heads
        el = nn.Dense(f * h_heads, name="el")(x).reshape(n, h_heads, f)
        er = nn.Dense(f * h_heads, name="er")(x).reshape(n, h_heads, f)
        attnl = self.param("attnl", nn.initializers.xavier_normal(), (1, h_heads, f))
        attnr = self.param("attnr", nn.initializers.xavier_normal(), (1, h_heads, f))
        e_src = (_gather(el, edge_index[0]) * attnl).sum(-1, keepdims=True)
        e_dst = (_gather(er, edge_index[1]) * attnr).sum(-1, keepdims=True)
        e = nn.leaky_relu(e_src + e_dst, negative_slope=self.negative_slope)
        e = nn.Dropout(self.dropout)(e, deterministic=deterministic)
        a = jax.nn.softmax(e, axis=1).mean(axis=1)  # head-wise, as in reference
        h = nn.Dense(self.out_features, name="out")(x)
        msgs = a * _gather(h, edge_index[1])
        return h + segment_sum(msgs, edge_index[0], n)
