"""Heterogeneous conv dispatch: one conv per edge type, reduce across types.

The analog of the reference hetero wrappers (analysisgnn/models/core/
hgnn.py:98-140, :435-484) generalized to typed node dicts: node type ``t``'s
next state is the mean of the per-edge-type conv outputs over all edge types
whose *source* type is ``t`` (aggregation at the source node, reference
message direction).

Two execution paths with identical architecture:
  * generic — one conv module per edge type (any conv class),
  * fused   — all same-node-type SAGE relations collapsed into a single
    batched einsum + flattened scatter (models/fused.py), cutting kernel
    count ~10× per layer.  Default on for SageConv.
"""

from __future__ import annotations

from typing import Callable, Dict, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from analysisgnn_tpu.core.graph import EdgeType
from analysisgnn_tpu.models.conv import SageConv
from analysisgnn_tpu.models.fused import FusedHeteroSage, stack_relations


class HeteroConv(nn.Module):
    """Apply a conv per edge type; mean-reduce contributions per node type.

    ``edge_types`` is the static metadata tuple.  Node types with no incident
    edge type get a plain Dense so every type advances to ``out_features``.
    """

    out_features: int
    edge_types: Tuple[EdgeType, ...]
    conv_cls: Callable = SageConv
    fused: bool = True
    # Fuse across node types too (ONE conv for the whole layer).  Fewer
    # kernels but computes every relation over every node — measured slower
    # on current hardware than per-type fusion, so off by default.
    unify_all: bool = False
    # Per-node-type reduction over edge-type contributions.  The unified
    # model stack mean-reduces (PyG HeteroConv default); the cadence
    # HierarchicalHeteroGraphSage uses aggr='sum' (reference models/
    # cadence.py:144-156).
    aggr: str = "mean"
    # Route the fused-SAGE aggregation through the Pallas kernel (requires
    # src-sorted edges per relation — SamplerConfig.sort_edges_by_src).
    use_pallas: bool = False
    # fused-SAGE implementation: "node" (transform post-scatter), "edge"
    # (product weights on edges; [N, G] scatter), or "edge-zxp" (edge with
    # the Pallas base-term kernel) — see models/fused.py
    conv_impl: str = "node"

    @nn.compact
    def __call__(
        self,
        x_dict: Dict[str, jax.Array],
        edge_index_dict: Dict[EdgeType, jax.Array],
    ) -> Dict[str, jax.Array]:
        # contributions hold (sum_over_member_relations, member_count) pairs:
        # the fused path returns its T relations pre-summed as ONE [N, G]
        # array (models/fused.py reduce="sum"), so the per-type reduction is
        # a weighted combine instead of a stack over T materialized outputs
        contributions: Dict[str, list] = {t: [] for t in x_dict}
        present = [
            et
            for et in self.edge_types
            if et in edge_index_dict and et[0] in x_dict and et[2] in x_dict
        ]
        handled = set()
        widths = {v.shape[-1] for v in x_dict.values()}
        if (
            self.fused
            and self.unify_all
            and self.conv_cls is SageConv
            and len(widths) == 1
            and len(present) >= 2
        ):
            # full homogenization: ALL relations in one batched conv over the
            # concatenated node set (models/fused.py) — one einsum + one
            # scatter for the entire hetero layer.
            from analysisgnn_tpu.models.fused import unify_node_types

            x_all, src, dst, rel, slices = unify_node_types(
                x_dict, edge_index_dict, present
            )
            out = FusedHeteroSage(
                self.out_features, len(present), name="unified"
            )(x_all, src, dst, rel)  # [T, N_all, G] (pallas n/a: concat ids unsorted)
            result: Dict[str, jax.Array] = {}
            for t in x_dict:
                idxs = [i for i, et in enumerate(present) if et[0] == t]
                off, size = slices[t]
                if idxs:
                    sel = out[jnp.asarray(idxs), off : off + size]
                    result[t] = sel.sum(0) if self.aggr == "sum" else sel.mean(0)
                else:
                    result[t] = nn.Dense(self.out_features, name=f"self_{t}")(
                        x_dict[t]
                    )
            return result
        if self.fused and self.conv_cls is SageConv:
            # group same-type (t, rel, t) relations per node type
            by_type: Dict[str, List[EdgeType]] = {}
            for et in present:
                if et[0] == et[2]:
                    by_type.setdefault(et[0], []).append(et)
            for t, rels in by_type.items():
                if len(rels) < 2:
                    continue  # no fusion benefit
                src, dst, rid = stack_relations(edge_index_dict, rels)
                sta_src = sta_dst = None
                if self.conv_impl.startswith("edge") and not self.use_pallas:
                    from analysisgnn_tpu.models.fused import (
                        stack_relations_padded,
                    )

                    sta_src, sta_dst = stack_relations_padded(
                        edge_index_dict, rels, x_dict[t].shape[0]
                    )
                out = FusedHeteroSage(
                    self.out_features,
                    len(rels),
                    use_pallas=self.use_pallas,
                    reduce="sum",
                    impl=("edge" if sta_src is not None else "node"),
                    zx_pallas=(self.conv_impl == "edge-zxp"),
                    name=f"fused_{t}",
                )(x_dict[t], src, dst, rid, sta_src, sta_dst)
                contributions[t].append((out, len(rels)))
                handled.update(rels)
        for et in present:
            if et in handled:
                continue
            src_t, rel, dst_t = et
            name = f"conv_{src_t}__{rel}__{dst_t}"
            conv = self.conv_cls(self.out_features, name=name)
            out = conv(x_dict[src_t], edge_index_dict[et], x_dict[dst_t])
            contributions[src_t].append((out, 1))
        result: Dict[str, jax.Array] = {}
        for t, outs in contributions.items():
            if outs:
                total = outs[0][0]
                for arr, _w in outs[1:]:
                    total = total + arr
                if self.aggr != "sum":
                    total = total / sum(w for _arr, w in outs)
                result[t] = total
            else:
                result[t] = nn.Dense(self.out_features, name=f"self_{t}")(x_dict[t])
        return result
