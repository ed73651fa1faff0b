"""Fused multi-relation SAGE layer: one batched matmul + one scatter for ALL
note-note relations.

Motivation: the per-edge-type conv dispatch (models/hetero.py) launches
~5 kernels × T relations per layer; on TPU (and especially through a proxied
runtime with per-kernel overhead) the same math is an order of magnitude
cheaper expressed as batched einsums over a stacked [T, ...] relation axis
with ONE flattened segment reduction:

    H[t]      = x @ W_neigh[t]                  (einsum, MXU)
    msgs      = H.reshape(T·N, F)[t·N + dst_e]  (one gather)
    sums      = segment_sum(msgs, t·N + src_e)  (one scatter → [T·N, F])
    agg[t]    = (x + sums[t]) / count[t]        (mean-with-base semantics)
    out[t]    = [x ‖ agg[t]] @ W_out[t]         (einsum, MXU)
    result    = mean_t out[t]

Numerically identical to T independent SageConvs (tests/test_fused.py).
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from analysisgnn_tpu.kernels.segment_ops import segment_sum


class FusedHeteroSage(nn.Module):
    """T-relation SAGE over shared node set; relations stacked on axis 0.

    ``use_pallas`` replaces the two-scatter + gather + divide aggregation
    with ONE Pallas kernel (kernels/pallas_segment.py::
    segment_mean_base_sorted).  It REQUIRES edges sorted ascending by src
    within each relation (the sampler emits this order under
    ``SamplerConfig.sort_edges_by_src``); padding edge ids equal the node
    capacity, so they sort last and land on each relation's dummy row.
    """

    out_features: int
    num_relations: int
    use_pallas: bool = False

    @nn.compact
    def __call__(
        self,
        x: jax.Array,  # [N, F]
        edge_src: jax.Array,  # [E_total] int32, with per-edge relation ids
        edge_dst: jax.Array,  # [E_total]
        edge_rel: jax.Array,  # [E_total] int32 in [0, T)
    ) -> jax.Array:
        n, f = x.shape
        t = self.num_relations
        g = self.out_features
        init = nn.initializers.lecun_normal()
        w_neigh = self.param("w_neigh", init, (t, f, f))
        b_neigh = self.param("b_neigh", nn.initializers.zeros, (t, 1, f))
        w_self = self.param("w_self", init, (t, f, g))
        w_agg = self.param("w_agg", init, (t, f, g))
        b_out = self.param("b_out", nn.initializers.zeros, (t, 1, g))

        h = jnp.einsum("nf,tfg->tng", x, w_neigh) + b_neigh  # [T, N, F]
        flat = h.reshape(t * n, f)
        src = jnp.minimum(edge_src, n)  # padding → n (dropped below)
        dst = jnp.minimum(edge_dst, n - 1)
        gather_idx = edge_rel * n + dst
        msgs = flat[jnp.minimum(gather_idx, t * n - 1)]
        if self.use_pallas:
            from analysisgnn_tpu.kernels.pallas_segment import (
                TILE_N,
                segment_mean_base_sorted,
            )

            # per-relation segment stride m > n keeps padding edges (src=n)
            # on a dummy row that the [:, :n] slice removes, while keeping
            # the concatenated segment ids globally sorted
            m = (n // TILE_N + 1) * TILE_N  # smallest multiple of TILE_N > n
            seg = edge_rel * m + src
            offsets = jnp.searchsorted(
                seg, jnp.arange(0, t * m + 1, TILE_N, dtype=seg.dtype)
            ).astype(jnp.int32)
            x_pad = jnp.pad(x, ((0, m - n), (0, 0)))
            agg = segment_mean_base_sorted(
                msgs, seg, x_pad, offsets, t * m,
                jax.default_backend() == "cpu",  # interpret off-TPU
            ).reshape(t, m, f)[:, :n]
        else:
            seg = jnp.where(src >= n, t * n, edge_rel * n + src)
            sums = segment_sum(msgs, seg, t * n).reshape(t, n, f)
            counts = segment_sum(
                jnp.ones_like(seg, jnp.float32), seg, t * n
            ).reshape(t, n)
            # torch_scatter mean-with-out semantics: (x + Σ msgs) / max(count, 1)
            agg = (x[None] + sums) / jnp.maximum(counts, 1.0)[..., None]
        out = (
            jnp.einsum("nf,tfg->tng", x, w_self)
            + jnp.einsum("tnf,tfg->tng", agg, w_agg)
            + b_out
        )
        return out  # [T, N, G]; caller reduces across relations


def unify_node_types(
    x_dict: Dict[str, jax.Array],
    edge_index_dict: Dict[Tuple[str, str, str], jax.Array],
    relations: Sequence[Tuple[str, str, str]],
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array, Dict[str, Tuple[int, int]]]:
    """Concatenate all node types into one array and remap every relation's
    edges into the union id space (padding ids map past the union end).

    Requires equal feature widths across types (true after the per-type
    projection MLPs).  Returns (x_all, edge_src, edge_dst, edge_rel,
    type_slices) where ``type_slices[t] = (offset, size)``.
    """
    order = sorted(x_dict.keys())
    offsets: Dict[str, int] = {}
    off = 0
    for t in order:
        offsets[t] = off
        off += x_dict[t].shape[0]
    total = off
    x_all = jnp.concatenate([x_dict[t] for t in order], axis=0)
    srcs, dsts, rels = [], [], []
    for i, et in enumerate(relations):
        src_t, _, dst_t = et
        ei = edge_index_dict[et]
        n_src = x_dict[src_t].shape[0]
        n_dst = x_dict[dst_t].shape[0]
        # padding entries (>= per-type count) must stay out-of-range globally
        src = jnp.where(ei[0] < n_src, ei[0] + offsets[src_t], total)
        dst = jnp.where(ei[1] < n_dst, ei[1] + offsets[dst_t], total)
        srcs.append(src)
        dsts.append(dst)
        rels.append(jnp.full(ei.shape[1], i, jnp.int32))
    slices = {t: (offsets[t], x_dict[t].shape[0]) for t in order}
    return (
        x_all,
        jnp.concatenate(srcs),
        jnp.concatenate(dsts),
        jnp.concatenate(rels),
        slices,
    )


def stack_relations(
    edge_index_dict: Dict[Tuple[str, str, str], jax.Array],
    relations: Sequence[Tuple[str, str, str]],
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Concatenate the given relations' (static-size) edge arrays with a
    relation-id vector.  Shapes are static → traced once."""
    srcs, dsts, rels = [], [], []
    for i, et in enumerate(relations):
        ei = edge_index_dict[et]
        srcs.append(ei[0])
        dsts.append(ei[1])
        rels.append(jnp.full(ei.shape[1], i, jnp.int32))
    return (
        jnp.concatenate(srcs),
        jnp.concatenate(dsts),
        jnp.concatenate(rels),
    )
