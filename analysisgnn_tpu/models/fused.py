"""Fused multi-relation SAGE layer: one batched matmul + one scatter for ALL
note-note relations.

Motivation: the per-edge-type conv dispatch (models/hetero.py) launches
~5 kernels × T relations per layer; on TPU (and especially through a proxied
runtime with per-kernel overhead) the same math is an order of magnitude
cheaper expressed as batched einsums over a stacked [T, ...] relation axis
with ONE flattened segment reduction.

Round-4 HBM-traffic restructure (VERDICT r3 ask #2 — the round-3 roofline
measured the XLA path bandwidth-bound at 38% of HBM peak, with per-relation
feature copies the top byte movers).  The neighbor transform is LINEAR, so
the per-relation transform commutes with the segment sum:

    Σ_e (x[dst_e] @ W[t] + b[t])  ==  (Σ_e x[dst_e]) @ W[t] + count·b[t]

which turns the old layout

    H[t]      = x @ W_neigh[t]                  [T,N,F] materialized
    msgs      = H.reshape(T·N, F)[t·N + dst_e]  gather from a T·N-row array
    sums      = segment_sum(msgs, t·N + src_e)

into

    x_e       = x[dst_e]                        ONE gather from [N, F]
    raw[t]    = segment_sum(x_e, t·N + src_e)   (count rides as a channel)
    sums[t]   = raw[t] @ W_neigh[t] + count·b   post-aggregation einsum

— the [T,N,F] intermediate is never written, the gather working set shrinks
T×, and the transform runs on N aggregated rows instead of E edge rows.
With ``reduce="sum"`` the output stage also collapses: instead of
materializing [T,N,G] and mean-reducing in the caller,

    Σ_t out[t] = x @ Σ_t W_self[t] + Σ_t agg[t] @ W_agg[t] + Σ_t b_out[t]

where the middle term is ONE dot_general contracting (t, f) — an
[N, T·F] × [T·F, G] MXU matmul with an [N, G] output.

Numerically equivalent to T independent SageConvs up to float reassociation
(tests/test_fused.py).
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
    # None → return per-relation [T, N, G] (caller reduces); "sum" → return
    # the relation-summed [N, G] without ever materializing [T, N, G]
    reduce: str | None = None
    # "node": transform the [T, N, F] raw segment sums (docstring layout 1);
    # "edge": push W_neigh·W_agg onto the edges so the big scatter shrinks
    #         from [T·N, F] to [N, G] (docstring layout 2; requires
    #         reduce="sum" and the stacked [T, E_max] edge layout)
    impl: str = "node"
    # edge impl only: compute the base term with the tiled Pallas kernel
    # (kernels/pallas_relmm.py) instead of the einsum, killing its [T, N, ·]
    # HBM intermediate
    zx_pallas: bool = False

    @nn.compact
    def __call__(
        self,
        x: jax.Array,  # [N, F]
        edge_src: jax.Array,  # [E_total] int32, with per-edge relation ids
        edge_dst: jax.Array,  # [E_total]
        edge_rel: jax.Array,  # [E_total] int32 in [0, T)
        stacked_src: jax.Array | None = None,  # [T, E_max] (impl="edge")
        stacked_dst: jax.Array | None = None,  # [T, E_max] (impl="edge")
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

        if self.impl == "edge":
            assert self.reduce == "sum" and stacked_src is not None
            return self._edge_impl(
                x, stacked_src, stacked_dst,
                w_neigh, b_neigh, w_self, w_agg, b_out,
            )
        src = jnp.minimum(edge_src, n)  # padding → n (dropped below)
        dst = jnp.minimum(edge_dst, n - 1)
        if self.use_pallas:
            from analysisgnn_tpu.kernels.pallas_segment import (
                TILE_N,
                segment_mean_base_sorted,
            )

            # the Pallas kernel consumes per-edge TRANSFORMED messages, so
            # this branch keeps the pre-aggregation layout
            h = jnp.einsum("nf,tfg->tng", x, w_neigh) + b_neigh  # [T, N, F]
            flat = h.reshape(t * n, f)
            gather_idx = edge_rel * n + dst
            msgs = flat[jnp.minimum(gather_idx, t * n - 1)]
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
            # linearity restructure (module docstring): aggregate RAW
            # neighbor features once, transform the [T, N, F] sums after.
            # Counts go through their OWN scatter: packing them as an extra
            # channel makes the operand [E, F+1] (misaligned to the 128-lane
            # tile) and, because the packed operand then differs per layer,
            # defeats XLA's cross-layer CSE of the layer-invariant counts
            # (measured: MetricalGNN 37.6 vs 26.2 ms/step packed vs split).
            x_e = x[dst]  # [E, F] — the only gather, from [N, F]
            seg = jnp.where(src >= n, t * n, edge_rel * n + src)
            raw = segment_sum(
                x_e.astype(jnp.float32), seg, t * n
            ).reshape(t, n, f)
            counts = segment_sum(
                jnp.ones_like(seg, jnp.float32), seg, t * n
            ).reshape(t, n)
            sums = (
                jnp.einsum("tnf,tfg->tng", raw, w_neigh)
                + counts[..., None] * b_neigh
            )
            # torch_scatter mean-with-out semantics: (x + Σ msgs) / max(count, 1)
            agg = (x[None] + sums) / jnp.maximum(counts, 1.0)[..., None]
        if self.reduce == "sum":
            # Σ_t out[t] without the [T, N, G] intermediate: the self term
            # collapses into one [F, G] matmul, the agg term into one
            # dot_general contracting (t, f)
            return (
                x @ w_self.sum(0)
                + jnp.einsum("tnf,tfg->ng", agg, w_agg)
                + b_out.sum(0)
            )
        out = (
            jnp.einsum("nf,tfg->tng", x, w_self)
            + jnp.einsum("tnf,tfg->tng", agg, w_agg)
            + b_out
        )
        return out  # [T, N, G]; caller reduces across relations

    def _edge_impl(
        self,
        x: jax.Array,  # [N, F]
        src: jax.Array,  # [T, E_max] int32, padding = n
        dst: jax.Array,  # [T, E_max] int32, padding clamped below
        w_neigh: jax.Array,
        b_neigh: jax.Array,
        w_self: jax.Array,
        w_agg: jax.Array,
        b_out: jax.Array,
    ) -> jax.Array:
        """Layout 2 (module docstring): associate the per-relation transforms
        onto the EDGES so the only large scatter is [N, G].

          Σ_t agg[t] @ W_agg[t]
            = Σ_e α[rel_e, src_e] · x[dst_e] @ (W_neigh W_agg)[rel_e]   (msg)
            + Σ_t (x / c̃[t]) @ W_agg[t]                                (base)
            + Σ_t 1[c_t>0] · (b_neigh[t] @ W_agg[t])                    (bias)

        with α = 1/c̃, c̃ = max(count, 1).  The [T·N, F] raw-sum scatter of the
        node impl is replaced by a [T, N] count scatter (scalars) and an
        [N, G] message scatter; the per-edge transform uses the precomputed
        [T, F, G] product weights — at sampled-subgraph sparsity E < T·N this
        is also strictly fewer transform FLOPs.  Exact up to reassociation
        (tests/test_fused.py::test_edge_impl_matches_node_impl).
        """
        n, f = x.shape
        t, e_max = src.shape
        g = self.out_features

        # [T, N] edge counts: one scalar scatter (padding src = n drops)
        seg_tn = jnp.where(
            src >= n,
            t * n,
            jnp.arange(t, dtype=src.dtype)[:, None] * n + src,
        ).reshape(-1)
        counts = segment_sum(
            jnp.ones((t * e_max,), jnp.float32), seg_tn, t * n
        ).reshape(t, n)
        inv_c = 1.0 / jnp.maximum(counts, 1.0)  # α  [T, N]
        has_edge = jnp.minimum(counts, 1.0)  # c/c̃ ∈ {0, 1}

        # message term: per-edge transform with the product weights
        w_na = jnp.einsum("tfh,thg->tfg", w_neigh, w_agg)  # tiny
        dst_c = jnp.minimum(dst, n - 1)
        x_e = x[dst_c]  # [T, E_max, F] — ONE gather from [N, F]
        alpha_e = jnp.where(
            src >= n, 0.0, inv_c.reshape(-1)[jnp.minimum(seg_tn, t * n - 1)]
            .reshape(t, e_max),
        )
        y_e = jnp.einsum("tef,tfg->teg", x_e, w_na) * alpha_e[..., None]
        z_msg = segment_sum(
            y_e.reshape(t * e_max, g),
            jnp.where(src >= n, n, src).reshape(-1),
            n,
        )  # [N, G]

        # base term (the x inside every relation's mean): einsum (XLA picks
        # the contraction order — one [T, N, ·] HBM intermediate) or the
        # tiled Pallas kernel (intermediate-free)
        if self.zx_pallas:
            from analysisgnn_tpu.kernels.pallas_relmm import (
                relation_weighted_matmul,
            )

            z_x = relation_weighted_matmul(
                x, w_agg, inv_c, jax.default_backend() == "cpu"
            )
        else:
            z_x = jnp.einsum("tn,nf,tfg->ng", inv_c, x, w_agg)

        # bias-inside-mean term: c·b/c̃ = b wherever the node has any edge
        bw = jnp.einsum("tf,tfg->tg", b_neigh[:, 0, :], w_agg)  # [T, G]
        z_b = jnp.einsum("tn,tg->ng", has_edge, bw)

        return x @ w_self.sum(0) + z_msg + z_x + z_b + b_out.sum(0)


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


def stack_relations_padded(
    edge_index_dict: Dict[Tuple[str, str, str], jax.Array],
    relations: Sequence[Tuple[str, str, str]],
    n_nodes: int,
) -> Tuple[jax.Array, jax.Array]:
    """[T, E_max] src/dst stacks for the edge impl (stacking pad src = n_nodes
    so it joins the relations' own one-past-the-end padding convention)."""
    e_max = max(edge_index_dict[et].shape[1] for et in relations)
    srcs, dsts = [], []
    for et in relations:
        ei = edge_index_dict[et]
        pad = e_max - ei.shape[1]
        srcs.append(jnp.pad(ei[0], (0, pad), constant_values=n_nodes))
        dsts.append(jnp.pad(ei[1], (0, pad), constant_values=n_nodes))
    return jnp.stack(srcs), jnp.stack(dsts)


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
