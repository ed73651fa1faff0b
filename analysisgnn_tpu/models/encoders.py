"""The three production encoders: HybridGNN, HybridHGT, MetricalGNN.

TPU-native re-designs of the graphmuse encoder family consumed by the
reference at analysisgnn/models/analysis.py:444-473 (selection by
``encoder_type``) with layer semantics anchored to the in-repo analogs:
HGCN-style hetero SAGE stacks (analysisgnn/models/core/hgnn.py:144-179),
LSTM-attention JumpingKnowledge (core/gnn.py:345-365), HGT typed attention
(SDDMM → segment softmax → SpMM), and metrical beat/measure interleaving
(core/hgnn.py:323-433, core/gnn.py:488-540).

All encoders share the call signature

    encoder(x_dict, edge_index_dict, batch_dict, deterministic) -> [N_note, F]

operating on padded static-shape arrays; sampled-subgraph "layer trimming"
(``neighbor_mask_node/edge`` in the reference) is unnecessary here because
extra padded nodes cost only masked compute, never correctness.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from analysisgnn_tpu.core.graph import BEAT, EdgeType, MEASURE, NOTE
from analysisgnn_tpu.kernels.segment_ops import segment_sum
from analysisgnn_tpu.models.conv import SageConv, _gather
from analysisgnn_tpu.models.hetero import HeteroConv
from analysisgnn_tpu.models.rnn import BiResetGRU, LayerAttentionJK, segment_starts


def l2_normalize(x: jax.Array, eps: float = 1e-12) -> jax.Array:
    """Row-wise L2 normalization (torch ``F.normalize`` semantics)."""
    norm = jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), eps)
    return x / norm


class HybridGNN(nn.Module):
    """Stack of hetero SAGE layers with ReLU → L2-norm → dropout between
    layers and optional JumpingKnowledge (reference HGCN forward,
    core/hgnn.py:167-179)."""

    hidden: int
    num_layers: int = 3
    dropout: float = 0.0
    use_jk: bool = True
    edge_types: Tuple[EdgeType, ...] = ()
    # Apply ReLU → L2-norm to the FINAL conv output too.  The reference HGCN
    # leaves the last layer raw (core/hgnn.py:178-179), but the raw output
    # has unbounded scale, which measurably destabilizes the multi-task
    # recipe at the reference lr=5e-3 (scripts/variant_sweep.py arm
    # "fnorm"): bounding the encoder output is what lets the full recipe
    # train at the reference hyperparameters.
    final_norm: bool = False
    # Dropout AFTER the final conv as well (the torch-anchor RefModel runs
    # activation→normalize→dropout on every layer incl. the last; the
    # reference HGCN does not — diagnostic knob for
    # scripts/dropout_bisect.py)
    final_dropout: bool = False
    # Pallas fused mean-with-base aggregation (needs src-sorted edges)
    use_pallas: bool = False
    # Rematerialize each conv layer in the backward pass (jax.checkpoint):
    # trades one extra forward of FLOPs for not storing per-edge message
    # activations — the HBM lever for full-graph training on very long
    # scores (a 100k-note score materializes ~1M-edge message tensors per
    # layer; remat keeps only the [N, H] layer inputs alive).
    remat: bool = False
    # fused-SAGE implementation ("node" | "edge") — see models/fused.py
    conv_impl: str = "node"

    @nn.compact
    def __call__(
        self,
        x_dict: Dict[str, jax.Array],
        edge_index_dict: Dict[EdgeType, jax.Array],
        batch_dict: Optional[Dict[str, jax.Array]] = None,
        deterministic: bool = True,
    ) -> jax.Array:
        h = dict(x_dict)
        note_states = []
        conv_cls = nn.remat(HeteroConv) if self.remat else HeteroConv
        for i in range(self.num_layers):
            h = conv_cls(
                self.hidden,
                self.edge_types,
                use_pallas=self.use_pallas,
                conv_impl=self.conv_impl,
                name=f"layer_{i}",
            )(h, edge_index_dict)
            h = {t: nn.relu(v) for t, v in h.items()}
            h = {t: l2_normalize(v) for t, v in h.items()}
            h = {
                t: nn.Dropout(self.dropout)(v, deterministic=deterministic)
                for t, v in h.items()
            }
            note_states.append(h[NOTE])
        if self.use_jk:
            jk = LayerAttentionJK(self.hidden, name="jk")(note_states)
            h = {**h, NOTE: jk}
        out = HeteroConv(
            self.hidden, self.edge_types, use_pallas=self.use_pallas,
            conv_impl=self.conv_impl, name="final"
        )(h, edge_index_dict)
        y = out[NOTE]
        if self.final_norm:
            y = l2_normalize(nn.relu(y))
        if self.final_dropout:
            # applies on BOTH paths: the knob is independent of final_norm
            # (ADVICE r3 — previously silently ignored with final_norm=False)
            y = nn.Dropout(self.dropout)(y, deterministic=deterministic)
        return y


def stack_edge_groups(
    edge_index_dict: Dict[EdgeType, jax.Array],
    edge_types: Tuple[EdgeType, ...],
    x_dict: Dict[str, jax.Array],
) -> Dict[Tuple[str, str], Tuple[jax.Array, Tuple[str, ...]]]:
    """Group relations by (src_type, dst_type) and stack their edge lists
    into one ``[R, 2, E_max]`` array per group (shorter relations padded with
    out-of-range ids, which gathers clamp and scatters drop).

    This is the relation-batching layout that lets :class:`HGTLayer` run ONE
    batched einsum + ONE gather per node-type pair instead of per relation —
    the edge-level formulation (the round-1 negative result ruled out
    node-level batching, commit d450f91; this pads edges, not nodes).
    """
    groups: Dict[Tuple[str, str], list] = {}
    for et in edge_types:
        src_t, _, dst_t = et
        if et not in edge_index_dict or src_t not in x_dict or dst_t not in x_dict:
            continue
        groups.setdefault((src_t, dst_t), []).append(et)
    out: Dict[Tuple[str, str], Tuple[jax.Array, Tuple[str, ...]]] = {}
    for (src_t, dst_t), ets in groups.items():
        e_max = max(edge_index_dict[et].shape[1] for et in ets)
        n_src = x_dict[src_t].shape[0]
        n_dst = x_dict[dst_t].shape[0]
        stacked = []
        for et in ets:
            ei = edge_index_dict[et]
            pad = e_max - ei.shape[1]
            src = jnp.pad(ei[0], (0, pad), constant_values=n_src)
            dst = jnp.pad(ei[1], (0, pad), constant_values=n_dst)
            stacked.append(jnp.stack([src, dst]))
        out[(src_t, dst_t)] = (
            jnp.stack(stacked),
            tuple(et[1] for et in ets),
        )
    return out


def node_type_offsets(
    x_dict: Dict[str, jax.Array]
) -> Tuple[Dict[str, int], int]:
    """Union-node-space offsets: node types concatenated in dict order."""
    offsets: Dict[str, int] = {}
    n_union = 0
    for t in x_dict:
        offsets[t] = n_union
        n_union += x_dict[t].shape[0]
    return offsets, n_union


def stack_edge_groups_emax(
    edge_index_dict: Dict[EdgeType, jax.Array],
    edge_types: Tuple[EdgeType, ...],
    x_dict: Dict[str, jax.Array],
) -> Tuple[Tuple[jax.Array, Tuple[EdgeType, ...]], ...]:
    """Bin ALL relations into union-node-space ``[R, 2, E_max]`` stacks by
    STATIC relation family instead of by (src_type, dst_type) pair.

    The round-2 negative result (docs/STATUS.md: 299.8 → 446.8 ms) ruled out
    ONE global stack — the beat/measure relations inherited the note-note
    relations' E_max and the padding exploded.  The permitted grain is
    *bounded padding*: three families whose members have comparable
    capacities on score graphs —

      g0  note↔note relations (onset/consecutive/during/rest + reverses)
      g1  cross-type relations (note↔beat, note↔measure, …)
      g2  same-type chains (beat→beat, measure→measure)

    — collapsing the eight (src,dst) pair groups to three stacks (~4× fewer
    gathers/einsums per layer on a dispatch-overhead-bound runtime) at the
    pair grouping's padding level (~42% padded rows on the bench workload).

    The family assignment and the in-group relation order depend ONLY on
    the edge-type metadata — never on live edge counts — so the parameter
    structure (``watt_g0`` …) is identical across sampled batches, eval
    graphs, and predict-time full graphs, and checkpoints restore anywhere.
    (A capacity-sorted binning was measurably tighter on padding — ~15 % —
    but makes the param tree a function of the input graph's shapes, which
    breaks checkpoint restore; rejected.)

    Edge ids are remapped to the union node space (src also marks padding
    with the union out-of-range id), so one gather from the concatenated
    q/k/v arrays serves every relation in a stack.
    """
    offsets, n_union = node_type_offsets(x_dict)
    rels = [
        et
        for et in edge_types
        if et in edge_index_dict and et[0] in x_dict and et[2] in x_dict
    ]

    def family(et: EdgeType) -> int:
        src_t, _, dst_t = et
        if src_t == NOTE and dst_t == NOTE:
            return 0
        if src_t != dst_t:
            return 1
        return 2

    groups_by_family: Dict[int, list] = {}
    for et in sorted(rels):  # canonical in-group order: edge-type tuple
        groups_by_family.setdefault(family(et), []).append(et)
    groups = [
        (max(edge_index_dict[et].shape[1] for et in ets), ets)
        for _fam, ets in sorted(groups_by_family.items())
    ]
    out = []
    for e_max, ets in groups:
        stacked = []
        for et in ets:
            src_t, _, dst_t = et
            ei = edge_index_dict[et]
            n_src = x_dict[src_t].shape[0]
            n_dst = x_dict[dst_t].shape[0]
            # remap to union ids; padding (src >= n_src) → union
            # out-of-range so scatters drop it, dst clamped for gathers
            src = jnp.where(
                ei[0] >= n_src, n_union, ei[0] + offsets[src_t]
            )
            dst = jnp.minimum(ei[1], n_dst - 1) + offsets[dst_t]
            pad = e_max - ei.shape[1]
            src = jnp.pad(src, (0, pad), constant_values=n_union)
            dst = jnp.pad(dst, (0, pad), constant_values=0)
            stacked.append(jnp.stack([src, dst]))
        out.append((jnp.stack(stacked), tuple(ets)))
    return tuple(out)


def _blockdiag_edge_transform(
    rows: jax.Array,  # [R, E, H·D] flat gathered rows
    w: jax.Array,  # [R, H, D, D] per-relation per-head transforms
    heads: int,
    h_dim: int,
) -> jax.Array:  # [R, E, H, D]
    """Per-edge typed transform as ONE r-batched flat matmul.

    Equivalent to ``einsum('rehd,rhdf->rehf', rows4d, w)`` but with the
    per-head [D, D] transforms embedded in a block-diagonal [H·D, H·D]
    weight, so neither operand carries a head batch axis.  The head-batched
    form forces head-major layouts on the gathered operand and XLA inserts
    per-head slice copies (the round-3 trace's 94.8% "data-formatting"
    bucket); this form costs H× the MXU FLOPs — free at 2.7% utilization —
    and zero layout traffic.  Measured 61.9 → 46.1 ms/step on the 3-layer
    HGT micro-bench (bench_queue/hgt_variants.json; loss bit-identical).
    """
    r, e, hd = rows.shape
    eye = jnp.eye(heads, dtype=w.dtype)
    wbd = jnp.einsum("gh,rhdf->rgdhf", eye, w).reshape(r, hd, hd)
    out = jnp.einsum("ref,rfg->reg", rows, wbd)
    return out.reshape(r, e, heads, h_dim)


def _blockdiag_kv_transform(
    rows: jax.Array,  # [R, E, 2·H·D] flat gathered (k ‖ v) rows
    w_att: jax.Array,  # [R, H, D, D]
    w_msg: jax.Array,  # [R, H, D, D]
    heads: int,
    h_dim: int,
) -> Tuple[jax.Array, jax.Array]:  # ([R, E, H, D], [R, E, H, D])
    """Both per-edge typed transforms in ONE r-batched matmul on rows
    gathered ONCE from a packed ``[N, 2·H·D]`` (k ‖ v) table.

    The k and v transforms of :class:`HGTLayer` consume the same edge
    index set; gathering them separately costs two E-row gather kernels
    and two matmul dispatches per group per layer.  Embedding the two
    block-diagonal ``[H·D, H·D]`` weights into one ``[2·H·D, 2·H·D]``
    block-diagonal costs 2× the (free, <3%-utilized) MXU FLOPs and halves
    both kernel counts — the round-5 HGT dispatch lever (the headline
    shape is dispatch-overhead-bound, docs/STATUS.md).  Values are
    identical to the separate transforms: the off-diagonal zero blocks
    contribute exact float zeros to each dot product."""
    r, e, hd2 = rows.shape
    hd = hd2 // 2
    eye2 = jnp.eye(2 * heads, dtype=w_att.dtype)
    w2 = jnp.concatenate([w_att, w_msg], axis=1)  # [R, 2H, D, D]
    wbd = jnp.einsum("gh,rhdf->rgdhf", eye2, w2).reshape(r, hd2, hd2)
    out = jnp.einsum("ref,rfg->reg", rows, wbd)
    out = out.reshape(r, e, 2, heads, h_dim)
    return out[:, :, 0], out[:, :, 1]


class HGTLayer(nn.Module):
    """Heterogeneous Graph Transformer layer, relation-batched.

    Typed multi-head attention: per-node-type Q/K/V projections, per-edge-type
    key/message transforms and priors; attention normalized per aggregating
    node over ALL its incoming typed edges (segment softmax across the
    concatenated edge set — the sparse softmax the reference delegates to
    pyg's HGTConv inside graphmuse HybridHGT).

    All relations sharing a (src_type, dst_type) pair are processed together:
    their per-relation [H, D, D] transforms live in one stacked [R, H, D, D]
    parameter consumed by a single batched einsum over the padded [R, E]
    edge stack — identical math to the per-relation loop with ~R× fewer
    kernel launches on the 7-relation note-note group.

    On the dispatch-overhead-bound tunnel runtime (≈1.6 ms per kernel —
    docs/STATUS.md) the remaining cost is kernel COUNT, so the layer also:

    - computes Q, K, V with ONE fused ``Dense(3·hidden)`` per node type
      (``qkv_{t}``) instead of three separate projections;
    - runs ONE segment softmax + aggregation over a **union node space**
      (all node types concatenated with offsets) instead of one per
      aggregating type — exact because segments of different types are
      disjoint id ranges (padded edges are remapped to the union
      out-of-range id so they still drop);
    - fuses the softmax denominator into the aggregation scatter: the
      unnormalized ``exp`` weights ride as extra channels of one packed
      ``segment_sum`` and the division happens at node level
      (``Σ m·e / Σ e`` ≡ ``Σ m·(e/Σe)``), saving one full scatter pass and
      two per-edge denominator gathers;
    - applies the per-relation K/V transforms as BLOCK-DIAGONAL
      ``[R, H·D, H·D]`` matmuls on flat ``[·, H·D]`` rows instead of
      head-batched ``[R,E,H,D]×[R,H,D,D]`` einsums.  The head-batched form
      makes XLA lay the gathered operands out head-major and insert 16
      per-head async slice copies per step — 94.8% of HGT device time was
      such data formatting (bench_queue/hgt_trace.json).  The block-diagonal
      form costs H× more MXU FLOPs (free at 2.7% MXU) and zero layout
      traffic: 61.9 → 46.1 ms/step on the 3-layer micro-bench
      (bench_queue/hgt_variants.json, value-identical loss).
    """

    hidden: int
    heads: int = 4
    edge_types: Tuple[EdgeType, ...] = ()
    group_mode: str = "pair"  # "pair" | "emax" (union-space capacity bins)
    # Fuse the union softmax/aggregation into ONE Pallas kernel
    # (kernels/pallas_segment.py::segment_softmax_agg_sorted).  Requires
    # group_mode="emax" AND sampler-sorted edges (SamplerConfig.
    # sort_edges_by_src), the same contract as the conv path's kernel.
    use_pallas: bool = False
    # "bfloat16" stages q/k/v + the edge transforms in bf16 (params and the
    # softmax/segment accumulation stay f32) — halves the gather/transform
    # HBM traffic that dominates HGT (bench_queue/hgt_trace.json).  The
    # 3-layer micro-bench reads 45.8 -> 41.7 ms/step with loss rel-err 2e-6
    # (bench_queue/hgt_variants.json v2-blockdiag vs v2-bf16).
    stage_dtype: str = "float32"
    # Softmax stabilizer: "segment" subtracts the exact per-aggregator max
    # (one segment_max scatter + one per-edge gather per layer); "global"
    # subtracts one per-head max over ALL edges — mathematically the same
    # softmax (any per-segment constant cancels in Σm·e/Σe), two fewer
    # E-row kernels per layer.  Safe while logits stay within ~±40 of the
    # global max (exp underflow at ≈88); the encoder's inter-layer L2
    # normalization bounds q·k well inside that.  Chip A/B (round 5,
    # bench_queue/encoders_r5.out): 762.9 → 899.5 K edges/s on the full
    # train step — DEFAULT since round 5; --hgt_softmax_stab segment
    # restores the exact per-segment subtraction.
    softmax_stab: str = "global"

    @nn.compact
    def __call__(
        self,
        x_dict: Dict[str, jax.Array],
        edge_index_dict: Dict[EdgeType, jax.Array],
        stacked_groups=None,
    ) -> Dict[str, jax.Array]:
        h_dim = self.hidden // self.heads
        node_types = tuple(x_dict.keys())
        if stacked_groups is None:
            stacked_groups = (
                stack_edge_groups_emax(edge_index_dict, self.edge_types, x_dict)
                if self.group_mode == "emax"
                else stack_edge_groups(edge_index_dict, self.edge_types, x_dict)
            )
        # q stays flat [N, H·D]; k and v ride PACKED as one [N, 2·H·D]
        # table so each group gathers them with ONE kernel and transforms
        # them with ONE block-diagonal matmul (_blockdiag_kv_transform)
        q: Dict[str, jax.Array] = {}
        kv: Dict[str, jax.Array] = {}
        st = jnp.bfloat16 if self.stage_dtype == "bfloat16" else None
        for t, x in x_dict.items():
            qkv = nn.Dense(3 * self.hidden, name=f"qkv_{t}")(x)
            if st is not None:
                qkv = qkv.astype(st)
            q[t] = qkv[:, : self.hidden]
            kv[t] = qkv[:, self.hidden :]
        # union node space: type offsets so ONE softmax/scatter serves all
        # aggregating types (segments are disjoint across types)
        offsets, n_union = node_type_offsets(x_dict)
        union_logits: list = []
        union_msgs: list = []
        union_segs: list = []
        if self.group_mode == "emax":
            # q/kv live in the union node space: ONE gather per operand per
            # stack serves every relation regardless of its (src,dst)
            # types; a padding row absorbs clamped out-of-range ids
            q_u = jnp.concatenate([q[t] for t in node_types] + [
                jnp.zeros((1, self.hidden), q[node_types[0]].dtype)
            ])
            kv_u = jnp.concatenate([kv[t] for t in node_types] + [
                jnp.zeros((1, 2 * self.hidden), q[node_types[0]].dtype)
            ])
            for gi, (idx, rels) in enumerate(stacked_groups):
                n_rel, _, e_max = idx.shape
                tag = f"g{gi}"
                w_att = self.param(
                    f"watt_{tag}",
                    nn.initializers.xavier_uniform(
                        in_axis=-2, out_axis=-1, batch_axis=(0, 1)
                    ),
                    (n_rel, self.heads, h_dim, h_dim),
                )
                w_msg = self.param(
                    f"wmsg_{tag}",
                    nn.initializers.xavier_uniform(
                        in_axis=-2, out_axis=-1, batch_axis=(0, 1)
                    ),
                    (n_rel, self.heads, h_dim, h_dim),
                )
                prior = self.param(
                    f"prior_{tag}", nn.initializers.ones, (n_rel, self.heads)
                )
                if st is not None:
                    w_att, w_msg, prior = (
                        w_att.astype(st), w_msg.astype(st), prior.astype(st)
                    )
                segs = idx[:, 0, :]  # [R, E] union aggregator (pad = n_union)
                dst_ids = idx[:, 1, :]  # [R, E] union info source (pad = 0)
                q_e = q_u[jnp.minimum(segs, n_union)].reshape(
                    *segs.shape, self.heads, h_dim
                )
                k_t, msg = _blockdiag_kv_transform(
                    kv_u[dst_ids], w_att, w_msg, self.heads, h_dim
                )
                logits = (q_e * k_t).sum(-1) * prior[:, None, :] / jnp.sqrt(h_dim)
                union_logits.append(logits.reshape(n_rel * e_max, self.heads))
                union_msgs.append(msg.reshape(n_rel * e_max, self.heads, h_dim))
                union_segs.append(segs.reshape(-1))
            stacked_pairs = ()
        else:
            stacked_pairs = stacked_groups.items()
        for (src_t, dst_t), (idx, rels) in stacked_pairs:
            n_rel, _, e_max = idx.shape
            tag = f"{src_t}__{dst_t}"
            w_att = self.param(
                f"watt_{tag}",
                nn.initializers.xavier_uniform(in_axis=-2, out_axis=-1, batch_axis=(0, 1)),
                (n_rel, self.heads, h_dim, h_dim),
            )
            w_msg = self.param(
                f"wmsg_{tag}",
                nn.initializers.xavier_uniform(in_axis=-2, out_axis=-1, batch_axis=(0, 1)),
                (n_rel, self.heads, h_dim, h_dim),
            )
            prior = self.param(f"prior_{tag}", nn.initializers.ones, (n_rel, self.heads))
            if st is not None:
                w_att, w_msg, prior = (
                    w_att.astype(st), w_msg.astype(st), prior.astype(st)
                )
            n_src = x_dict[src_t].shape[0]
            n_dst = x_dict[dst_t].shape[0]
            src_ids = idx[:, 0, :]  # [R, E] aggregator
            dst_ids = jnp.minimum(idx[:, 1, :], n_dst - 1)  # [R, E] info source
            q_e = q[src_t][jnp.minimum(src_ids, n_src - 1)].reshape(
                *src_ids.shape, self.heads, h_dim
            )
            k_t, msg = _blockdiag_kv_transform(
                kv[dst_t][dst_ids], w_att, w_msg, self.heads, h_dim
            )
            logits = (q_e * k_t).sum(-1) * prior[:, None, :] / jnp.sqrt(h_dim)
            # padded edges (src == n_src) map to the union out-of-range id
            segs = jnp.where(src_ids >= n_src, n_union, src_ids + offsets[src_t])
            union_logits.append(logits.reshape(n_rel * e_max, self.heads))
            union_msgs.append(msg.reshape(n_rel * e_max, self.heads, h_dim))
            union_segs.append(segs.reshape(-1))
        out: Dict[str, jax.Array] = {}
        if union_logits and self.use_pallas and self.group_mode == "emax":
            from analysisgnn_tpu.kernels.pallas_segment import (
                TILE_N,
                segment_softmax_agg_sorted,
            )

            logits = jnp.concatenate(union_logits, axis=0).astype(jnp.float32)
            msgs = jnp.concatenate(union_msgs, axis=0).astype(jnp.float32)
            # block-major sorted segment ids: every relation row of every
            # stack is one block (rows stay src-sorted from the sampler,
            # padding ids equal n_union < m so they sort last and land on a
            # dummy row that the [:n_union] slice removes)
            m = (n_union // TILE_N + 1) * TILE_N
            seg_parts = []
            block0 = 0
            for idx, _rels in stacked_groups:
                n_rel = idx.shape[0]
                blk = block0 + jnp.arange(n_rel, dtype=idx.dtype)[:, None]
                seg_parts.append((blk * m + idx[:, 0, :]).reshape(-1))
                block0 += n_rel
            seg_bm = jnp.concatenate(seg_parts)
            offs = jnp.searchsorted(
                seg_bm,
                jnp.arange(0, block0 * m + 1, TILE_N, dtype=seg_bm.dtype),
            ).astype(jnp.int32)
            agg_union = segment_softmax_agg_sorted(
                logits,
                msgs.reshape(-1, self.hidden),
                seg_bm,
                offs,
                m,
                block0,
                jax.default_backend() == "cpu",  # interpret off-TPU
            )[:n_union]
        elif union_logits:
            # softmax + segment accumulation stay f32 regardless of staging
            logits = jnp.concatenate(union_logits, axis=0).astype(jnp.float32)
            msgs = jnp.concatenate(union_msgs, axis=0).astype(jnp.float32)
            segs = jnp.concatenate(union_segs, axis=0)  # [Eu]
            if self.softmax_stab == "global":
                # one per-head max over all edges: same softmax (the
                # constant cancels in Σm·e/Σe), minus two E-row kernels
                gmax = jax.lax.stop_gradient(jnp.max(logits, axis=0))  # [H]
                expw = jnp.exp(logits - gmax)
            else:
                seg_max = jax.ops.segment_max(
                    logits, segs, num_segments=n_union
                )
                seg_max = jnp.where(jnp.isfinite(seg_max), seg_max, 0.0)
                expw = jnp.exp(
                    logits - seg_max[jnp.minimum(segs, n_union - 1)]
                )  # [Eu, H] unnormalized attention
            packed = jnp.concatenate(
                [(msgs * expw[..., None]).reshape(-1, self.hidden), expw], axis=-1
            )  # [Eu, hidden + H]
            summed = segment_sum(packed, segs, n_union)  # [Nu, hidden + H]
            num = summed[:, : self.hidden].reshape(n_union, self.heads, h_dim)
            den = jnp.maximum(summed[:, self.hidden :], 1e-16)  # [Nu, H]
            agg_union = (num / den[..., None]).reshape(n_union, self.hidden)
        if self.group_mode == "emax":
            aggregating = {
                et[0] for (_idx, rels) in stacked_groups for et in rels
            }
        else:
            aggregating = {src_t for (src_t, _dst_t) in stacked_groups}
        for t in node_types:
            n = x_dict[t].shape[0]
            if t in aggregating:
                agg = jax.lax.dynamic_slice_in_dim(agg_union, offsets[t], n, 0)
                upd = nn.Dense(self.hidden, name=f"out_{t}")(nn.gelu(agg))
                # gated residual (HGT skip); project the input when its width
                # differs from the hidden size (first layer on raw features)
                res = x_dict[t]
                if res.shape[-1] != self.hidden:
                    res = nn.Dense(self.hidden, name=f"res_{t}")(res)
                beta = self.param(f"skip_{t}", nn.initializers.ones, ())
                gate = jax.nn.sigmoid(beta)
                out[t] = gate * upd + (1 - gate) * res
            else:
                out[t] = x_dict[t]
        return out


class HybridHGT(nn.Module):
    """HGT encoder stack (reference HybridHGT selection,
    models/analysis.py:444-453)."""

    hidden: int
    num_layers: int = 3
    heads: int = 4
    dropout: float = 0.0
    use_jk: bool = True
    edge_types: Tuple[EdgeType, ...] = ()
    group_mode: str = "pair"  # see HGTLayer.group_mode
    use_pallas: bool = False  # see HGTLayer.use_pallas
    stage_dtype: str = "float32"  # see HGTLayer.stage_dtype
    softmax_stab: str = "global"  # see HGTLayer.softmax_stab (r5 default)

    @nn.compact
    def __call__(
        self,
        x_dict: Dict[str, jax.Array],
        edge_index_dict: Dict[EdgeType, jax.Array],
        batch_dict: Optional[Dict[str, jax.Array]] = None,
        deterministic: bool = True,
    ) -> jax.Array:
        h = dict(x_dict)
        note_states = []
        # relation-batched edge stacks are layer-invariant (node-type row
        # counts do not change across layers): build once
        stacked = (
            stack_edge_groups_emax(edge_index_dict, self.edge_types, x_dict)
            if self.group_mode == "emax"
            else stack_edge_groups(edge_index_dict, self.edge_types, x_dict)
        )
        for i in range(self.num_layers):
            h = HGTLayer(
                self.hidden, self.heads, self.edge_types,
                group_mode=self.group_mode, use_pallas=self.use_pallas,
                stage_dtype=self.stage_dtype,
                softmax_stab=self.softmax_stab,
                name=f"layer_{i}"
            )(h, edge_index_dict, stacked)
            h = {
                t: nn.Dropout(self.dropout)(v, deterministic=deterministic)
                for t, v in h.items()
            }
            note_states.append(h[NOTE])
        if self.use_jk:
            return LayerAttentionJK(self.hidden, name="jk")(note_states)
        return h[NOTE]


class MetricalConv(nn.Module):
    """Note ↔ metrical-node aggregation with a sequence model over the
    metrical axis (reference MetricalConvLayer, core/gnn.py:488-540, with
    LayerNorm in place of BatchNorm and a reset-mask BiGRU in place of
    pad/pack).

    ``seq_impl="assoc"`` (default) runs the metrical-axis recurrence as an
    associative-scan gated GRU (models/rnn.py::AssocBiGRU) — O(log M) depth
    instead of ~M sequential GRU cells, the round-2 fix for the MetricalGNN
    scan bottleneck; ``"scan"`` keeps the exact sequential GRU cell."""

    hidden: int
    out: int
    dropout: float = 0.0
    seq_impl: str = "assoc"  # "assoc" | "scan"

    @nn.compact
    def __call__(
        self,
        x_metrical: jax.Array,  # [M, F]
        x_notes: jax.Array,  # [N, F]
        note_to_metrical: jax.Array,  # [2, E]: row0 note ids, row1 metrical ids
        metrical_starts: jax.Array,  # [M] bool: new-graph starts
        deterministic: bool = True,
    ) -> Tuple[jax.Array, jax.Array]:
        from analysisgnn_tpu.models.rnn import AssocBiGRU

        m = x_metrical.shape[0]
        n = x_notes.shape[0]
        f = x_notes.shape[-1]
        h_neigh = nn.Dense(f, name="neigh")(x_notes)
        h_scatter = segment_sum(
            _gather(h_neigh, note_to_metrical[0]), note_to_metrical[1], m
        )
        z_s = jnp.concatenate([h_scatter, x_metrical], axis=-1)
        seq_cls = AssocBiGRU if self.seq_impl == "assoc" else BiResetGRU
        h_seq = seq_cls(f, name="seq")(h_scatter, metrical_starts)
        h = nn.Dense(self.out, name="out")(jnp.concatenate([z_s, h_seq], axis=-1))
        h = nn.relu(h)
        h = nn.LayerNorm()(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        out_notes = segment_sum(_gather(h, note_to_metrical[1]), note_to_metrical[0], n)
        return out_notes, h


class MetricalGNN(nn.Module):
    """Note convs interleaved with beat/measure aggregation (reference
    MetricalGNN, core/hgnn.py:323-433; graphmuse ``fast=True`` variant)."""

    hidden: int
    num_layers: int = 3
    dropout: float = 0.0
    use_jk: bool = True
    edge_types: Tuple[EdgeType, ...] = ()
    seq_impl: str = "assoc"  # metrical-axis recurrence (see MetricalConv)
    # fused-SAGE implementation for the note-level HeteroConv layers
    # ("node" | "edge" | "edge-zxp", models/fused.py) — same A/B surface as
    # HybridGNN so conv_impl benchmark arms measure what they claim
    # (ADVICE r4: previously silently ignored here)
    conv_impl: str = "node"

    def _note_edge_types(self):
        return tuple(e for e in self.edge_types if e[0] == NOTE and e[2] == NOTE)

    @nn.compact
    def __call__(
        self,
        x_dict: Dict[str, jax.Array],
        edge_index_dict: Dict[EdgeType, jax.Array],
        batch_dict: Optional[Dict[str, jax.Array]] = None,
        deterministic: bool = True,
    ) -> jax.Array:
        note_edges = {
            et: ei for et, ei in edge_index_dict.items() if et[0] == NOTE and et[2] == NOTE
        }
        x = x_dict[NOTE]
        use_beats = BEAT in x_dict and (NOTE, "connects", BEAT) in edge_index_dict
        use_measures = (
            MEASURE in x_dict and (NOTE, "connects", MEASURE) in edge_index_dict
        )
        # initial metrical states: scatter embedded note features
        if use_beats:
            nb = edge_index_dict[(NOTE, "connects", BEAT)]
            h_beat = segment_sum(
                _gather(nn.Dense(self.hidden, name="emb_beats")(x), nb[0]),
                nb[1],
                x_dict[BEAT].shape[0],
            )
            beat_starts = (
                segment_starts(batch_dict[BEAT])
                if batch_dict is not None and BEAT in batch_dict
                else jnp.zeros(x_dict[BEAT].shape[0], bool).at[0].set(True)
            )
        if use_measures:
            nm = edge_index_dict[(NOTE, "connects", MEASURE)]
            h_measure = segment_sum(
                _gather(nn.Dense(self.hidden, name="emb_measures")(x), nm[0]),
                nm[1],
                x_dict[MEASURE].shape[0],
            )
            measure_starts = (
                segment_starts(batch_dict[MEASURE])
                if batch_dict is not None and MEASURE in batch_dict
                else jnp.zeros(x_dict[MEASURE].shape[0], bool).at[0].set(True)
            )

        note_ets = self._note_edge_types()
        h = {NOTE: x}
        note_states = []
        for i in range(self.num_layers):
            if i > 0:
                parts = [h[NOTE]]
                if use_beats:
                    beat_msg, h_beat = MetricalConv(
                        self.hidden, self.hidden, self.dropout,
                        seq_impl=self.seq_impl, name=f"beat_conv_{i}"
                    )(h_beat, h[NOTE], nb, beat_starts, deterministic)
                    parts.append(beat_msg)
                if use_measures:
                    measure_msg, h_measure = MetricalConv(
                        self.hidden, self.hidden, self.dropout,
                        seq_impl=self.seq_impl, name=f"measure_conv_{i}"
                    )(h_measure, h[NOTE], nm, measure_starts, deterministic)
                    parts.append(measure_msg)
                if len(parts) > 1:
                    z = nn.Dense(self.hidden, name=f"project_metrical_{i}")(
                        jnp.concatenate(parts, axis=-1)
                    )
                    h = {NOTE: l2_normalize(nn.relu(z))}
            h = HeteroConv(self.hidden, note_ets, conv_impl=self.conv_impl,
                           name=f"layer_{i}")(h, note_edges)
            h = {NOTE: nn.Dropout(self.dropout)(
                nn.relu(l2_normalize(h[NOTE])), deterministic=deterministic
            )}
            note_states.append(h[NOTE])
        if self.use_jk:
            h = {NOTE: LayerAttentionJK(self.hidden, name="jk")(note_states)}
        out = HeteroConv(self.hidden, note_ets, conv_impl=self.conv_impl,
                         name="final")(h, note_edges)
        return out[NOTE]


ENCODERS: Dict[str, Callable] = {
    "hybridgnn": HybridGNN,
    "hgt": HybridHGT,
    "metricalgnn": MetricalGNN,
}
