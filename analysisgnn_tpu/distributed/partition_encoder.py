"""Graph-partition parallelism for the PRODUCTION model (round-2 upgrade of
distributed/partition.py's standalone SAGE demo).

Two regimes, both exact for the owned rows:

1. **Overlap-region inference** (`make_partitioned_encode`): partition the
   note axis contiguously with a halo of ``L_total × max_edge_span`` raw
   input features per side, then run the STOCK ``AnalysisGNN.encode`` —
   unchanged flax module, real trained params — independently per shard via
   ``shard_map`` and slice the owned rows.  The L-layer receptive field of
   every owned node lies inside the window, so the result equals the
   full-graph forward exactly (tests/test_partition_encoder.py).  Zero
   inter-device communication at runtime; the cost is redundant halo
   compute, ratio ``2·L·span/N_local`` (negligible for corpus-scale
   graphs).  This is the TPU analog of the reference's test-time
   near-full-graph evaluation (datamodules/analysis.py:310-324) scaled past
   one chip's HBM.

2. **Per-layer halo exchange** (`partitioned_fused_sage_forward`): halo =
   one edge span; each layer re-exchanges its input activations with the
   two onset-order neighbors (``ppermute`` over ICI — or the Pallas
   async-remote-copy kernel in kernels/halo.py on real multi-chip
   hardware), then applies the SAME math as the production fused hetero
   SAGE layer (models/fused.py::FusedHeteroSage) *consuming the trained
   HybridGNN parameter tree directly*.  Communication per layer is
   ``2·span·F`` per device and overlaps with the interior aggregation —
   the communication-bound regime for deep stacks / small shards.

Both build on the contiguous-in-onset partition: score-graph relations
(onset/consecutive/during/rest and reverses) are temporally local, so edge
spans are bounded (SURVEY §2.4 CP row; reference has no such machinery).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from analysisgnn_tpu.core.graph import EdgeType, NOTE
from analysisgnn_tpu.kernels.segment_ops import segment_sum


# ---------------------------------------------------------------------------
# Regime 1: overlap-region partition of the stock model
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class FullGraphPartition:
    """Host-built plan for the overlap-region regime: per-device extended
    windows (owned + halo) of the full-graph inputs, stacked on axis 0."""

    x: np.ndarray  # [D, N_ext, F]
    pitch_spelling: np.ndarray  # [D, N_ext]
    key_signature: np.ndarray  # [D, N_ext]
    edge_index: Dict[EdgeType, np.ndarray]  # [D, 2, E_max] extended coords
    num_local: int
    halo: int
    num_nodes: int  # original N (for unpadding)

    @property
    def num_devices(self) -> int:
        return self.x.shape[0]

    @property
    def n_ext(self) -> int:
        return self.num_local + 2 * self.halo


def max_edge_span(edges: Dict[EdgeType, np.ndarray]) -> int:
    span = 1
    for ei in edges.values():
        if ei.shape[1]:
            span = max(span, int(np.abs(ei[1].astype(np.int64) - ei[0]).max()))
    return span


def partition_full_graph(
    x: np.ndarray,
    pitch_spelling: np.ndarray,
    key_signature: np.ndarray,
    edges: Dict[EdgeType, np.ndarray],
    num_devices: int,
    num_message_hops: int,
    halo: Optional[int] = None,
) -> FullGraphPartition:
    """Contiguous partition with ``num_message_hops × span`` halos.

    ``num_message_hops`` must cover every message-passing step of the model
    that consumes the result (GNN layers + final conv + onset pooling).
    """
    n, f = x.shape
    n_local = -(-n // num_devices)
    if halo is None:
        halo = num_message_hops * max_edge_span(edges)
    halo = int(min(halo, n_local * num_devices))
    n_ext = n_local + 2 * halo

    xs, pss, kss = [], [], []
    for d in range(num_devices):
        lo = d * n_local - halo
        idx = np.arange(lo, lo + n_ext)
        valid = (idx >= 0) & (idx < n)
        ci = np.clip(idx, 0, n - 1)
        xs.append(np.where(valid[:, None], x[ci], 0.0).astype(x.dtype))
        pss.append(np.where(valid, pitch_spelling[ci], 0))
        kss.append(np.where(valid, key_signature[ci], 0))

    edge_index: Dict[EdgeType, np.ndarray] = {}
    per_dev: Dict[EdgeType, list] = {et: [] for et in edges}
    for et, ei in edges.items():
        for d in range(num_devices):
            lo = d * n_local - halo
            hi = lo + n_ext
            keep = (ei[0] >= lo) & (ei[0] < hi) & (ei[1] >= lo) & (ei[1] < hi)
            per_dev[et].append(ei[:, keep] - lo)
    for et in edges:
        e_max = max(max(e.shape[1] for e in per_dev[et]), 1)
        arr = np.full((num_devices, 2, e_max), n_ext, np.int32)
        for d, e in enumerate(per_dev[et]):
            arr[d, :, : e.shape[1]] = e
        edge_index[et] = arr

    return FullGraphPartition(
        x=np.stack(xs),
        pitch_spelling=np.stack(pss).astype(np.int32),
        key_signature=np.stack(kss).astype(np.int32),
        edge_index=edge_index,
        num_local=n_local,
        halo=halo,
        num_nodes=n,
    )


def make_partitioned_encode(model, mesh: Mesh, axis: str = "graph"):
    """shard_mapped full-graph ``AnalysisGNN.encode`` over the partition.

    Returns ``fn(params, part: FullGraphPartition) -> [D, N_local, F_out]``;
    rows past ``part.num_nodes`` (tail padding of the last device) are
    garbage and must be dropped by the caller (`unpartition`).
    """
    from jax import shard_map

    def local_fn(params, x, ps, ks, edge_index):
        x, ps, ks = x[0], ps[0], ks[0]
        ei = {et: v[0] for et, v in edge_index.items()}
        n_ext = x.shape[0]
        batch = {NOTE: jnp.zeros(n_ext, jnp.int32)}
        out = model.apply(
            params,
            {NOTE: x},
            ei,
            batch,
            ps,
            ks,
            jnp.asarray(n_ext, jnp.int32),
            method=model.encode,
            deterministic=True,
        )
        return out[None]

    def fn(params, part: FullGraphPartition):
        spec_e = {et: P(axis, None, None) for et in part.edge_index}
        out = shard_map(
            lambda x, ps, ks, ei: local_fn(params, x, ps, ks, ei),
            mesh=mesh,
            in_specs=(P(axis, None, None), P(axis, None), P(axis, None), spec_e),
            out_specs=P(axis, None, None),
        )(
            jnp.asarray(part.x),
            jnp.asarray(part.pitch_spelling),
            jnp.asarray(part.key_signature),
            {et: jnp.asarray(v) for et, v in part.edge_index.items()},
        )
        # slice owned rows per device
        return out[:, part.halo : part.halo + part.num_local]

    return fn


def unpartition(owned: jax.Array, part: FullGraphPartition) -> jax.Array:
    """[D, N_local, F] → [N, F] dropping tail padding."""
    d, n_local, f = owned.shape
    return owned.reshape(d * n_local, f)[: part.num_nodes]


# ---------------------------------------------------------------------------
# Regime 2: per-layer halo exchange driving the trained HybridGNN params
# ---------------------------------------------------------------------------


def halo_pull(x_local: jax.Array, halo: int, axis: str) -> jax.Array:
    """[N_local, F] → [2H, F]: left-neighbor tail ‖ right-neighbor head.

    Boundary devices receive zeros (ppermute drops unmatched links) —
    correct, no nodes exist beyond the ends.
    """
    d = jax.lax.axis_size(axis)
    left = jax.lax.ppermute(
        x_local[-halo:], axis, [(i, i + 1) for i in range(d - 1)]
    )
    right = jax.lax.ppermute(
        x_local[:halo], axis, [(i + 1, i) for i in range(d - 1)]
    )
    return jnp.concatenate([left, right], axis=0)


def _fused_sage_from_params(
    p: Dict,
    x_own: jax.Array,  # [N_local, F] owned activations
    halos: jax.Array,  # [2H, F] exchanged halo activations
    edge_src: Dict[EdgeType, jax.Array],  # [E] local coords (owned)
    edge_dst: Dict[EdgeType, jax.Array],  # [E] extended coords
    relations: Sequence[EdgeType],
    halo: int,
) -> jax.Array:
    """One production hetero-SAGE layer evaluated from the trained
    ``fused_note`` parameter stack (models/fused.py::FusedHeteroSage math:
    mean-with-base aggregation, concat-free two-matmul output, mean over
    relations) on the partitioned coordinates.

    Edges are split into *interior* (neighbor owned locally) and *boundary*
    (neighbor in a halo) so the interior transform+gather+scatter — the bulk
    of the layer — is data-independent of the exchange: XLA's scheduler
    overlaps the async collective-permute with it (the BASELINE north-star
    overlap, expressed at the XLA level; kernels/halo.py provides the
    explicit Pallas async-remote-copy variant for multi-chip hardware).
    """
    w_neigh = p["w_neigh"]  # [T, F, F]
    b_neigh = p["b_neigh"]  # [T, 1, F]
    w_self = p["w_self"]  # [T, F, G]
    w_agg = p["w_agg"]  # [T, F, G]
    b_out = p["b_out"]  # [T, 1, G]
    n_local = x_own.shape[0]
    # independent of the exchange → overlaps with it
    h_own = jnp.einsum("nf,tfg->tng", x_own, w_neigh) + b_neigh  # [T, NL, F]
    # depends on the exchange (tiny: [T, 2H, F])
    h_halo = jnp.einsum("hf,tfg->thg", halos, w_neigh) + b_neigh
    outs = []
    for t, et in enumerate(relations):
        src, dst = edge_src[et], edge_dst[et]
        is_int = (dst >= halo) & (dst < halo + n_local)
        # interior edges: gather from h_own, scatter into owned rows
        s_int = jnp.where(is_int, src, n_local)
        d_int = jnp.minimum(jnp.where(is_int, dst - halo, 0), n_local - 1)
        sums = segment_sum(h_own[t][d_int], s_int, n_local)
        # boundary edges: gather from the halo rows ([0,H) left, [H,2H) right)
        s_bnd = jnp.where(is_int, n_local, src)
        d_bnd = jnp.where(dst < halo, dst, dst - n_local)
        d_bnd = jnp.minimum(jnp.where(is_int, 0, d_bnd), 2 * halo - 1)
        sums = sums + segment_sum(h_halo[t][d_bnd], s_bnd, n_local)
        counts = segment_sum(jnp.ones_like(src, jnp.float32), src, n_local)
        agg = (x_own + sums) / jnp.maximum(counts, 1.0)[:, None]
        outs.append(x_own @ w_self[t] + agg @ w_agg[t] + b_out[t, 0])
    return jnp.mean(jnp.stack(outs), axis=0)


def _l2n(x):
    return x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12)


def partitioned_hybridgnn_forward(
    encoder_params: Dict,
    x_local: jax.Array,  # [N_local, F] owned input activations
    edge_src: Dict[EdgeType, jax.Array],
    edge_dst: Dict[EdgeType, jax.Array],
    relations: Sequence[EdgeType],
    num_layers: int,
    halo: int,
    axis: str,
    use_jk: bool,
    hidden: int,
) -> jax.Array:
    """Exact HybridGNN encoder forward on one shard with a ppermute halo
    exchange before EVERY message-passing layer, consuming the trained
    parameter tree of models/encoders.py::HybridGNN (fused path).

    Matches ``HybridGNN.__call__``: L × (fused hetero SAGE → relu → l2norm)
    with optional LayerAttentionJK, then a final conv.
    """
    from analysisgnn_tpu.models.rnn import LayerAttentionJK

    h = x_local
    note_states = []
    for i in range(num_layers):
        halos = halo_pull(h, halo, axis)
        h = _fused_sage_from_params(
            encoder_params[f"layer_{i}"]["fused_note"],
            h, halos, edge_src, edge_dst, relations, halo,
        )
        h = _l2n(jax.nn.relu(h))
        note_states.append(h)
    if use_jk:
        jk = LayerAttentionJK(hidden, name="jk")
        h = jk.apply({"params": encoder_params["jk"]}, note_states)
    halos = halo_pull(h, halo, axis)
    return _fused_sage_from_params(
        encoder_params["final"]["fused_note"],
        h, halos, edge_src, edge_dst, relations, halo,
    )


def make_partitioned_fused_sage(
    relations: Sequence[EdgeType],
    num_layers: int,
    mesh: Mesh,
    axis: str = "graph",
    use_jk: bool = False,
    hidden: int = 256,
):
    """shard_mapped regime-2 forward.

    ``fn(encoder_params, x_parts [D,N_local,F], edge_src {et:[D,E]},
    edge_dst {et:[D,E]}, halo) -> [D, N_local, G]``.

    Edge arrays come from distributed/partition.py::partition_graph (halo =
    one edge span; src local coords, dst extended coords).
    """
    from jax import shard_map

    def fn(encoder_params, x_parts, edge_src, edge_dst, halo):
        def local_fn(x, es, ed):
            out = partitioned_hybridgnn_forward(
                encoder_params,
                x[0],
                {k: v[0] for k, v in es.items()},
                {k: v[0] for k, v in ed.items()},
                relations,
                num_layers,
                halo,
                axis,
                use_jk,
                hidden,
            )
            return out[None]

        spec_e = {k: P(axis, None) for k in edge_src}
        return shard_map(
            local_fn,
            mesh=mesh,
            in_specs=(P(axis, None, None), spec_e, spec_e),
            out_specs=P(axis, None, None),
        )(x_parts, edge_src, edge_dst)

    return fn
