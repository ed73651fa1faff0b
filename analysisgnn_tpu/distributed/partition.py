"""Graph-partition parallelism: contiguous edge partitioning + halo exchange.

The reference has no long-context machinery; it bounds receptive fields by
subgraph sampling (SURVEY §5.7).  At pod scale this framework instead
partitions a (huge) score graph *contiguously in onset time* across the mesh
axis ``graph`` — score-graph relations (onset/consecutive/during/rest) are
temporally local, so every cross-partition edge lands within a bounded halo
of the cut, and one ``ppermute`` neighbor exchange per GNN layer makes the
partitioned computation EXACT (BASELINE.json north star: boundary exchange
overlapped with local aggregation; the overlap is left to XLA's scheduler
here, with Pallas async remote copies as the planned round-2 upgrade).

Layout per device (static): ``[H | N_local | H]`` — left halo, owned nodes,
right halo.  Per-partition edge lists are precomputed on the host with
destinations relabeled into this extended coordinate system; edges whose
source is not owned are dropped (they are owned — and computed — by the
neighbor that owns their source).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from analysisgnn_tpu.core.graph import EdgeType, NOTE


@dataclasses.dataclass
class PartitionedGraph:
    """Host-built partition plan: everything stacked on a leading device axis."""

    x: np.ndarray  # [D, N_local, F] owned node features
    edge_src: Dict[EdgeType, np.ndarray]  # [D, E_max] local src (0..N_local)
    edge_dst: Dict[EdgeType, np.ndarray]  # [D, E_max] extended dst (0..N_ext)
    num_local: int
    halo: int

    @property
    def num_devices(self) -> int:
        return self.x.shape[0]

    @property
    def n_ext(self) -> int:
        return self.num_local + 2 * self.halo


def partition_graph(
    x: np.ndarray,
    edges: Dict[EdgeType, np.ndarray],
    num_devices: int,
    halo: Optional[int] = None,
) -> PartitionedGraph:
    """Contiguously partition ``n`` nodes into ``num_devices`` chunks.

    ``halo`` defaults to the maximum edge span (guaranteeing exactness);
    an explicit smaller halo trades exactness for memory.
    """
    n, f = x.shape
    n_local = -(-n // num_devices)  # ceil
    n_pad = n_local * num_devices
    x_pad = np.zeros((n_pad, f), x.dtype)
    x_pad[:n] = x
    if halo is None:
        span = 1
        for ei in edges.values():
            if ei.shape[1]:
                span = max(span, int(np.abs(ei[1] - ei[0]).max()))
        halo = min(span, n_local)
    halo = int(halo)

    x_parts = x_pad.reshape(num_devices, n_local, f)
    edge_src: Dict[EdgeType, List[np.ndarray]] = {}
    edge_dst: Dict[EdgeType, List[np.ndarray]] = {}
    # per device: edges owned by src ∈ [d·n_local, (d+1)·n_local) and
    # dst within halo distance
    for et, ei in edges.items():
        per_src: List[np.ndarray] = []
        per_dst: List[np.ndarray] = []
        for d in range(num_devices):
            lo, hi = d * n_local, (d + 1) * n_local
            own = (ei[0] >= lo) & (ei[0] < hi)
            dst_ok = (ei[1] >= lo - halo) & (ei[1] < hi + halo)
            keep = own & dst_ok
            per_src.append(ei[0][keep] - lo)
            # extended coords: dst - (lo - halo)
            per_dst.append(ei[1][keep] - (lo - halo))
        e_max = max(len(s) for s in per_src) if per_src else 0
        src_arr = np.full((num_devices, max(e_max, 1)), n_local, np.int32)
        dst_arr = np.full((num_devices, max(e_max, 1)), n_local + 2 * halo, np.int32)
        for d in range(num_devices):
            src_arr[d, : len(per_src[d])] = per_src[d]
            dst_arr[d, : len(per_dst[d])] = per_dst[d]
        edge_src[et] = src_arr
        edge_dst[et] = dst_arr
    return PartitionedGraph(
        x=x_parts, edge_src=edge_src, edge_dst=edge_dst,
        num_local=n_local, halo=halo,
    )


def halo_exchange(x_local: jax.Array, halo: int, axis: str) -> jax.Array:
    """[N_local, F] → [H + N_local + H, F] with neighbor halos via ppermute.

    Boundary devices receive zeros (ppermute drops unmatched links), which is
    correct: no nodes exist beyond the ends.
    """
    d = jax.lax.axis_size(axis)
    right_edge = x_local[-halo:]  # my tail → right neighbor's left halo
    left_edge = x_local[:halo]  # my head → left neighbor's right halo
    left_halo = jax.lax.ppermute(
        right_edge, axis, [(i, i + 1) for i in range(d - 1)]
    )
    right_halo = jax.lax.ppermute(
        left_edge, axis, [(i + 1, i) for i in range(d - 1)]
    )
    return jnp.concatenate([left_halo, x_local, right_halo], axis=0)


def partitioned_sage_layer(
    x_local: jax.Array,  # [N_local, F]
    edge_src: Dict[EdgeType, jax.Array],  # [E] local src
    edge_dst: Dict[EdgeType, jax.Array],  # [E] extended dst
    params: Dict,  # per-relation {w_neigh, w_self, w_agg, b}
    halo: int,
    axis: str,
) -> jax.Array:
    """One exact SAGE layer over the partitioned graph (mean over relations).

    The halo exchange ships RAW neighbor features; each device then computes
    messages for edges it owns — identical math to the unpartitioned layer.
    """
    from analysisgnn_tpu.kernels.segment_ops import segment_sum

    x_ext = halo_exchange(x_local, halo, axis)
    n_local = x_local.shape[0]
    n_ext = x_ext.shape[0]
    outs = []
    for et in sorted(edge_src.keys()):
        p = params[et[1]]
        h_ext = x_ext @ p["w_neigh"] + p["b_neigh"]
        msgs = h_ext[jnp.minimum(edge_dst[et], n_ext - 1)]
        seg = edge_src[et]
        sums = segment_sum(msgs, seg, n_local)
        counts = segment_sum(jnp.ones_like(seg, jnp.float32), seg, n_local)
        agg = (x_local + sums) / jnp.maximum(counts, 1.0)[:, None]
        outs.append(x_local @ p["w_self"] + agg @ p["w_agg"] + p["b_out"])
    return jnp.mean(jnp.stack(outs), axis=0)


def make_partitioned_forward(
    relations: Sequence[EdgeType],
    num_layers: int,
    mesh: Mesh,
    axis: str = "data",
):
    """Build a shard_mapped L-layer SAGE forward over the partition axis."""
    from jax import shard_map

    def forward(x_parts, edge_src, edge_dst, params_per_layer, halo):
        def local_fn(x_l, es, ed):
            h = x_l[0]  # shard_map gives [1, N_local, F] per device slot
            es = {k: v[0] for k, v in es.items()}
            ed = {k: v[0] for k, v in ed.items()}
            for li in range(num_layers):
                h = partitioned_sage_layer(
                    h, es, ed, params_per_layer[li], halo, axis
                )
                h = jax.nn.relu(h)
            return h[None]

        spec_x = P(axis, None, None)
        spec_e = {k: P(axis, None) for k in edge_src}
        out = shard_map(
            local_fn,
            mesh=mesh,
            in_specs=(spec_x, spec_e, spec_e),
            out_specs=spec_x,
        )(x_parts, edge_src, edge_dst)
        return out

    return forward
