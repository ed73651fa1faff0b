"""Static-shape heterogeneous score-graph container (a JAX pytree).

The reference system represents score graphs as PyG ``HeteroData`` objects with
dynamically-shaped per-edge-type index tensors (reference:
analysisgnn/utils/hgraph.py:16-128 ``HeteroScoreGraph`` and the graphmuse
``create_score_graph`` call sites, e.g. analysisgnn/data/data_utils.py:194).
Dynamic shapes are hostile to XLA: every new (piece, sample) would trigger a
recompile.  Here the graph is a frozen dataclass pytree in which

  * every node type owns a ``[N_max, F]`` feature array plus extra per-node
    integer arrays (labels, pitch spelling, onsets, ...),
  * every edge type owns a ``[2, E_max]`` int32 array; *padding edges point
    both endpoints one past the last valid node* (``num_nodes``), which makes
    ``jax.ops.segment_sum``-family ops drop them without any masking in the
    hot path (out-of-range segment ids contribute nothing),
  * validity is tracked with per-node counts so host code can recover masks.

Canonical node/edge vocabulary follows the reference semantics
(analysisgnn/utils/hgraph.py:214-300 for the four base note-note relations and
:41-73 for beat/measure virtual nodes; reverse relations mirror graphmuse's
``add_reverse_edges`` usage, analysisgnn/utils/hgraph.py:354-401).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Mapping, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# ---------------------------------------------------------------------------
# Canonical type vocabulary
# ---------------------------------------------------------------------------

NodeType = str
# Edge types are (src_node_type, relation, dst_node_type) triples, same schema
# as PyG metadata tuples consumed at reference models/analysis.py:580.
EdgeType = Tuple[str, str, str]

NOTE: NodeType = "note"
BEAT: NodeType = "beat"
MEASURE: NodeType = "measure"

NODE_TYPES: Tuple[NodeType, ...] = (NOTE, BEAT, MEASURE)

# The 4 base relations built by the score-graph builder + their reverses
# (onset is symmetric so it has no reverse type), plus metrical connectivity.
NOTE_EDGE_RELATIONS: Tuple[str, ...] = (
    "onset",
    "consecutive",
    "during",
    "rest",
    "consecutive_rev",
    "during_rev",
    "rest_rev",
)

NOTE_EDGE_TYPES: Tuple[EdgeType, ...] = tuple(
    (NOTE, rel, NOTE) for rel in NOTE_EDGE_RELATIONS
)

METRICAL_EDGE_TYPES: Tuple[EdgeType, ...] = (
    (NOTE, "connects", BEAT),
    (BEAT, "connects", NOTE),
    (BEAT, "next", BEAT),
    (NOTE, "connects", MEASURE),
    (MEASURE, "connects", NOTE),
    (MEASURE, "next", MEASURE),
)

ALL_EDGE_TYPES: Tuple[EdgeType, ...] = NOTE_EDGE_TYPES + METRICAL_EDGE_TYPES


def metadata(
    with_beats: bool = True, with_measures: bool = True
) -> Tuple[Tuple[NodeType, ...], Tuple[EdgeType, ...]]:
    """(node_types, edge_types) metadata tuple, PyG-style.

    Mirrors the metadata filtering in the reference datamodule
    (analysisgnn/data/datamodules/analysis.py:217-225 ``_process_graph_metadata``).
    """
    nodes = [NOTE]
    edges = list(NOTE_EDGE_TYPES)
    if with_beats:
        nodes.append(BEAT)
        edges += [e for e in METRICAL_EDGE_TYPES if BEAT in (e[0], e[2])]
    if with_measures:
        nodes.append(MEASURE)
        edges += [e for e in METRICAL_EDGE_TYPES if MEASURE in (e[0], e[2])]
    return tuple(nodes), tuple(edges)


def edge_type_key(et: EdgeType) -> str:
    """Flat string key for an edge type (usable as a pytree dict key)."""
    return "__".join(et)


def parse_edge_type_key(key: str) -> EdgeType:
    src, rel, dst = key.split("__")
    return (src, rel, dst)


# ---------------------------------------------------------------------------
# The pytree
# ---------------------------------------------------------------------------


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class HeteroGraph:
    """A (possibly batched/padded) heterogeneous score graph.

    Attributes
    ----------
    node_features:
        ``{node_type: [N_max, F] float array}``.
    edge_index:
        ``{edge_key: [2, E_max] int32}`` where ``edge_key`` is
        ``edge_type_key((src, rel, dst))``; row 0 = source ids, row 1 =
        destination ids.  Padding entries hold ``num_nodes[src]`` /
        ``num_nodes[dst]`` (one past the end) so segment ops ignore them.
    num_nodes:
        ``{node_type: [] int32}`` count of *valid* nodes per type.
    num_edges:
        ``{edge_key: [] int32}`` count of valid edges per type.
    node_attrs:
        ``{node_type: {name: [N_max, ...] array}}`` — labels, pitch_spelling,
        key_signature, onset_div, batch (graph id), validity masks, etc.
        Mirrors the per-node tensors the reference hangs off
        ``HeteroData["note"]`` (e.g. utils/dcl_tsv_utils.py:189-202).
    batch:
        ``{node_type: [N_max] int32}`` graph id of each node within a batch
        (all zeros for a single graph).
    num_target_nodes:
        [] int32 — number of *target* notes (they come first in node order),
        the static analog of PyG's ``batch["note"].batch_size``
        (reference models/analysis.py:949).
    """

    node_features: Dict[str, jax.Array]
    edge_index: Dict[str, jax.Array]
    num_nodes: Dict[str, jax.Array]
    num_edges: Dict[str, jax.Array]
    node_attrs: Dict[str, Dict[str, jax.Array]]
    batch: Dict[str, jax.Array]
    num_target_nodes: jax.Array

    # ----- convenience accessors ------------------------------------------

    @property
    def node_types(self) -> Tuple[str, ...]:
        return tuple(self.node_features.keys())

    @property
    def edge_types(self) -> Tuple[EdgeType, ...]:
        return tuple(parse_edge_type_key(k) for k in self.edge_index.keys())

    def edges(self, et: EdgeType) -> jax.Array:
        return self.edge_index[edge_type_key(et)]

    def capacity(self, node_type: str) -> int:
        """Static padded size N_max for a node type."""
        return self.node_features[node_type].shape[0]

    def edge_capacity(self, et: EdgeType) -> int:
        return self.edge_index[edge_type_key(et)].shape[1]

    def node_mask(self, node_type: str) -> jax.Array:
        n = self.capacity(node_type)
        return jnp.arange(n, dtype=jnp.int32) < self.num_nodes[node_type]

    def edge_mask(self, et: EdgeType) -> jax.Array:
        key = edge_type_key(et)
        e = self.edge_index[key].shape[1]
        return jnp.arange(e, dtype=jnp.int32) < self.num_edges[key]

    def target_mask(self) -> jax.Array:
        n = self.capacity(NOTE)
        return jnp.arange(n, dtype=jnp.int32) < self.num_target_nodes

    def x_dict(self) -> Dict[str, jax.Array]:
        return dict(self.node_features)

    def edge_index_dict(self) -> Dict[EdgeType, jax.Array]:
        return {parse_edge_type_key(k): v for k, v in self.edge_index.items()}

    # ----- constructors ----------------------------------------------------

    @staticmethod
    def from_numpy(
        node_features: Mapping[str, np.ndarray],
        edge_index: Mapping[EdgeType, np.ndarray],
        node_attrs: Optional[Mapping[str, Mapping[str, np.ndarray]]] = None,
        batch: Optional[Mapping[str, np.ndarray]] = None,
        num_target_nodes: Optional[int] = None,
        node_capacity: Optional[Mapping[str, int]] = None,
        edge_capacity: Optional[Mapping[EdgeType, int]] = None,
        to_device: bool = True,
    ) -> "HeteroGraph":
        """Build a padded graph from ragged host (numpy) arrays.

        ``node_capacity`` / ``edge_capacity`` give the static padded sizes;
        when omitted the exact sizes are used (useful for tests/whole-graph
        inference where a single compile is fine).

        ``to_device=False`` returns a numpy-leaf graph (the pytree structure
        is identical); the caller — e.g. a prefetch worker — then ships the
        whole batch with ONE ``jax.device_put``.  Padding uses preallocated
        zero buffers + slice assignment rather than ``np.pad`` (whose pad-area
        fill loop dominated batch-assembly time at training shapes).
        """

        def _padded(x: np.ndarray, cap: int) -> np.ndarray:
            n = x.shape[0]
            if cap == n:
                return np.ascontiguousarray(x)
            buf = np.zeros((cap,) + x.shape[1:], x.dtype)
            buf[:n] = x
            return buf

        node_attrs = node_attrs or {}
        nf: Dict[str, np.ndarray] = {}
        nn: Dict[str, np.ndarray] = {}
        na: Dict[str, Dict[str, np.ndarray]] = {}
        bt: Dict[str, np.ndarray] = {}
        for t, x in node_features.items():
            x = np.asarray(x)
            n = x.shape[0]
            cap = int(node_capacity[t]) if node_capacity else n
            if cap < n:
                raise ValueError(f"capacity {cap} < num nodes {n} for {t!r}")
            nf[t] = _padded(x, cap)
            nn[t] = np.int32(n)
            na[t] = {}
            for name, v in (node_attrs.get(t) or {}).items():
                na[t][name] = _padded(np.asarray(v), cap)
            if batch is not None and t in batch:
                b = np.full(cap, -1, np.int32)
                b[:n] = batch[t]
            else:
                b = np.zeros(cap, np.int32)
                b[n:] = -1
            bt[t] = b
        ei: Dict[str, np.ndarray] = {}
        ne: Dict[str, np.ndarray] = {}
        for et, idx in edge_index.items():
            idx = np.asarray(idx, np.int32).reshape(2, -1)
            e = idx.shape[1]
            cap = int(edge_capacity[et]) if edge_capacity else e
            if cap < e:
                raise ValueError(f"capacity {cap} < num edges {e} for {et!r}")
            src_t, _, dst_t = et
            # padding edges point one past the PADDED node array so they are
            # always detectable (id >= x.shape[0]); gathers clip them onto a
            # zero padding row, scatters drop them.  (Using the real node
            # count here would be indistinguishable from a real id whenever
            # real < capacity.)
            fill_src = int(node_capacity[src_t]) if node_capacity else node_features[src_t].shape[0]
            fill_dst = int(node_capacity[dst_t]) if node_capacity else node_features[dst_t].shape[0]
            padded = np.empty((2, cap), np.int32)
            padded[:, :e] = idx
            padded[0, e:] = fill_src
            padded[1, e:] = fill_dst
            key = edge_type_key(et)
            ei[key] = padded
            ne[key] = np.int32(e)
        ntn = (
            np.int32(num_target_nodes)
            if num_target_nodes is not None
            else np.int32(node_features[NOTE].shape[0]) if NOTE in node_features else np.int32(0)
        )
        g = HeteroGraph(
            node_features=nf,
            edge_index=ei,
            num_nodes=nn,
            num_edges=ne,
            node_attrs=na,
            batch=bt,
            num_target_nodes=ntn,
        )
        if to_device:
            g = jax.device_put(g)  # ONE batched transfer for all leaves
        return g

    def replace(self, **kwargs: Any) -> "HeteroGraph":
        return dataclasses.replace(self, **kwargs)
