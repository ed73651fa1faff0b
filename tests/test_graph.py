"""HeteroGraph pytree: padding, masks, pytree-ness."""

import jax
import numpy as np

from analysisgnn_tpu.core.graph import HeteroGraph, edge_type_key, metadata


def small_graph(cap_n=None, cap_e=None):
    nf = {"note": np.arange(12, dtype=np.float32).reshape(4, 3)}
    ei = {("note", "onset", "note"): np.array([[0, 1, 2], [1, 0, 3]], np.int32)}
    attrs = {"note": {"pitch_spelling": np.array([5, 6, 7, 8], np.int64)}}
    return HeteroGraph.from_numpy(
        nf,
        ei,
        node_attrs=attrs,
        num_target_nodes=2,
        node_capacity={"note": cap_n} if cap_n else None,
        edge_capacity={("note", "onset", "note"): cap_e} if cap_e else None,
    )


def test_padding_and_masks():
    g = small_graph(cap_n=6, cap_e=8)
    assert g.capacity("note") == 6
    assert g.edge_capacity(("note", "onset", "note")) == 8
    nm = np.asarray(g.node_mask("note"))
    assert nm.tolist() == [True] * 4 + [False] * 2
    em = np.asarray(g.edge_mask(("note", "onset", "note")))
    assert em.tolist() == [True] * 3 + [False] * 5
    # padding edges point one past the PADDED array (== capacity) for both
    # ends, so id >= x.shape[0] always identifies padding
    ei = np.asarray(g.edge_index[edge_type_key(("note", "onset", "note"))])
    assert (ei[:, 3:] == 6).all()
    tm = np.asarray(g.target_mask())
    assert tm.tolist() == [True, True, False, False, False, False]


def test_pytree_roundtrip():
    g = small_graph(cap_n=6, cap_e=8)
    leaves, treedef = jax.tree_util.tree_flatten(g)
    g2 = jax.tree_util.tree_unflatten(treedef, leaves)
    assert isinstance(g2, HeteroGraph)
    np.testing.assert_array_equal(
        np.asarray(g.node_features["note"]), np.asarray(g2.node_features["note"])
    )


def test_jit_through_graph():
    g = small_graph(cap_n=6, cap_e=8)

    @jax.jit
    def f(graph):
        return graph.node_features["note"].sum()

    assert float(f(g)) == float(np.arange(12).sum())


def test_metadata():
    nodes, edges = metadata(with_beats=True, with_measures=False)
    assert "beat" in nodes and "measure" not in nodes
    assert all("measure" not in e for e in edges)
    nodes, edges = metadata(False, False)
    assert nodes == ("note",)
    assert len(edges) == 7
