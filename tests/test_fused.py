"""Fused multi-relation SAGE == T independent SageConvs (exact parity)."""

import numpy as np
import jax
import jax.numpy as jnp

from analysisgnn_tpu.models.conv import SageConv
from analysisgnn_tpu.models.fused import FusedHeteroSage, stack_relations


def test_fused_matches_independent_convs():
    rng = np.random.default_rng(0)
    n, f, g, t = 20, 8, 12, 3
    x = jnp.asarray(rng.normal(size=(n, f)), jnp.float32)
    edges = []
    for _ in range(t):
        e = rng.integers(0, n, size=(2, 15)).astype(np.int32)
        # add a padding edge per relation (one-past-the-end convention)
        e = np.concatenate([e, np.full((2, 2), n, np.int32)], axis=1)
        edges.append(jnp.asarray(e))

    fused = FusedHeteroSage(g, t)
    src = jnp.concatenate([e[0] for e in edges])
    dst = jnp.concatenate([e[1] for e in edges])
    rel = jnp.concatenate(
        [jnp.full(e.shape[1], i, jnp.int32) for i, e in enumerate(edges)]
    )
    fparams = fused.init(jax.random.PRNGKey(0), x, src, dst, rel)

    # copy fused params into T separate SageConvs
    fp = fparams["params"]
    outs = []
    for i in range(t):
        conv = SageConv(g)
        cp = {
            "params": {
                "neigh": {
                    "kernel": fp["w_neigh"][i],
                    "bias": fp["b_neigh"][i, 0],
                },
                "out": {
                    "kernel": jnp.concatenate([fp["w_self"][i], fp["w_agg"][i]], 0),
                    "bias": fp["b_out"][i, 0],
                },
            }
        }
        outs.append(conv.apply(cp, x, edges[i]))
    want = jnp.stack(outs, 0)
    got = fused.apply(fparams, x, src, dst, rel)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-5)


def test_stack_relations_shapes():
    ei = {
        ("note", "a", "note"): jnp.zeros((2, 5), jnp.int32),
        ("note", "b", "note"): jnp.ones((2, 3), jnp.int32),
    }
    src, dst, rel = stack_relations(ei, list(ei.keys()))
    assert src.shape == (8,)
    assert rel.tolist() == [0] * 5 + [1] * 3


def test_fused_pallas_flag_equivalence():
    """use_pallas=True (src-sorted edges) must match the XLA path exactly —
    forward AND gradients — including padding edges (id = n)."""
    rng = np.random.default_rng(1)
    n, f, t = 24, 16, 3
    x = jnp.asarray(rng.normal(size=(n, f)), jnp.float32)
    srcs, dsts, rels = [], [], []
    for r in range(t):
        e = rng.integers(0, n, size=(2, 17)).astype(np.int32)
        e = e[:, np.argsort(e[0], kind="stable")]  # src-sorted
        e = np.concatenate([e, np.full((2, 3), n, np.int32)], axis=1)  # padding last
        srcs.append(e[0]); dsts.append(e[1])
        rels.append(np.full(e.shape[1], r, np.int32))
    src = jnp.asarray(np.concatenate(srcs))
    dst = jnp.asarray(np.concatenate(dsts))
    rel = jnp.asarray(np.concatenate(rels))

    ref = FusedHeteroSage(12, t)
    pal = FusedHeteroSage(12, t, use_pallas=True)
    params = ref.init(jax.random.PRNGKey(0), x, src, dst, rel)

    out_ref = ref.apply(params, x, src, dst, rel)
    out_pal = pal.apply(params, x, src, dst, rel)
    np.testing.assert_allclose(
        np.asarray(out_ref), np.asarray(out_pal), rtol=1e-5, atol=1e-5
    )

    def loss(mod, p, xx):
        return (mod.apply(p, xx, src, dst, rel) ** 2).sum()

    g_ref = jax.grad(lambda p: loss(ref, p, x))(params)
    g_pal = jax.grad(lambda p: loss(pal, p, x))(params)
    for a, b in zip(jax.tree_util.tree_leaves(g_ref), jax.tree_util.tree_leaves(g_pal)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)
    gx_ref = jax.grad(lambda xx: loss(ref, params, xx))(x)
    gx_pal = jax.grad(lambda xx: loss(pal, params, xx))(x)
    np.testing.assert_allclose(
        np.asarray(gx_ref), np.asarray(gx_pal), rtol=1e-4, atol=1e-5
    )


def test_sampler_sort_edges_by_src():
    """sort_edges_by_src emits every relation ascending by src with padding
    (id = capacity) last — the Pallas kernel's required order."""
    from analysisgnn_tpu.data.note_array import synthetic_score
    from analysisgnn_tpu.data.corpus import samples_from_note_array
    from analysisgnn_tpu.data.sampler import SamplerConfig, SubgraphSampler

    samples = samples_from_note_array(
        synthetic_score(num_notes=60, seed=0), add_beats=False, add_measures=False
    )
    cfg = SamplerConfig(subgraph_size=24, batch_size=2, sort_edges_by_src=True)
    batch = SubgraphSampler(samples * 2, cfg).sample_batch([0, 1])
    cap = batch.capacity("note")
    for et, ei in batch.edge_index_dict().items():
        s = np.asarray(ei[0])
        assert (np.diff(s) >= 0).all(), et
        real = s[s < cap]
        pad = s[s >= cap]
        assert (pad == cap).all()


def test_edge_impl_matches_node_impl():
    """impl="edge" (product-weight edge transform, [N,G] scatter) must match
    impl="node" with reduce="sum" on the SAME params — including padding
    edges, isolated nodes (count 0), and the bias-inside-mean term."""
    rng = np.random.default_rng(7)
    n, f, g, t = 24, 16, 12, 3
    x = jnp.asarray(rng.normal(size=(n, f)), jnp.float32)
    sizes = [17, 11, 20]  # ragged per-relation edge counts
    edge_dict = {}
    rels = []
    for i, sz in enumerate(sizes):
        et = ("note", f"r{i}", "note")
        e = rng.integers(0, n, size=(2, sz)).astype(np.int32)
        e = np.concatenate([e, np.full((2, 2), n, np.int32)], axis=1)  # pad
        edge_dict[et] = jnp.asarray(e)
        rels.append(et)
    from analysisgnn_tpu.models.fused import stack_relations_padded

    src, dst, rel = stack_relations(edge_dict, rels)
    s_src, s_dst = stack_relations_padded(edge_dict, rels, n)

    node_mod = FusedHeteroSage(g, t, reduce="sum", impl="node")
    params = node_mod.init(jax.random.PRNGKey(0), x, src, dst, rel)
    want = node_mod.apply(params, x, src, dst, rel)

    edge_mod = FusedHeteroSage(g, t, reduce="sum", impl="edge")
    got = edge_mod.apply(params, x, src, dst, rel, s_src, s_dst)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-5
    )

    # gradients agree too (both are plain jnp — autodiff throughout)
    def loss(p, mod, *args):
        return jnp.sum(mod.apply(p, *args) ** 2)

    g_node = jax.grad(loss)(params, node_mod, x, src, dst, rel)
    g_edge = jax.grad(loss)(params, edge_mod, x, src, dst, rel, s_src, s_dst)
    for k in g_node["params"]:
        np.testing.assert_allclose(
            np.asarray(g_edge["params"][k]), np.asarray(g_node["params"][k]),
            rtol=5e-4, atol=5e-5, err_msg=k,
        )
