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
