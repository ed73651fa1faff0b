"""Graph-partition parallelism: partitioned forward == full-graph forward."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh

from analysisgnn_tpu.core.graph import NOTE
from analysisgnn_tpu.data.graph_build import build_score_graph
from analysisgnn_tpu.data.note_array import synthetic_score
from analysisgnn_tpu.distributed.partition import (
    halo_exchange,
    make_partitioned_forward,
    partition_graph,
    partitioned_sage_layer,
)
from analysisgnn_tpu.kernels.segment_ops import segment_sum


def dense_sage_layer(x, edges, params):
    """Unpartitioned reference of partitioned_sage_layer."""
    n = x.shape[0]
    outs = []
    for et in sorted(edges.keys()):
        p = params[et[1]]
        h = x @ p["w_neigh"] + p["b_neigh"]
        ei = edges[et]
        msgs = h[np.minimum(ei[1], n - 1)]
        sums = np.asarray(segment_sum(jnp.asarray(msgs), jnp.asarray(ei[0]), n))
        counts = np.bincount(ei[0][ei[0] < n], minlength=n).astype(np.float32)
        agg = (x + sums) / np.maximum(counts, 1.0)[:, None]
        outs.append(x @ p["w_self"] + agg @ p["w_agg"] + p["b_out"])
    return np.mean(np.stack(outs), axis=0)


def make_params(relations, f, rng):
    return {
        et[1]: {
            "w_neigh": jnp.asarray(rng.normal(size=(f, f)) * 0.1, jnp.float32),
            "b_neigh": jnp.asarray(rng.normal(size=(f,)) * 0.01, jnp.float32),
            "w_self": jnp.asarray(rng.normal(size=(f, f)) * 0.1, jnp.float32),
            "w_agg": jnp.asarray(rng.normal(size=(f, f)) * 0.1, jnp.float32),
            "b_out": jnp.asarray(rng.normal(size=(f,)) * 0.01, jnp.float32),
        }
        for et in relations
    }


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
@pytest.mark.slow
def test_partitioned_forward_matches_full():
    rng = np.random.default_rng(0)
    na = synthetic_score(num_notes=512, seed=0)
    g = build_score_graph(na, add_beats=False, add_measures=False)
    relations = [
        (NOTE, "onset", NOTE),
        (NOTE, "consecutive", NOTE),
        (NOTE, "consecutive_rev", NOTE),
    ]
    edges = {et: g.edges[et] for et in relations}
    n = len(na)
    f = 16
    x = rng.normal(size=(n, f)).astype(np.float32)
    params = make_params(relations, f, rng)

    # full-graph reference (2 layers + relu)
    h = x
    for _ in range(2):
        h = dense_sage_layer(h, edges, {k: jax.tree_util.tree_map(np.asarray, v) for k, v in params.items()})
        h = np.maximum(h, 0)

    devices = jax.devices()[:8]
    mesh = Mesh(np.asarray(devices).reshape(8, 1), ("data", "model"))
    part = partition_graph(x, edges, num_devices=8)
    fwd = make_partitioned_forward(relations, num_layers=2, mesh=mesh, axis="data")
    out = fwd(
        jnp.asarray(part.x),
        {k: jnp.asarray(v) for k, v in part.edge_src.items()},
        {k: jnp.asarray(v) for k, v in part.edge_dst.items()},
        [params, params],
        part.halo,
    )
    got = np.asarray(out).reshape(-1, f)[:n]
    np.testing.assert_allclose(got, h, rtol=2e-3, atol=2e-4)


def test_partition_plan_shapes():
    na = synthetic_score(num_notes=100, seed=1)
    g = build_score_graph(na, add_beats=False, add_measures=False)
    edges = {(NOTE, "consecutive", NOTE): g.edges[(NOTE, "consecutive", NOTE)]}
    x = np.zeros((100, 4), np.float32)
    part = partition_graph(x, edges, num_devices=4)
    assert part.x.shape == (4, 25, 4)
    es = part.edge_src[(NOTE, "consecutive", NOTE)]
    assert es.shape[0] == 4
    # all local srcs within [0, n_local]
    assert (es <= part.num_local).all()
