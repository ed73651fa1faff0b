"""PitchSpelling models, UNet, pure-python GraphSampler."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from analysisgnn_tpu.core.graph import NOTE, metadata
from analysisgnn_tpu.data.graph_sampling import GraphSampler
from analysisgnn_tpu.models.pitch_spelling import PKSpell, PitchSpellingGNN
from analysisgnn_tpu.models.unet import UNet

from tests.test_models import build_inputs


def test_pkspell():
    x = jnp.asarray(np.random.default_rng(0).normal(size=(20, 25)), jnp.float32)
    batch = jnp.asarray(np.r_[np.zeros(10), np.ones(10)].astype(np.int32))
    model = PKSpell(hidden=16)
    params = model.init(jax.random.PRNGKey(0), x, batch)
    pc, ks = model.apply(params, x, batch)
    assert pc.shape == (20, 35) and ks.shape == (20, 15)


def test_pitch_spelling_gnn():
    graph = build_inputs(num_notes=40, with_metrical=True)
    nodes, edges = metadata(True, True)
    model = PitchSpellingGNN(
        hidden=16, out_enc=16, num_layers=2, edge_types=edges, add_seq=True
    )
    params = model.init(
        jax.random.PRNGKey(0), graph.x_dict(), graph.edge_index_dict(), graph.batch
    )
    pc, ks = model.apply(
        params, graph.x_dict(), graph.edge_index_dict(), graph.batch
    )
    n = graph.capacity(NOTE)
    assert pc.shape == (n, 35) and ks.shape == (n, 15)
    assert np.isfinite(np.asarray(pc)).all()


@pytest.mark.slow
def test_unet():
    x = jnp.zeros((2, 32, 32, 3))
    model = UNet(features=(8, 16, 32), out_channels=2)
    params = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(params, x)
    assert out.shape == (2, 32, 32, 2)


def test_graph_sampler_walks():
    ei = np.array([[0, 1, 2, 3, 4], [1, 2, 3, 4, 0]], np.int64)
    gs = GraphSampler(ei, 5, seed=0)
    walk = gs.random_walk(0, 4)
    assert walk[0] == 0 and len(walk) <= 4
    sel, sub = gs.sample_node_induced(num_seeds=2, walk_length=3)
    assert len(sel) >= 1
    if sub.shape[1]:
        assert sub.max() < len(sel)


def test_pitch_spelling_neighbor_gnn():
    import jax
    import numpy as np

    from analysisgnn_tpu.core.graph import NOTE, metadata
    from analysisgnn_tpu.models.pitch_spelling import PitchSpellingNeighborGNN

    rng = np.random.default_rng(0)
    n = 24
    _, ets = metadata(False, False)
    x = {NOTE: jax.numpy.asarray(rng.normal(size=(n, 12)).astype(np.float32))}
    note_ets = tuple(e for e in ets if e[0] == NOTE and e[2] == NOTE)
    edges = {et: jax.numpy.asarray(rng.integers(0, n, (2, 30))) for et in note_ets}
    model = PitchSpellingNeighborGNN(hidden=16, out_enc=16, edge_types=ets)
    params = model.init(jax.random.PRNGKey(0), x, edges)
    pc, ks = model.apply(params, x, edges)
    assert pc.shape == (n, 35) and ks.shape == (n, 15)
    assert np.isfinite(np.asarray(pc)).all()
