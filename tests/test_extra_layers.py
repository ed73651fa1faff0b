"""Extra layer-zoo members, DLC split metadata, general utils."""

import time

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from analysisgnn_tpu.core.graph import NOTE, metadata
from analysisgnn_tpu.data.dlc_meta import dlc_problem_pieces, dlc_test_pieces
from analysisgnn_tpu.models.extra_layers import (
    HGPS,
    HResGatedConv,
    OnsetEmbedding,
)
from analysisgnn_tpu.utils.general import MapDict, TimeoutError_, exit_after

from tests.test_models import build_inputs


def test_onset_embedding():
    x = jnp.asarray(np.random.default_rng(0).normal(size=(6, 4)), jnp.float32)
    ei = jnp.asarray([[0, 1], [1, 0]])
    mod = OnsetEmbedding(8)
    params = mod.init(jax.random.PRNGKey(0), x, ei)
    out = mod.apply(params, x, ei)
    assert out.shape == (6, 8)


def test_hgps_stack():
    graph = build_inputs(num_notes=24, with_metrical=False)
    nodes, edges = metadata(False, False)
    mod = HGPS(hidden=16, num_layers=2, edge_types=edges)
    h = {NOTE: graph.node_features[NOTE]}
    params = mod.init(
        jax.random.PRNGKey(0), h, graph.edge_index_dict(), graph.batch
    )
    out = mod.apply(params, h, graph.edge_index_dict(), graph.batch)
    assert out.shape == (graph.capacity(NOTE), 16)
    assert np.isfinite(np.asarray(out)).all()


def test_hresgated_stack():
    graph = build_inputs(num_notes=24, with_metrical=False)
    nodes, edges = metadata(False, False)
    mod = HResGatedConv(hidden=16, num_layers=2, edge_types=edges)
    params = mod.init(
        jax.random.PRNGKey(0), graph.x_dict(), graph.edge_index_dict()
    )
    out = mod.apply(params, graph.x_dict(), graph.edge_index_dict())
    assert out.shape == (graph.capacity(NOTE), 16)


def test_dlc_split_metadata():
    tp = dlc_test_pieces()
    assert len(tp) == 250
    assert all(isinstance(p, str) for p in tp)
    assert len(dlc_problem_pieces()) == 15


def test_exit_after():
    @exit_after(0.2)
    def slow():
        time.sleep(2)

    @exit_after(5)
    def fast():
        return 42

    assert fast() == 42
    with pytest.raises(TimeoutError_):
        slow()

    @exit_after(5)
    def raises():
        raise ValueError("inner")

    with pytest.raises(ValueError):
        raises()


def test_mapdict():
    d = MapDict(a=1)
    assert d.a == 1
    d.b = 2
    assert d["b"] == 2
    del d.b
    with pytest.raises(AttributeError):
        _ = d.b
