"""Graph-partition parallelism for the PRODUCTION model: exactness of both
regimes vs the unpartitioned forward (VERDICT round-1 item 4)."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from analysisgnn_tpu.core.graph import NOTE, metadata
from analysisgnn_tpu.data.features import select_features
from analysisgnn_tpu.data.graph_build import build_score_graph
from analysisgnn_tpu.data.note_array import synthetic_score
from analysisgnn_tpu.theory.encoders import KeySignatureEncoder, PitchEncoder


def _full_graph(num_notes=420, seed=0):
    na = synthetic_score(num_notes=num_notes, seed=seed)
    feats = select_features(na, "voice").astype(np.float32)
    g = build_score_graph(na, add_beats=False, add_measures=False)
    edges = {et: np.asarray(ei) for et, ei in g.edges.items()}
    ps = PitchEncoder().encode(na).astype(np.int32)
    ks = KeySignatureEncoder().encode(na).astype(np.int32)
    return feats, ps, ks, edges


def _mesh(n=4):
    return Mesh(np.array(jax.devices("cpu")[:n]), ("graph",))


def test_overlap_region_partition_matches_full_graph_encode():
    """Regime 1: stock AnalysisGNN.encode per shard over L·span halos ==
    unpartitioned full-graph encode, exactly (owned rows)."""
    from analysisgnn_tpu.distributed.partition_encoder import (
        make_partitioned_encode,
        partition_full_graph,
        unpartition,
    )
    from analysisgnn_tpu.models.analysis import AnalysisGNN

    feats, ps, ks, edges = _full_graph()
    nodes, ets = metadata(False, False)
    model = AnalysisGNN(
        metadata=(nodes, ets), in_channels=feats.shape[1],
        hidden_channels=32, out_channels=16,
        task_dict=(("cadence", 4),), num_layers=2, dropout=0.0,
        use_jk=True,
    )
    n = feats.shape[0]
    x_dict = {NOTE: jnp.asarray(feats)}
    ei = {et: jnp.asarray(v.astype(np.int32)) for et, v in edges.items()}
    batch = {NOTE: jnp.zeros(n, jnp.int32)}
    params = model.init(
        jax.random.PRNGKey(0), x_dict, ei, batch,
        jnp.asarray(ps), jnp.asarray(ks), jnp.asarray(n, jnp.int32),
    )
    full = model.apply(
        params, x_dict, ei, batch, jnp.asarray(ps), jnp.asarray(ks),
        jnp.asarray(n, jnp.int32), method=model.encode,
    )

    mesh = _mesh(4)
    # hops: num_layers + final conv + onset pooling
    part = partition_full_graph(
        feats, ps, ks, edges, num_devices=4, num_message_hops=2 + 2
    )
    fn = make_partitioned_encode(model, mesh)
    with mesh:
        got = unpartition(fn(params, part), part)
    np.testing.assert_allclose(np.asarray(got), np.asarray(full), rtol=2e-4, atol=2e-5)


def test_per_layer_exchange_matches_stock_hybridgnn():
    """Regime 2: ppermute-per-layer fused SAGE driven by the trained
    HybridGNN parameter tree == stock encoder forward."""
    from analysisgnn_tpu.distributed.partition import partition_graph
    from analysisgnn_tpu.distributed.partition_encoder import (
        make_partitioned_fused_sage,
        unpartition,
    )
    from analysisgnn_tpu.models.encoders import HybridGNN

    feats, _, _, edges = _full_graph(num_notes=360, seed=1)
    nodes, ets = metadata(False, False)
    note_rels = tuple(et for et in ets if et[0] == NOTE and et[2] == NOTE)
    hidden = 32
    rng = np.random.default_rng(0)
    x0 = rng.normal(size=(feats.shape[0], hidden)).astype(np.float32)

    enc = HybridGNN(hidden=hidden, num_layers=2, dropout=0.0, use_jk=True,
                    edge_types=ets)
    ei = {et: jnp.asarray(v.astype(np.int32)) for et, v in edges.items()}
    params = enc.init(jax.random.PRNGKey(1), {NOTE: jnp.asarray(x0)}, ei)
    full = enc.apply(params, {NOTE: jnp.asarray(x0)}, ei)

    num_devices = 4
    pg = partition_graph(x0, {et: edges[et] for et in note_rels}, num_devices)
    mesh = _mesh(num_devices)
    fn = make_partitioned_fused_sage(
        note_rels, num_layers=2, mesh=mesh, use_jk=True, hidden=hidden
    )
    with mesh:
        got = fn(
            params["params"],
            jnp.asarray(pg.x),
            {et: jnp.asarray(pg.edge_src[et]) for et in note_rels},
            {et: jnp.asarray(pg.edge_dst[et]) for et in note_rels},
            pg.halo,
        )
    got = np.asarray(got).reshape(-1, full.shape[-1])[: x0.shape[0]]
    np.testing.assert_allclose(got, np.asarray(full), rtol=2e-4, atol=2e-5)


def test_predict_score_partitioned_matches_predict_score():
    """Serving integration: the mesh-partitioned predict path (overlap
    regime encode + gathered heads + host decode) returns the same
    probabilities as the single-device full-graph predict."""
    from analysisgnn_tpu.data.note_array import synthetic_score
    from analysisgnn_tpu.inference.predict import (
        graph_from_note_array,
        predict_score,
        predict_score_partitioned,
    )
    from analysisgnn_tpu.models.analysis import AnalysisGNN
    from analysisgnn_tpu.theory.vocab import TASK_DICT

    na = synthetic_score(num_notes=300, seed=3)
    nodes, ets = metadata(False, False)
    model = AnalysisGNN(
        metadata=(nodes, ets), in_channels=25,
        hidden_channels=16, out_channels=8,
        task_dict=tuple(TASK_DICT.items()), num_layers=2, dropout=0.0,
    )
    g = graph_from_note_array(na, add_beats=False, add_measures=False)
    attrs = g.node_attrs[NOTE]
    params = model.init(
        jax.random.PRNGKey(0),
        g.x_dict(), g.edge_index_dict(), g.batch,
        attrs["pitch_spelling"], attrs["key_signature"], g.num_target_nodes,
    )
    ref = predict_score(model, params, na, add_beats=False, add_measures=False)
    got = predict_score_partitioned(model, params, na, mesh=_mesh(4))
    assert set(got) == set(ref)
    for k in ref:
        np.testing.assert_allclose(got[k], ref[k], rtol=2e-4, atol=2e-5)
    # ids-only serving decode (what the CLI uses): same predictions
    ids = predict_score_partitioned(
        model, params, na, mesh=_mesh(4), ids_only=True
    )
    assert set(ids) == set(ref)
    for k in ref:
        np.testing.assert_array_equal(ids[k], ref[k].argmax(-1), err_msg=k)


@pytest.mark.parametrize("enc,kw", [
    ("hgt", {"hgt_group_mode": "emax"}),
])
def test_overlap_partition_hgt(enc, kw):
    """The overlap regime runs the STOCK module per shard, so it must be
    encoder-agnostic — lock in HGT (typed attention + union-stack grouping),
    whose softmax normalization could plausibly leak across windows."""
    from analysisgnn_tpu.distributed.partition_encoder import (
        make_partitioned_encode,
        partition_full_graph,
        unpartition,
    )
    from analysisgnn_tpu.models.analysis import AnalysisGNN

    feats, ps, ks, edges = _full_graph(num_notes=260, seed=5)
    nodes, ets = metadata(False, False)
    model = AnalysisGNN(
        metadata=(nodes, ets), in_channels=feats.shape[1],
        hidden_channels=16, out_channels=8,
        task_dict=(("cadence", 4),), num_layers=2, dropout=0.0,
        encoder_type=enc, **kw,
    )
    n = feats.shape[0]
    x_dict = {NOTE: jnp.asarray(feats)}
    ei = {et: jnp.asarray(v.astype(np.int32)) for et, v in edges.items()}
    batch = {NOTE: jnp.zeros(n, jnp.int32)}
    params = model.init(
        jax.random.PRNGKey(0), x_dict, ei, batch,
        jnp.asarray(ps), jnp.asarray(ks), jnp.asarray(n, jnp.int32),
    )
    full = model.apply(
        params, x_dict, ei, batch, jnp.asarray(ps), jnp.asarray(ks),
        jnp.asarray(n, jnp.int32), method=model.encode,
    )
    part = partition_full_graph(
        feats, ps, ks, edges, num_devices=4, num_message_hops=2 + 2
    )
    fn = make_partitioned_encode(model, _mesh(4))
    with _mesh(4):
        got = unpartition(fn(params, part), part)
    np.testing.assert_allclose(np.asarray(got), np.asarray(full),
                               rtol=2e-4, atol=2e-5)
