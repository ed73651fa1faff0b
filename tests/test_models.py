"""Model-stack tests: convs, encoders, full AnalysisGNN forward under jit."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from analysisgnn_tpu.core.graph import HeteroGraph, NOTE, metadata
from analysisgnn_tpu.data.features import select_features
from analysisgnn_tpu.data.graph_build import build_score_graph
from analysisgnn_tpu.data.note_array import synthetic_score
from analysisgnn_tpu.models.analysis import AnalysisGNN
from analysisgnn_tpu.models.conv import SageConv, ResGatedConv
from analysisgnn_tpu.models.encoders import HybridGNN, HybridHGT, MetricalGNN
from analysisgnn_tpu.models.rnn import BiResetGRU, segment_starts
from analysisgnn_tpu.theory.encoders import KeySignatureEncoder, PitchEncoder

TASKS = (("cadence", 4), ("localkey", 50), ("quality", 15))


def build_inputs(num_notes=48, seed=0, with_metrical=True):
    na = synthetic_score(num_notes=num_notes, seed=seed)
    feats = select_features(na, "voice")
    g = build_score_graph(na, add_beats=with_metrical, add_measures=with_metrical)
    node_features = {NOTE: feats}
    if with_metrical:
        node_features["beat"] = np.zeros((max(g.num_beats, 1), feats.shape[1]), np.float32)
        node_features["measure"] = np.zeros(
            (max(g.num_measures, 1), feats.shape[1]), np.float32
        )
    ps = PitchEncoder().encode(na)
    ks = KeySignatureEncoder().encode(na)
    graph = HeteroGraph.from_numpy(
        node_features,
        g.edges,
        node_attrs={NOTE: {"pitch_spelling": ps, "key_signature": ks}},
        num_target_nodes=len(na),
    )
    return graph


def test_sage_conv_self_fallback():
    # node with no out-edges keeps (transformed) self representation
    x = jnp.asarray(np.random.default_rng(0).normal(size=(5, 8)), jnp.float32)
    ei = jnp.asarray(np.array([[0, 1], [1, 2]], np.int32))
    conv = SageConv(16)
    params = conv.init(jax.random.PRNGKey(0), x, ei)
    out = conv.apply(params, x, ei)
    assert out.shape == (5, 16)
    assert np.isfinite(np.asarray(out)).all()


def test_resgated_conv_shapes():
    x = jnp.asarray(np.random.default_rng(0).normal(size=(6, 8)), jnp.float32)
    ei = jnp.asarray(np.array([[0, 1, 5], [1, 2, 0]], np.int32))
    conv = ResGatedConv(12)
    params = conv.init(jax.random.PRNGKey(0), x, ei)
    out = conv.apply(params, x, ei)
    assert out.shape == (6, 12)


def test_bireset_gru_respects_boundaries():
    # two segments; output of segment 2 must not depend on segment 1 inputs
    xs = jnp.asarray(np.random.default_rng(0).normal(size=(6, 4)), jnp.float32)
    starts = jnp.asarray([True, False, False, True, False, False])
    gru = BiResetGRU(8)
    params = gru.init(jax.random.PRNGKey(0), xs, starts)
    out1 = gru.apply(params, xs, starts)
    xs2 = xs.at[0].set(99.0)  # perturb segment 1 only
    out2 = gru.apply(params, xs2, starts)
    np.testing.assert_allclose(out1[3:], out2[3:], rtol=1e-5)
    assert not np.allclose(out1[:3], out2[:3])


def test_segment_starts():
    b = jnp.asarray([0, 0, 1, 1, 1, 2])
    s = np.asarray(segment_starts(b))
    assert s.tolist() == [True, False, True, False, False, True]


@pytest.mark.parametrize("enc_cls", [HybridGNN, HybridHGT, MetricalGNN])
def test_encoders_forward(enc_cls):
    graph = build_inputs(num_notes=40, with_metrical=True)
    nodes, edges = metadata(True, True)
    enc = enc_cls(hidden=32, num_layers=2, use_jk=True, edge_types=edges)
    x_dict = {t: graph.node_features[t] for t in graph.node_features}
    ei = graph.edge_index_dict()
    params = enc.init(jax.random.PRNGKey(0), x_dict, ei, graph.batch)
    out = enc.apply(params, x_dict, ei, graph.batch)
    assert out.shape == (graph.capacity(NOTE), 32)
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.parametrize("encoder_type", ["hybridgnn", "hgt", "metricalgnn"])
def test_analysis_gnn_forward(encoder_type):
    graph = build_inputs(num_notes=40, with_metrical=True)
    nodes, edges = metadata(True, True)
    model = AnalysisGNN(
        metadata=(nodes, edges),
        in_channels=25,
        hidden_channels=32,
        out_channels=16,
        task_dict=TASKS,
        num_layers=2,
        dropout=0.1,
        logit_fusion=True,
        encoder_type=encoder_type,
    )
    args = (
        graph.x_dict(),
        graph.edge_index_dict(),
        graph.batch,
        graph.node_attrs[NOTE]["pitch_spelling"],
        graph.node_attrs[NOTE]["key_signature"],
        graph.num_target_nodes,
    )
    params = model.init(jax.random.PRNGKey(0), *args)
    logits = model.apply(params, *args)
    assert set(logits.keys()) == {t for t, _ in TASKS}
    for task, n_cls in TASKS:
        assert logits[task].shape == (graph.capacity(NOTE), n_cls)
        assert np.isfinite(np.asarray(logits[task])).all()


def test_analysis_gnn_jit_and_grad():
    graph = build_inputs(num_notes=32, with_metrical=False)
    nodes, edges = metadata(False, False)
    model = AnalysisGNN(
        metadata=(nodes, edges),
        in_channels=25,
        hidden_channels=16,
        out_channels=8,
        task_dict=TASKS,
        num_layers=2,
        encoder_type="hybridgnn",
    )
    args = (
        graph.x_dict(),
        graph.edge_index_dict(),
        graph.batch,
        graph.node_attrs[NOTE]["pitch_spelling"],
        graph.node_attrs[NOTE]["key_signature"],
        graph.num_target_nodes,
    )
    params = model.init(jax.random.PRNGKey(0), *args)

    @jax.jit
    def loss_fn(p):
        logits = model.apply(p, *args)
        return sum(jnp.sum(v**2) for v in logits.values())

    g = jax.grad(loss_fn)(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    assert any(np.abs(np.asarray(l)).sum() > 0 for l in leaves)


def test_hybridgnn_final_norm_bounds_output():
    """`final_norm=True` must ReLU+L2-normalize the final conv output —
    the stabilizer that lets the multi-task recipe train at the reference
    lr=5e-3 (scripts/variant_sweep.py arm "fnorm")."""
    graph = build_inputs(num_notes=40, with_metrical=False)
    _, edges = metadata(False, False)
    enc = HybridGNN(
        hidden=32, num_layers=2, use_jk=True, edge_types=edges, final_norm=True
    )
    x_dict = {t: graph.node_features[t] for t in graph.node_features}
    ei = graph.edge_index_dict()
    params = enc.init(jax.random.PRNGKey(0), x_dict, ei, graph.batch)
    out = np.asarray(enc.apply(params, x_dict, ei, graph.batch))
    assert (out >= 0).all()
    norms = np.linalg.norm(out, axis=-1)
    assert ((norms < 1.0 + 1e-4) & ((norms > 0.99) | (norms < 1e-6))).all()


def test_analysis_gnn_final_norm_flag_roundtrip(tmp_path):
    """final_norm flows CLI -> TrainConfig -> model_config.json -> predict's
    model reconstruction."""
    from analysisgnn_tpu.cli.train import get_parser
    from analysisgnn_tpu.train.loop import TrainConfig

    args = get_parser().parse_args(["--final_norm"])
    assert args.final_norm is True
    tc = TrainConfig(final_norm=True)
    model = AnalysisGNN(
        metadata=metadata(False, False),
        in_channels=25,
        hidden_channels=32,
        out_channels=16,
        task_dict=TASKS,
        num_layers=2,
        encoder_type="hybridgnn",
        final_norm=tc.final_norm,
    )
    assert model.final_norm is True
