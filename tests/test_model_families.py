"""Chord/cadence/pre-encoder model families + pooling + composite metrics."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from analysisgnn_tpu.core.graph import NOTE, metadata
from analysisgnn_tpu.models.cadence import CadenceGNN
from analysisgnn_tpu.models.chord import (
    ChordPredictionModel,
    MultiTaskMLP,
    NadeClassifierLayer,
    PostProcessingMLT,
    chord_symbol_recall,
    romnum_accuracy,
)
from analysisgnn_tpu.models.pooling import onset_group_ids, unique_onset_mask
from analysisgnn_tpu.models.pre_encoder import PreEncoder, derive_truth_edges, isin_pairwise
from analysisgnn_tpu.models.rnn import segment_starts

from tests.test_models import build_inputs

TASKS = (("localkey", 10), ("quality", 5), ("inversion", 4))


def test_onset_group_ids():
    onset = jnp.asarray([0, 0, 4, 4, 4, 8])
    batch = jnp.asarray([0, 0, 0, 0, 0, 1])
    first, gid = onset_group_ids(onset, batch)
    assert np.asarray(first).tolist() == [True, False, True, False, False, True]
    assert np.asarray(gid).tolist() == [0, 0, 1, 1, 1, 2]
    m = unique_onset_mask(onset, batch, jnp.ones(6, bool))
    assert np.asarray(m).sum() == 3


def test_nade_and_mlp_heads():
    x = jnp.asarray(np.random.default_rng(0).normal(size=(7, 16)), jnp.float32)
    for mod in (MultiTaskMLP(16, TASKS), NadeClassifierLayer(16, TASKS)):
        params = mod.init(jax.random.PRNGKey(0), x)
        out = mod.apply(params, x)
        assert set(out) == {t for t, _ in TASKS}
        for t, n_cls in TASKS:
            assert out[t].shape == (7, n_cls)


def test_chord_prediction_model():
    graph = build_inputs(num_notes=40, with_metrical=False)
    nodes, edges = metadata(False, False)
    model = ChordPredictionModel(
        hidden=16, task_dict=TASKS, num_layers=1, edge_types=edges
    )
    attrs = graph.node_attrs[NOTE]
    args = (
        graph.x_dict(), graph.edge_index_dict(), graph.batch,
        attrs["pitch_spelling"].astype(jnp.int32) * 0 + jnp.asarray(
            np.arange(graph.capacity(NOTE)) // 3
        ),  # fake onset_div groups
        graph.target_mask(),
    )
    params = model.init(jax.random.PRNGKey(0), *args)
    logits, group_valid = model.apply(params, *args)
    for t, n_cls in TASKS:
        assert logits[t].shape == (graph.capacity(NOTE), n_cls)
        assert np.isfinite(np.asarray(logits[t])).all()


def test_post_processing_mlt():
    probs = {t: jnp.ones((10, n)) / n for t, n in TASKS}
    starts = segment_starts(jnp.zeros(10, jnp.int32))
    mod = PostProcessingMLT(8, TASKS)
    params = mod.init(jax.random.PRNGKey(0), probs, starts)
    out = mod.apply(params, probs, starts)
    assert out["localkey"].shape == (10, 10)


def test_cadence_gnn():
    graph = build_inputs(num_notes=40, with_metrical=True)
    nodes, edges = metadata(True, True)
    model = CadenceGNN(hidden=16, num_layers=2, edge_types=edges, metrical=True)
    params = model.init(
        jax.random.PRNGKey(0),
        graph.x_dict(), graph.edge_index_dict(), graph.batch,
        graph.num_target_nodes,
    )
    logits = model.apply(
        params, graph.x_dict(), graph.edge_index_dict(), graph.batch,
        graph.num_target_nodes,
    )
    assert logits.shape == (graph.capacity(NOTE), 4)


def test_cadence_gnn_neighbor_and_train_step():
    """CadenceGNNNeighbor forward + one SMOTE train step (reference
    CadenceNeighborPLModel training_step, models/cadence.py:478-533):
    loss finite, params move, jit-stable."""
    import optax

    from analysisgnn_tpu.models.cadence import CadenceGNNNeighbor
    from analysisgnn_tpu.train.cadence import (
        CadenceStepConfig,
        cadence_val_loss,
        make_cadence_train_step,
        multistep_lr,
    )

    graph = build_inputs(num_notes=40, with_metrical=False)
    nodes, edges = metadata(False, False)
    model = CadenceGNNNeighbor(hidden=16, num_classes=5, num_layers=2,
                               edge_types=edges, dropout=0.0)
    x_dict, ei = graph.x_dict(), graph.edge_index_dict()
    params = model.init(jax.random.PRNGKey(0), x_dict, ei)
    logits = model.apply(params, x_dict, ei)
    assert logits.shape == (graph.capacity(NOTE), 5)

    n = graph.capacity(NOTE)
    rng = np.random.default_rng(0)
    y = jnp.asarray(rng.integers(0, 5, size=n), jnp.int32)
    w = jnp.asarray(graph.node_mask(NOTE))
    sched = multistep_lr(1e-3, steps_per_epoch=2)
    opt = optax.adam(sched)
    step = make_cadence_train_step(
        model, opt, CadenceStepConfig(num_synthetic=16, smote_k=2)
    )
    opt_state = opt.init(params)
    p1, _, loss, aux = step(
        params, opt_state, x_dict, ei, y, w.astype(jnp.float32),
        jax.random.PRNGKey(1), 0,
    )
    assert np.isfinite(float(loss))
    assert np.isfinite(float(aux["clf_loss"]))
    moved = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).sum()), params, p1
    )
    assert sum(jax.tree_util.tree_leaves(moved)) > 0
    # inverse-class-frequency weighted val CE
    vl = cadence_val_loss(logits, y, w, 5)
    assert np.isfinite(float(vl))
    # MultiStepLR drops by gamma at each epoch milestone
    assert float(sched(0)) == pytest.approx(1e-3)
    assert float(sched(20)) == pytest.approx(2e-4)


def test_cadence_assisted_linear_probe_freezes_encoder():
    """CadenceAssisted with linear_probing must stop gradients into the
    embedding input (reference freeze_encoder, models/cadence.py:570-575)."""
    from analysisgnn_tpu.models.cadence import CadenceAssisted

    emb = jnp.asarray(np.random.default_rng(0).normal(size=(10, 24)), jnp.float32)
    model = CadenceAssisted(encoder_dim=24, hidden=16, linear_probing=True,
                            dropout=0.0)
    params = model.init(jax.random.PRNGKey(0), emb)

    def loss_wrt_emb(e):
        return model.apply(params, e).sum()

    g = jax.grad(loss_wrt_emb)(emb)
    assert float(jnp.abs(g).sum()) == 0.0
    model2 = CadenceAssisted(encoder_dim=24, hidden=16, linear_probing=False,
                             dropout=0.0)
    params2 = model2.init(jax.random.PRNGKey(0), emb)
    g2 = jax.grad(lambda e: model2.apply(params2, e).sum())(emb)
    assert float(jnp.abs(g2).sum()) > 0.0


def test_isin_pairwise_and_truth_edges():
    elem = jnp.asarray([[0, 1, 2], [1, 2, 3]])
    test = jnp.asarray([[0, 9], [1, 9]])
    hits = isin_pairwise(
        elem, test, jnp.ones(3, bool), jnp.asarray([True, False])
    )
    assert np.asarray(hits).tolist() == [True, False, False]
    cons = jnp.asarray([[0, 1, 2], [1, 2, 3]])
    onset = jnp.asarray([[0], [2]])
    voice = jnp.asarray([1, 1, 2, 2])
    staff = jnp.asarray([1, 1, 1, 2])
    v_true, s_true = derive_truth_edges(cons, onset, voice, staff, 4)
    # edge (0,1): same voice+staff → kept; (1,2): diff voice → masked to 4
    assert np.asarray(v_true)[0].tolist() == [0, 4, 4]
    assert np.asarray(s_true).shape == (2, 4)


def test_pre_encoder_forward():
    graph = build_inputs(num_notes=30, with_metrical=False)
    nodes, edges = metadata(False, False)
    model = PreEncoder(hidden=16, num_layers=1, edge_types=edges)
    cand = graph.edges((NOTE, "consecutive", NOTE))
    params = model.init(
        jax.random.PRNGKey(0),
        graph.x_dict(), graph.edge_index_dict(), graph.batch, cand, cand,
    )
    staff_l, voice_l, fifths_l, spell_l = model.apply(
        params, graph.x_dict(), graph.edge_index_dict(), graph.batch, cand, cand
    )
    assert staff_l.shape == (cand.shape[1],)
    assert fifths_l.shape == (graph.capacity(NOTE), 15)
    assert spell_l.shape == (graph.capacity(NOTE), 35)


def test_romnum_and_csr_metrics():
    logits = {
        "quality": jnp.asarray([[0.0, 5.0], [5.0, 0.0]]),
        "inversion": jnp.asarray([[5.0, 0.0], [5.0, 0.0]]),
    }
    labels = {"quality": jnp.asarray([1, 0]), "inversion": jnp.asarray([0, 1])}
    w = jnp.ones(2, bool)
    acc = romnum_accuracy(logits, labels, w, keys=("quality", "inversion"))
    # row0: quality ✓ inversion ✓ → correct; row1: quality ✓ inversion ✗
    np.testing.assert_allclose(float(acc), 0.5)
    csr = chord_symbol_recall(
        logits, labels, jnp.asarray([3.0, 1.0]), w, keys=("quality", "inversion")
    )
    np.testing.assert_allclose(float(csr), 0.75)


def test_pretrain_step():
    import optax

    from analysisgnn_tpu.train.pretrain import make_pretrain_step, pretrain_losses

    graph = build_inputs(num_notes=30, with_metrical=False)
    nodes, edges = metadata(False, False)
    model = PreEncoder(hidden=16, num_layers=1, edge_types=edges)
    # add voice/staff attrs the pretrain losses need
    attrs = dict(graph.node_attrs[NOTE])
    n = graph.capacity(NOTE)
    rng = np.random.default_rng(0)
    attrs["voice"] = jnp.asarray(rng.integers(1, 3, n))
    attrs["staff"] = jnp.asarray(rng.integers(1, 3, n))
    graph = graph.replace(node_attrs={NOTE: attrs})
    cand = graph.edges((NOTE, "consecutive", NOTE))
    params = model.init(
        jax.random.PRNGKey(0),
        graph.x_dict(), graph.edge_index_dict(), graph.batch, cand, cand,
    )
    opt = __import__("optax").adamw(1e-3)
    step = make_pretrain_step(model, opt)
    opt_state = opt.init(params)
    p2, opt_state, losses = step(params, opt_state, graph, jax.random.PRNGKey(1))
    for k in ("staff", "voice", "fifths", "spelling", "total"):
        assert np.isfinite(float(losses[k])), k


def test_analysis_gnn_with_rnn():
    from analysisgnn_tpu.models.analysis import AnalysisGNN

    graph = build_inputs(num_notes=30, with_metrical=False)
    nodes, edges = metadata(False, False)
    model = AnalysisGNN(
        metadata=(nodes, edges), in_channels=25, hidden_channels=16,
        out_channels=8, task_dict=TASKS, num_layers=1, dropout=0.0,
        use_rnn=True,
    )
    attrs = graph.node_attrs[NOTE]
    args = (
        graph.x_dict(), graph.edge_index_dict(), graph.batch,
        attrs["pitch_spelling"], attrs["key_signature"], graph.num_target_nodes,
    )
    params = model.init(jax.random.PRNGKey(0), *args)
    out = model.apply(params, *args)
    assert all(np.isfinite(np.asarray(v)).all() for v in out.values())
