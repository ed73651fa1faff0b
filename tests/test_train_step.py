"""End-to-end training smoke: jitted multi-task step drives the loss down."""

import numpy as np
import jax
import jax.numpy as jnp

from analysisgnn_tpu.core.graph import NOTE, metadata
from analysisgnn_tpu.data.features import select_features
from analysisgnn_tpu.data.graph_build import build_score_graph
from analysisgnn_tpu.data.note_array import synthetic_score
from analysisgnn_tpu.data.sampler import SamplerConfig, ScoreSample, SubgraphSampler
from analysisgnn_tpu.models.analysis import AnalysisGNN
from analysisgnn_tpu.theory.encoders import KeySignatureEncoder, PitchEncoder
from analysisgnn_tpu.train.losses import masked_cross_entropy
from analysisgnn_tpu.train.schedules import warmup_cosine_schedule
from analysisgnn_tpu.train.state import create_train_state, make_optimizer
from analysisgnn_tpu.train.step import StepConfig, make_eval_step, make_train_step

TASKS = (("cadence", 4), ("localkey", 50))


def make_sampler():
    samples = []
    for s in range(2):
        na = synthetic_score(num_notes=96, seed=s)
        feats = select_features(na, "voice")
        g = build_score_graph(na, add_beats=False, add_measures=False)
        rng = np.random.default_rng(s)
        # learnable labels: cadence = f(pitch class), localkey = f(octave)
        attrs = {
            "pitch_spelling": PitchEncoder().encode(na),
            "key_signature": KeySignatureEncoder().encode(na),
            "cadence": (na["pitch"] % 4).astype(np.int64),
            "localkey": (na["pitch"] // 12 % 5).astype(np.int64),
            "valid_label": np.ones(len(na), np.int64),
            "valid_cadence_label": np.ones(len(na), np.int64),
            "onset_div": na["onset_div"].astype(np.int64),
        }
        samples.append(
            ScoreSample(features={NOTE: feats}, edges=g.edges, note_attrs=attrs)
        )
    cfg = SamplerConfig(subgraph_size=48, batch_size=2, num_neighbors=(5,), seed=0)
    return SubgraphSampler(samples, cfg)


def test_masked_ce_basics():
    logits = jnp.asarray([[10.0, -10.0], [-10.0, 10.0], [0.0, 0.0]])
    labels = jnp.asarray([0, 1, 1])
    w = jnp.asarray([1.0, 1.0, 0.0])
    loss = masked_cross_entropy(logits, labels, w, label_smoothing=0.0)
    assert float(loss) < 1e-3
    # masked-out rows don't contribute
    loss2 = masked_cross_entropy(
        logits.at[2].set(jnp.asarray([100.0, -100.0])), labels, w, 0.0
    )
    np.testing.assert_allclose(float(loss), float(loss2), rtol=1e-5)


def test_train_step_reduces_loss():
    sampler = make_sampler()
    nodes, edges = metadata(False, False)
    model = AnalysisGNN(
        metadata=(nodes, edges),
        in_channels=25,
        hidden_channels=32,
        out_channels=16,
        task_dict=TASKS,
        num_layers=2,
        dropout=0.0,
        encoder_type="hybridgnn",
    )
    batch = sampler.sample_batch([0, 1])
    attrs = batch.node_attrs[NOTE]
    args = (
        batch.x_dict(),
        batch.edge_index_dict(),
        batch.batch,
        attrs["pitch_spelling"],
        attrs["key_signature"],
        batch.num_target_nodes,
    )
    params = model.init(jax.random.PRNGKey(0), *args)
    schedule = warmup_cosine_schedule(5e-3, total_steps=60, warmup_steps=5)
    opt = make_optimizer(schedule)
    state = create_train_state(params, len(TASKS), opt, jax.random.PRNGKey(1))
    cfg = StepConfig(
        task_dict=TASKS,
        active_tasks=("cadence", "localkey"),
        mt_strategy="wloss",
        lambda_featl=0.01,
    )
    train_step = make_train_step(model, opt, cfg)
    eval_step = make_eval_step(model, cfg)

    first_metrics = eval_step(state, batch)
    losses = []
    for i in range(40):
        b = sampler.sample_batch([0, 1])
        state, aux = train_step(state, b)
        losses.append(float(aux["task_loss"]))
    final_metrics = eval_step(state, batch)
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.8, (losses[0], losses[-1])
    assert float(final_metrics["cadence_acc"]) > float(first_metrics["cadence_acc"])
    assert float(final_metrics["cadence_acc"]) > 0.5


def test_distillation_and_ewc_paths_compile():
    sampler = make_sampler()
    nodes, edges = metadata(False, False)
    model = AnalysisGNN(
        metadata=(nodes, edges), in_channels=25, hidden_channels=16,
        out_channels=8, task_dict=TASKS, num_layers=1, dropout=0.0,
    )
    batch = sampler.sample_batch([0, 1])
    attrs = batch.node_attrs[NOTE]
    args = (
        batch.x_dict(), batch.edge_index_dict(), batch.batch,
        attrs["pitch_spelling"], attrs["key_signature"], batch.num_target_nodes,
    )
    params = model.init(jax.random.PRNGKey(0), *args)
    opt = make_optimizer(1e-3)
    state = create_train_state(params, len(TASKS), opt, jax.random.PRNGKey(1))
    cfg = StepConfig(
        task_dict=TASKS,
        active_tasks=("cadence",),
        previous_tasks=("localkey",),
        use_ewc=True,
        lambda_dctn=0.5,
        lambda_ewc=1.0,
    )
    step = make_train_step(model, opt, cfg)
    state, aux = step(state, batch)
    assert np.isfinite(float(aux["total_loss"]))
    assert float(aux["memory_loss"]) >= -1e-5  # ≈0: teacher == student at init


def test_famo_strategy_runs():
    sampler = make_sampler()
    nodes, edges = metadata(False, False)
    model = AnalysisGNN(
        metadata=(nodes, edges), in_channels=25, hidden_channels=16,
        out_channels=8, task_dict=TASKS, num_layers=1, dropout=0.0,
    )
    batch = sampler.sample_batch([0, 1])
    attrs = batch.node_attrs[NOTE]
    args = (
        batch.x_dict(), batch.edge_index_dict(), batch.batch,
        attrs["pitch_spelling"], attrs["key_signature"], batch.num_target_nodes,
    )
    params = model.init(jax.random.PRNGKey(0), *args)
    opt = make_optimizer(1e-3)
    state = create_train_state(
        params, len(TASKS), opt, jax.random.PRNGKey(1), mt_strategy="famo"
    )
    cfg = StepConfig(
        task_dict=TASKS, active_tasks=("cadence", "localkey"), mt_strategy="famo"
    )
    step = make_train_step(model, opt, cfg)
    w0 = np.asarray(state.famo.w).copy()
    for _ in range(3):
        state, aux = step(state, sampler.sample_batch([0, 1]))
    assert np.isfinite(float(aux["total_loss"]))
    assert not np.allclose(np.asarray(state.famo.w), w0)  # logits moved


def test_edge_loss_path():
    sampler = make_sampler()
    nodes, edges = metadata(False, False)
    model = AnalysisGNN(
        metadata=(nodes, edges), in_channels=25, hidden_channels=16,
        out_channels=8, task_dict=TASKS, num_layers=1, dropout=0.0,
        use_edge_decoder=True,
    )
    batch = sampler.sample_batch([0, 1])
    # add the RNA labels the edge loss conditions on
    from analysisgnn_tpu.train.step import EDGE_LOSS_RNA_KEYS
    import dataclasses as dc

    attrs = dict(batch.node_attrs[NOTE])
    n = batch.capacity(NOTE)
    rng = np.random.default_rng(0)
    for k in EDGE_LOSS_RNA_KEYS:
        if k not in attrs:
            attrs[k] = jnp.asarray(rng.integers(0, 4, n))
    batch = batch.replace(node_attrs={NOTE: attrs})
    args = (
        batch.x_dict(), batch.edge_index_dict(), batch.batch,
        attrs["pitch_spelling"], attrs["key_signature"], batch.num_target_nodes,
    )
    params = model.init(jax.random.PRNGKey(0), *args, method=model.full_init)
    opt = make_optimizer(1e-3)
    state = create_train_state(params, len(TASKS), opt, jax.random.PRNGKey(1))
    cfg = StepConfig(
        task_dict=TASKS, active_tasks=("cadence",), use_edge_loss=True,
    )
    step = make_train_step(model, opt, cfg)
    state, aux = step(state, batch)
    assert "edge_loss" in aux and np.isfinite(float(aux["edge_loss"]))


def test_bf16_compute_dtype_runs():
    sampler = make_sampler()
    nodes, edges = metadata(False, False)
    model = AnalysisGNN(
        metadata=(nodes, edges), in_channels=25, hidden_channels=16,
        out_channels=8, task_dict=TASKS, num_layers=1, dropout=0.0,
    )
    batch = sampler.sample_batch([0, 1])
    attrs = batch.node_attrs[NOTE]
    args = (
        batch.x_dict(), batch.edge_index_dict(), batch.batch,
        attrs["pitch_spelling"], attrs["key_signature"], batch.num_target_nodes,
    )
    params = model.init(jax.random.PRNGKey(0), *args)
    opt = make_optimizer(1e-3)
    state = create_train_state(params, len(TASKS), opt, jax.random.PRNGKey(1))
    cfg = StepConfig(
        task_dict=TASKS, active_tasks=("cadence",), compute_dtype="bfloat16",
    )
    step = make_train_step(model, opt, cfg)
    state, aux = step(state, batch)
    assert np.isfinite(float(aux["total_loss"]))
    # master params stay fp32
    leaf = jax.tree_util.tree_leaves(state.params)[0]
    assert leaf.dtype == jnp.float32


def test_smote_path_runs():
    sampler = make_sampler()
    nodes, edges = metadata(False, False)
    model = AnalysisGNN(
        metadata=(nodes, edges), in_channels=25, hidden_channels=16,
        out_channels=8, task_dict=TASKS, num_layers=1, dropout=0.0,
    )
    batch = sampler.sample_batch([0, 1])
    attrs = batch.node_attrs[NOTE]
    args = (
        batch.x_dict(), batch.edge_index_dict(), batch.batch,
        attrs["pitch_spelling"], attrs["key_signature"], batch.num_target_nodes,
    )
    params = model.init(jax.random.PRNGKey(0), *args)
    opt = make_optimizer(1e-3)
    state = create_train_state(params, len(TASKS), opt, jax.random.PRNGKey(1))
    cfg = StepConfig(
        task_dict=TASKS, active_tasks=("cadence",), use_smote=True,
        smote_synthetic=32,
    )
    step = make_train_step(model, opt, cfg)
    state, aux = step(state, batch)
    assert np.isfinite(float(aux["total_loss"]))


def test_multi_step_scan_matches_sequential():
    """K steps under one lax.scan == K sequential jitted steps (exactly)."""
    import dataclasses as dc

    from analysisgnn_tpu.train.step import make_train_step_multi, stack_batches

    sampler = make_sampler()
    nodes, edges = metadata(False, False)
    model = AnalysisGNN(
        metadata=(nodes, edges),
        in_channels=25,
        hidden_channels=32,
        out_channels=16,
        task_dict=TASKS,
        num_layers=2,
        dropout=0.0,
        encoder_type="hybridgnn",
    )
    batch = sampler.sample_batch([0, 1])
    attrs = batch.node_attrs[NOTE]
    args = (
        batch.x_dict(),
        batch.edge_index_dict(),
        batch.batch,
        attrs["pitch_spelling"],
        attrs["key_signature"],
        batch.num_target_nodes,
    )
    params = model.init(jax.random.PRNGKey(0), *args)
    opt = make_optimizer(warmup_cosine_schedule(5e-3, total_steps=60))
    cfg = StepConfig(
        task_dict=TASKS, active_tasks=("cadence", "localkey"), mt_strategy="wloss"
    )
    batches = [sampler.sample_batch([0, 1]) for _ in range(3)]

    state_a = create_train_state(params, len(TASKS), opt, jax.random.PRNGKey(1))
    single = make_train_step(model, opt, cfg)
    seq_losses = []
    for b in batches:
        state_a, aux = single(state_a, b)
        seq_losses.append(float(aux["total_loss"]))

    state_b = create_train_state(params, len(TASKS), opt, jax.random.PRNGKey(1))
    multi = make_train_step_multi(model, opt, cfg)
    state_b, auxes = multi(state_b, stack_batches(batches))

    np.testing.assert_allclose(
        np.asarray(auxes["total_loss"]), np.asarray(seq_losses), rtol=1e-6
    )
    assert int(state_b.step) == int(state_a.step) == 3
    pa = jax.tree_util.tree_leaves(state_a.params)
    pb = jax.tree_util.tree_leaves(state_b.params)
    for a, b in zip(pa, pb):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
