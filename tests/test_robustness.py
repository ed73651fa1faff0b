"""Round-2 robustness/metric fixes: NaN-step skip, note-weighted metric
accumulation, split-level macro-F1, sampler overflow counter, SWA.

Reference behaviors: NaN skip analysisgnn/models/analysis.py:732-733;
torchmetrics split-level accumulation models/analysis.py:890-891;
StochasticWeightAveraging train/train_analysisgnn.py:243-245.
"""

import dataclasses

import numpy as np
import pytest

from analysisgnn_tpu.core.graph import NOTE


def _tiny_setup():
    import jax

    from analysisgnn_tpu.data.corpus import samples_from_note_array
    from analysisgnn_tpu.data.note_array import synthetic_score
    from analysisgnn_tpu.data.sampler import SamplerConfig, SubgraphSampler
    from analysisgnn_tpu.models.analysis import AnalysisGNN
    from analysisgnn_tpu.core.graph import metadata
    from analysisgnn_tpu.train.state import create_train_state, make_optimizer
    from analysisgnn_tpu.train.step import StepConfig, make_train_step

    na = synthetic_score(64, seed=0)
    labels = {
        "cadence": (na["pitch"].astype(np.int64)) % 3,
        "valid_label": np.ones(len(na), np.int64),
    }
    samples = samples_from_note_array(na, name="s", labels=labels)
    sampler = SubgraphSampler(
        samples, SamplerConfig(subgraph_size=32, batch_size=1, seed=0)
    )
    batch = sampler.sample_batch([0])
    task_dict = (("cadence", 3),)
    nodes, edges = metadata(False, False)
    model = AnalysisGNN(
        metadata=(nodes, edges),
        in_channels=batch.node_features[NOTE].shape[1],
        hidden_channels=16,
        out_channels=8,
        task_dict=task_dict,
        num_layers=2,
        dropout=0.0,
    )
    attrs = batch.node_attrs[NOTE]
    args = (
        batch.x_dict(), batch.edge_index_dict(), batch.batch,
        attrs["pitch_spelling"], attrs["key_signature"], batch.num_target_nodes,
    )
    params = model.init(jax.random.PRNGKey(0), *args, method=model.full_init)
    opt = make_optimizer(1e-3)
    state = create_train_state(params, 1, opt, jax.random.PRNGKey(1))
    cfg = StepConfig(task_dict=task_dict, active_tasks=("cadence",))
    step = make_train_step(model, opt, cfg)
    return state, batch, step


def test_nan_batch_does_not_poison_params():
    import jax
    import jax.numpy as jnp

    state, batch, step = _tiny_setup()
    # one good step so optimizer state is warm
    state, aux = step(state, batch)
    assert float(aux["skipped_nonfinite"]) == 0.0
    before = jax.tree_util.tree_map(np.asarray, state.params)

    bad_feats = dict(batch.node_features)
    bad_feats[NOTE] = batch.node_features[NOTE].at[0, 0].set(jnp.nan)
    bad_batch = dataclasses.replace(batch, node_features=bad_feats)
    state, aux = step(state, bad_batch)
    assert float(aux["skipped_nonfinite"]) == 1.0
    after = jax.tree_util.tree_map(np.asarray, state.params)
    for a, b in zip(
        jax.tree_util.tree_leaves(before), jax.tree_util.tree_leaves(after)
    ):
        np.testing.assert_array_equal(a, b)
    # a further good step still updates
    state2, aux2 = step(state, batch)
    assert float(aux2["skipped_nonfinite"]) == 0.0
    changed = any(
        not np.array_equal(a, np.asarray(b))
        for a, b in zip(
            jax.tree_util.tree_leaves(after),
            jax.tree_util.tree_leaves(state2.params),
        )
    )
    assert changed


def test_weighted_accumulation_weights_by_note_count():
    import jax.numpy as jnp

    from analysisgnn_tpu.train.metrics import (
        accumulate_weighted,
        finalize_weighted,
    )

    acc = {}
    # batch 1: acc 1.0 over 10 notes; batch 2: acc 0.0 over 1000 notes
    accumulate_weighted(acc, {"x_acc": jnp.asarray(1.0), "x_acc__w": jnp.asarray(10.0)})
    accumulate_weighted(acc, {"x_acc": jnp.asarray(0.0), "x_acc__w": jnp.asarray(1000.0)})
    out = finalize_weighted(acc)
    np.testing.assert_allclose(out["x_acc"], 10.0 / 1010.0, rtol=1e-6)


def test_f1_stats_accumulate_to_sklearn_macro_f1():
    import jax.numpy as jnp
    from sklearn.metrics import f1_score

    from analysisgnn_tpu.train.metrics import f1_stats, finalize_f1

    rng = np.random.default_rng(0)
    C = 5
    stats = 0.0
    all_true, all_pred = [], []
    for _ in range(3):
        labels = rng.integers(0, C, 50)
        logits = rng.normal(size=(50, C)).astype(np.float32)
        w = rng.integers(0, 2, 50).astype(bool)
        stats = stats + np.asarray(
            f1_stats(jnp.asarray(logits), jnp.asarray(labels), jnp.asarray(w), C)
        )
        all_true += list(labels[w])
        all_pred += list(np.argmax(logits, -1)[w])
    present = sorted(set(all_true))
    expected = f1_score(all_true, all_pred, labels=present, average="macro")
    np.testing.assert_allclose(finalize_f1(stats), expected, rtol=1e-6)


def test_sampler_overflow_counter():
    from analysisgnn_tpu.data.corpus import samples_from_note_array
    from analysisgnn_tpu.data.note_array import synthetic_score
    from analysisgnn_tpu.data.sampler import SamplerConfig, SubgraphSampler

    na = synthetic_score(128, seed=0)
    labels = {"valid_label": np.ones(len(na), np.int64)}
    samples = samples_from_note_array(na, name="s", labels=labels)
    cfg = SamplerConfig(
        subgraph_size=64,
        batch_size=1,
        edge_capacity_per_note={k: 1 for k in
                                ["onset", "consecutive", "during", "rest",
                                 "consecutive_rev", "during_rev", "rest_rev"]},
        node_capacity_factor=1.0,
    )
    sampler = SubgraphSampler(samples, cfg)
    with pytest.warns(RuntimeWarning, match="dropped"):
        sampler.sample_batch([0])
    assert sampler.overflow_batches >= 1
    assert sum(sampler.edge_overflow.values()) > 0


def test_evaluate_reports_macro_f1(tmp_path):
    from analysisgnn_tpu.train.loop import TrainConfig, Trainer
    from tests.test_loop import make_dm

    dm = make_dm()
    cfg = TrainConfig(
        num_layers=2, hidden_channels=16, out_channels=8, num_epochs=1,
        main_tasks=tuple(dm.main_tasks), checkpoint_dir=str(tmp_path),
    )
    trainer = Trainer(cfg, dm)
    state = trainer.fit(max_steps_per_epoch=1)
    metrics = trainer.evaluate(state, split="test")
    assert any(k.endswith("cadence_f1") for k in metrics), metrics.keys()
    for v in metrics.values():
        assert np.isfinite(v)


def test_swa_checkpoint_written(tmp_path):
    from analysisgnn_tpu.train.loop import TrainConfig, Trainer
    from tests.test_loop import make_dm

    dm = make_dm()
    cfg = TrainConfig(
        num_layers=2, hidden_channels=16, out_channels=8, num_epochs=2,
        main_tasks=tuple(dm.main_tasks), checkpoint_dir=str(tmp_path),
        use_swa=True, swa_start_frac=0.0,
    )
    trainer = Trainer(cfg, dm)
    trainer.fit(max_steps_per_epoch=1)
    import os

    assert os.path.isdir(os.path.join(str(tmp_path), "swa"))
