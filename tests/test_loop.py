"""Continual-learning Trainer: CL task sequence, checkpoints, teacher swap."""

import numpy as np
import pytest

from analysisgnn_tpu.data.corpus import samples_from_note_array
from analysisgnn_tpu.data.datamodule import AnalysisDataModule, DataModuleConfig
from analysisgnn_tpu.data.note_array import synthetic_score
from analysisgnn_tpu.train.loop import TrainConfig, Trainer, expand_main_task
from analysisgnn_tpu.theory.vocab import TASK_DICT


def make_dm():
    def label_pack(na):
        return {
            "cadence": (na["pitch"] % 4).astype(np.int64),
            "localkey": (na["pitch"] % 50).astype(np.int64),
            "tonkey": (na["pitch"] % 50).astype(np.int64),
            "quality": (na["pitch"] % 15).astype(np.int64),
            "root": (na["pitch"] % 38).astype(np.int64),
            "bass": (na["pitch"] % 38).astype(np.int64),
            "inversion": (na["pitch"] % 4).astype(np.int64),
            "degree1": (na["pitch"] % 22).astype(np.int64),
            "degree2": (na["pitch"] % 22).astype(np.int64),
            "valid_label": np.ones(len(na), np.int64),
        }

    tasks = {}
    for main in ("cadence", "rna"):
        ss = []
        for i in range(4):
            na = synthetic_score(48, seed=i)
            ss += samples_from_note_array(
                na,
                name=f"{main}{i}",
                transpositions=("P1",),
                add_beats=False,
                add_measures=False,
                labels=label_pack(na),
                test=(i == 3),
            )
        tasks[main] = ss
    return AnalysisDataModule(
        tasks, DataModuleConfig(subgraph_size=24, batch_size=2, num_neighbors=(3,))
    ).setup()


def test_expand_main_task():
    assert expand_main_task("cadence", TASK_DICT) == ("cadence",)
    assert "localkey" in expand_main_task("rna", TASK_DICT)
    assert len(expand_main_task("all", TASK_DICT)) == len(TASK_DICT)


@pytest.mark.slow
def test_cl_training_sequence(tmp_path):
    dm = make_dm()
    cfg = TrainConfig(
        num_layers=1,
        hidden_channels=16,
        out_channels=8,
        dropout=0.0,
        cl_training=True,
        main_tasks=("cadence", "rna"),
        epochs_per_task=(1, 1),
        checkpoint_dir=str(tmp_path / "ckpt"),
        log_path=str(tmp_path / "log.jsonl"),
        lambda_dctn=0.5,
        use_ewc=True,
    )
    trainer = Trainer(cfg, dm)
    state = trainer.fit(max_steps_per_epoch=2)
    assert (tmp_path / "ckpt" / "cadence_model").exists()
    assert (tmp_path / "ckpt" / "rna_model").exists()
    assert (tmp_path / "ckpt" / "last").exists()
    assert len(trainer.history) == 2
    assert np.isfinite(trainer.history[0]["train_loss"])
    # teacher was refreshed at the switch → distillation fisher accumulated
    fisher_norm = sum(
        float(np.abs(np.asarray(l)).sum())
        for l in __import__("jax").tree_util.tree_leaves(state.fisher)
    )
    assert fisher_norm > 0


def test_checkpoint_roundtrip(tmp_path):
    dm = make_dm()
    cfg = TrainConfig(
        num_layers=1, hidden_channels=16, out_channels=8, dropout=0.0,
        cl_training=True, main_tasks=("cadence",), epochs_per_task=(1,),
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    trainer = Trainer(cfg, dm)
    state = trainer.fit(max_steps_per_epoch=1)
    restored = trainer.restore_checkpoint(state, "last")
    import jax

    same = jax.tree_util.tree_map(
        lambda a, b: np.array_equal(np.asarray(a), np.asarray(b)),
        state.params,
        restored.params,
    )
    assert all(jax.tree_util.tree_leaves(same))


def test_trainer_evaluate(tmp_path):
    dm = make_dm()
    cfg = TrainConfig(
        num_layers=1, hidden_channels=16, out_channels=8, dropout=0.0,
        cl_training=True, main_tasks=("rna",), epochs_per_task=(1,),
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    trainer = Trainer(cfg, dm)
    state = trainer.fit(max_steps_per_epoch=1)
    metrics = trainer.evaluate(state, split="test")
    assert any(k.endswith("rna_onset_acc") for k in metrics), metrics.keys()
    assert all(np.isfinite(v) for v in metrics.values())


def test_combined_mode_training(tmp_path):
    dm = make_dm()
    cfg = TrainConfig(
        num_layers=1, hidden_channels=16, out_channels=8, dropout=0.0,
        cl_training=False, main_tasks=("cadence", "rna"), num_epochs=1,
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    trainer = Trainer(cfg, dm)
    state = trainer.fit(max_steps_per_epoch=2)
    assert trainer.history and np.isfinite(trainer.history[0]["train_loss"])


def test_full_state_checkpoint_roundtrip(tmp_path):
    import jax

    dm = make_dm()
    cfg = TrainConfig(
        num_layers=1, hidden_channels=16, out_channels=8, dropout=0.0,
        cl_training=True, main_tasks=("cadence",), epochs_per_task=(1,),
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    trainer = Trainer(cfg, dm)
    state = trainer.fit(max_steps_per_epoch=2)
    trainer.save_full_state(state, "full")
    # perturb then restore — everything must come back, incl. step counter
    import dataclasses as dc
    import jax.numpy as jnp

    zeroed = dc.replace(
        state,
        step=jnp.asarray(0, jnp.int32),
        params=jax.tree_util.tree_map(jnp.zeros_like, state.params),
    )
    restored = trainer.restore_full_state(zeroed, "full")
    assert int(restored.step) == int(state.step) and int(state.step) > 0
    same = jax.tree_util.tree_map(
        lambda a, b: np.array_equal(np.asarray(a), np.asarray(b)),
        state.params, restored.params,
    )
    assert all(jax.tree_util.tree_leaves(same))
    opt_same = jax.tree_util.tree_map(
        lambda a, b: np.array_equal(np.asarray(a), np.asarray(b)),
        state.opt_state, restored.opt_state,
    )
    assert all(jax.tree_util.tree_leaves(opt_same))


def test_scan_steps_training(tmp_path):
    """scan_steps>1 fuses K updates per dispatch; epoch still runs all steps
    (incl. the remainder chunk) and logs finite per-step losses."""
    dm = make_dm()
    cfg = TrainConfig(
        num_layers=1,
        hidden_channels=16,
        out_channels=8,
        dropout=0.0,
        cl_training=True,
        main_tasks=("cadence",),
        epochs_per_task=(1,),
        checkpoint_dir=str(tmp_path / "ckpt"),
        scan_steps=2,
    )
    trainer = Trainer(cfg, dm)
    state = trainer.fit(max_steps_per_epoch=5)  # 2 scans of 2 + remainder 1
    assert int(state.step) == 5
    assert np.isfinite(trainer.history[0]["train_loss"])


@pytest.mark.slow
def test_cl_training_full_feature_stack(tmp_path):
    """CL sequencing with logit fusion + RNN smoothing + HGT emax grouping
    all ON — the round-2 gap where these paths had only been exercised as
    isolated forwards (docs/STATUS.md r2 priority 5)."""
    dm = make_dm()
    cfg = TrainConfig(
        num_layers=1,
        hidden_channels=16,
        out_channels=8,
        dropout=0.0,
        model="HGT",
        hgt_group_mode="emax",
        logit_fusion=True,
        use_rnn=True,
        cl_training=True,
        main_tasks=("cadence", "rna"),
        epochs_per_task=(1, 1),
        checkpoint_dir=str(tmp_path / "ckpt"),
        log_path=str(tmp_path / "log.jsonl"),
        lambda_dctn=0.5,
    )
    trainer = Trainer(cfg, dm)
    trainer.fit(max_steps_per_epoch=2)
    assert (tmp_path / "ckpt" / "cadence_model").exists()
    assert len(trainer.history) == 2
    assert all(np.isfinite(h["train_loss"]) for h in trainer.history)
