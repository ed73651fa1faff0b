"""Bisect the dropout-0.3 convergence gap vs the torch anchor
(VERDICT r2 ask #1 follow-through).

Observed: at the verbatim reference recipe (lr=5e-3, dropout=0.3,
50 epochs = 650 steps on the parity corpus) the torch anchor reaches
root_acc ~0.79 while the default AnalysisGNN reaches ~0.38 — yet at
dropout=0 the same two models roughly match.  Every static difference has
been eliminated (per-layer golden tests, same data stream, same schedule,
same clip/wd, same aggregation semantics), so this script trains the SAME
650-step recipe under controlled toggles and probes held-out accuracy
every ~65 steps to find what interacts with dropout:

    default        AnalysisGNN defaults via make_train_step (no CLI loop)
    final-dropout  dropout also after the final conv (anchor places it there)
    torch-init     flax Dense kernels re-drawn from torch Linear's
                   U(-1/sqrt(fan_in), ...) (init-scale interaction)
    split-clip     clip model grads to 1.0 WITHOUT the wloss params in the
                   norm (round-2 anchor behavior)
    torch-twin     the RefModel anchor itself on the identical stream

    python scripts/dropout_bisect.py [arm ...]

Writes bench_queue/dropout_bisect.json.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "scripts"))

DATA_DIR = os.path.join(ROOT, "data_synth")
SPLIT_FILE = os.path.join(DATA_DIR, "test_split.json")
EPOCHS = 50
PROBE_TASKS = ("root", "localkey", "quality", "bass")


def build_dm():
    from analysisgnn_tpu.data.corpus import CorpusConfig, DLCTsvCorpus
    from analysisgnn_tpu.data.datamodule import AnalysisDataModule, DataModuleConfig

    with open(SPLIT_FILE) as f:
        test_names = json.load(f)
    ccfg = CorpusConfig(
        cache_dir=os.path.join(DATA_DIR, ".cache"), feature_type="voice",
        transpose=True,
    )
    corpus = DLCTsvCorpus(
        ccfg, os.path.join(DATA_DIR, "all"), test_names=test_names, dlc=True
    ).load()
    dm_cfg = DataModuleConfig(subgraph_size=500, batch_size=8, augment=True, seed=0)
    return AnalysisDataModule({"all": corpus.samples}, dm_cfg).setup()


def probe_jax(state, test_step, test_batches):
    import jax.numpy as jnp

    acc = {t: [0.0, 0.0] for t in PROBE_TASKS}
    for b in test_batches:
        out = test_step(state, b)
        for t in PROBE_TASKS:
            k = f"{t}_acc"
            if k in out:
                w = float(out.get(f"{k}__w", 1.0))
                acc[t][0] += float(out[k]) * w
                acc[t][1] += w
    return {t: round(a / max(w, 1e-9), 4) for t, (a, w) in acc.items()}


def run_jax_arm(arm: str, dm) -> dict:
    import jax
    import jax.numpy as jnp

    from analysisgnn_tpu.core.graph import NOTE, metadata
    from analysisgnn_tpu.models.analysis import AnalysisGNN
    from analysisgnn_tpu.theory.vocab import TASK_DICT
    from analysisgnn_tpu.train.schedules import warmup_cosine_schedule
    from analysisgnn_tpu.train.state import create_train_state, make_optimizer
    from analysisgnn_tpu.train.step import StepConfig, make_train_step, make_test_step

    tasks = tuple(TASK_DICT.items())
    steps_per_epoch = dm.steps_per_epoch("all")
    total_steps = steps_per_epoch * EPOCHS

    if arm == "final-dropout":
        import functools

        from analysisgnn_tpu.models import encoders

        orig_enc = encoders.ENCODERS["hybridgnn"]
        encoders.ENCODERS["hybridgnn"] = functools.partial(
            orig_enc, final_dropout=True
        )
    model = AnalysisGNN(
        metadata=metadata(False, False), in_channels=dm.feature_dim,
        hidden_channels=256, out_channels=128, task_dict=tasks,
        num_layers=3, dropout=0.3, logit_fusion=False,
        encoder_type="hybridgnn",
        # the decisive toggle: the model-class default (use_jk=True, same
        # as the reference's AnalysisGNN ctor analysis.py:422) converges at
        # the verbatim recipe; the round-2 CLI default (False) does not
        use_jk=(arm != "no-jk"),
    )
    example = next(iter(dm.train_batches("all", 1)))
    a0 = example.node_attrs[NOTE]
    init_args = (
        example.x_dict(), example.edge_index_dict(), example.batch,
        a0["pitch_spelling"], a0["key_signature"], example.num_target_nodes,
    )
    params = model.init(jax.random.PRNGKey(0), *init_args)
    # NOTE: the final-dropout ENCODERS patch must stay active for the whole
    # arm — flax re-runs setup() on every apply, so restoring early would
    # silently train without the final dropout.  Restored at arm end below.

    if arm == "torch-init":
        # torch nn.Linear default: U(-1/sqrt(fan_in), +1/sqrt(fan_in)) for
        # kernel AND bias (flax: lecun_normal kernel, zero bias)
        rng = np.random.default_rng(0)

        def reinit(path, leaf):
            name = "/".join(str(p) for p in path)
            if leaf.ndim >= 2 and "kernel" in name:
                fan_in = leaf.shape[-2]
                bound = 1.0 / np.sqrt(fan_in)
                return jnp.asarray(
                    rng.uniform(-bound, bound, leaf.shape).astype(np.float32)
                )
            if leaf.ndim >= 1 and "bias" in name and leaf.ndim == 1:
                bound = 1.0 / np.sqrt(max(leaf.shape[-1], 1))
                return jnp.asarray(
                    rng.uniform(-bound, bound, leaf.shape).astype(np.float32)
                )
            return leaf

        params = jax.tree_util.tree_map_with_path(reinit, params)

    active = tuple(t for t, _ in tasks if t in a0)
    opt = make_optimizer(warmup_cosine_schedule(5e-3, total_steps=total_steps))
    if arm == "split-clip":
        import optax

        # round-2 anchor behavior: model grads clipped alone; wloss params
        # updated with UNCLIPPED grads
        base = optax.adamw(
            warmup_cosine_schedule(5e-3, total_steps=total_steps),
            weight_decay=5e-3,
        )
        clip = optax.clip_by_global_norm(1.0)

        def split_clip_update(updates, state_, params_=None):
            model_u, mt_u = updates
            model_u, cstate = clip.update(model_u, state_[0], None)
            return (model_u, mt_u), (cstate,)

        opt = optax.chain(
            optax.GradientTransformation(
                lambda p: (clip.init(p[0]),), split_clip_update
            ),
            base,
        )
    state = create_train_state(params, len(tasks), opt, jax.random.PRNGKey(1))
    cfg = StepConfig(task_dict=tasks, active_tasks=active, mt_strategy="wloss")
    train_step = make_train_step(model, opt, cfg)
    test_step = make_test_step(model, cfg)
    test_batches = list(dm.test_batches("all"))

    curve = []
    step_i = 0
    for epoch in range(EPOCHS):
        for batch in dm.train_batches("all", steps_per_epoch):
            state, aux = train_step(state, batch)
            step_i += 1
        if epoch % 5 == 4 or epoch == EPOCHS - 1:
            p = probe_jax(state, test_step, test_batches)
            p["step"] = step_i
            curve.append(p)
            print(json.dumps({"arm": arm, **p}), flush=True)
    if arm == "final-dropout":
        encoders.ENCODERS["hybridgnn"] = orig_enc
    return {"arm": arm, "curve": curve}


def run_cli_trainer(dm) -> dict:
    """The ACTUAL production Trainer (train/loop.py) on the same dm —
    reproduces (or exonerates) the CLI-path convergence gap."""
    from analysisgnn_tpu.core.graph import metadata
    from analysisgnn_tpu.models.analysis import AnalysisGNN
    from analysisgnn_tpu.theory.vocab import TASK_DICT
    from analysisgnn_tpu.train.loop import TrainConfig, Trainer

    tasks = tuple(TASK_DICT.items())
    model = AnalysisGNN(
        metadata=metadata(False, False), in_channels=dm.feature_dim,
        hidden_channels=256, out_channels=128, task_dict=tasks,
        num_layers=3, dropout=0.3, logit_fusion=False,
        encoder_type="hybridgnn",
    )
    cfg = TrainConfig(
        num_epochs=EPOCHS, lr=5e-3, weight_decay=5e-3, main_tasks=["all"],
        checkpoint_dir="/tmp/bisect_cli_ckpt", log_path=None, seed=0,
    )
    trainer = Trainer(model, dm, dict(tasks), cfg)
    state = trainer.fit()
    curve = [
        {t: round(r.get(f"val/{t}_acc", -1.0), 4) for t in PROBE_TASKS}
        | {"step": (r.get("epoch", 0) + 1) * dm.steps_per_epoch("all")}
        for r in trainer.history
        if any(f"val/{t}_acc" in r for t in PROBE_TASKS)
    ]
    for p in curve[-3:]:
        print(json.dumps({"arm": "cli-trainer", **p}), flush=True)
    return {"arm": "cli-trainer", "curve": curve}


def run_torch_twin(dm) -> dict:
    import torch

    from bench_torch_reference import RefModel
    from parity_experiment import _RELATIONS, _unpack, _torch_eval
    from analysisgnn_tpu.core.graph import NOTE
    from analysisgnn_tpu.theory.vocab import TASK_DICT
    from analysisgnn_tpu.train.schedules import warmup_cosine_schedule
    from analysisgnn_tpu.train.step import TASK_MASK_ATTRS

    tasks = tuple(TASK_DICT.items())
    steps_per_epoch = dm.steps_per_epoch("all")
    total_steps = steps_per_epoch * EPOCHS
    model = RefModel(dm.feature_dim, 256, 128, _RELATIONS, tasks, dropout=0.3)
    wloss_p = torch.nn.Parameter(torch.ones(len(tasks)))
    optim = torch.optim.AdamW(
        list(model.parameters()) + [wloss_p], lr=5e-3, weight_decay=5e-3
    )
    sched = warmup_cosine_schedule(5e-3, total_steps=total_steps)

    def masked_ce(logits, labels, mask):
        lw = torch.from_numpy(mask.astype(np.float32))
        ls = torch.nn.functional.cross_entropy(
            logits, labels, label_smoothing=0.1, reduction="none"
        )
        return (ls * lw).sum() / lw.sum().clamp(min=1.0)

    curve = []
    step_i = 0
    for epoch in range(EPOCHS):
        model.train()
        for batch in dm.train_batches("all", steps_per_epoch):
            x, ps, ks, edges, labels, base, _ = _unpack(batch, tasks)
            for g in optim.param_groups:
                g["lr"] = float(sched(step_i))
            optim.zero_grad()
            logits = model(x, ps, ks, edges)
            total = 0.0
            for ti, (t, _c) in enumerate(tasks):
                if t not in labels:
                    continue
                mask = base.copy()
                mattr = TASK_MASK_ATTRS.get(t)
                if mattr and mattr in batch.node_attrs[NOTE]:
                    m = np.asarray(batch.node_attrs[NOTE][mattr])[: len(mask)]
                    mask &= m.astype(bool)
                l_t = masked_ce(logits[t], labels[t], mask)
                p = wloss_p[ti]
                total = total + 0.5 / p.pow(2) * l_t + torch.log1p(p.pow(2))
            total.backward()
            torch.nn.utils.clip_grad_norm_(
                list(model.parameters()) + [wloss_p], 1.0
            )
            optim.step()
            step_i += 1
        if epoch % 5 == 4 or epoch == EPOCHS - 1:
            m = _torch_eval(model, dm, tasks)
            p = {t: round(m.get(f"all/{t}_acc", -1), 4) for t in PROBE_TASKS}
            p["step"] = step_i
            curve.append(p)
            print(json.dumps({"arm": "torch-twin", **p}), flush=True)
    return {"arm": "torch-twin", "curve": curve}


def main() -> None:
    arms = sys.argv[1:] or ["default", "split-clip", "torch-init"]
    dm = build_dm()
    out_path = os.path.join(ROOT, "bench_queue", "dropout_bisect.json")
    recs = {}
    if os.path.exists(out_path):
        with open(out_path) as f:
            recs = json.load(f)
    for arm in arms:
        rec = run_torch_twin(dm) if arm == "torch-twin" else run_jax_arm(arm, dm)
        recs[arm] = rec
        with open(out_path, "w") as f:
            json.dump(recs, f, indent=1)


if __name__ == "__main__":
    main()
