"""Continual-learning training orchestration.

The trainer-level logic of the reference (Lightning ``Trainer`` +
``ContinualAnalysisGNN`` hooks, analysisgnn/train/train_analysisgnn.py:
237-260 and models/analysis.py:1082-1182): epoch loop, per-task epoch budget
with task switching at boundaries (:1166-1182, ``set_task`` :1307-1324),
frozen-teacher refresh at each switch (:1370-1378), optional EWC fisher
accumulation from validation replay (:1326-1368), best/last checkpointing
(Orbax instead of Lightning ModelCheckpoint), and CSV metric logging in place
of W&B.
"""

from __future__ import annotations

import dataclasses
import json
import os
import time
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import numpy as np

from analysisgnn_tpu.core.graph import metadata
from analysisgnn_tpu.data.datamodule import AnalysisDataModule
from analysisgnn_tpu.models.analysis import AnalysisGNN
from analysisgnn_tpu.theory.vocab import TASK_DICT
from analysisgnn_tpu.train.schedules import warmup_cosine_schedule
from analysisgnn_tpu.train.state import (
    create_train_state,
    make_optimizer,
    snapshot_ewc_anchor,
    update_teacher,
)
from analysisgnn_tpu.train.step import (
    StepConfig,
    make_eval_step,
    make_fisher_step,
    make_test_step,
    make_train_step,
    make_train_step_multi,
    stack_batches,
)

# composite main-task → constituent head names (reference set_task expansion,
# models/analysis.py:1312-1320)
RNA_TASKS = ("localkey", "tonkey", "quality", "root", "bass", "inversion", "degree1", "degree2")


def expand_main_task(task: str, task_dict: Dict[str, int]) -> Tuple[str, ...]:
    if task == "rna":
        return RNA_TASKS
    if task == "all":
        return tuple(task_dict.keys())
    return (task,)


@dataclasses.dataclass
class TrainConfig:
    # mirrors the reference CLI surface (train_analysisgnn.py:48-108)
    num_layers: int = 3
    hidden_channels: int = 256
    out_channels: int = 128
    dropout: float = 0.3
    lr: float = 0.005
    weight_decay: float = 5e-3
    model: str = "HybridGNN"  # HybridGNN | HGT | MetricalGNN
    use_jk: bool = True
    logit_fusion: bool = False
    use_rnn: bool = False
    # ReLU→L2-norm after the FINAL conv (HybridGNN): bounds the encoder
    # output, which is what lets the multi-task recipe train stably at the
    # reference lr=5e-3 (scripts/variant_sweep.py arm "fnorm").  Default ON
    # since round 3 so the out-of-the-box run trains cleanly at the
    # reference recipe.
    final_norm: bool = True
    # Single-Dense projections (measured-stable default); False restores the
    # reference's deep projection stacks (models/mlp.py)
    plain_proj: bool = True
    # Pallas fused aggregation in the HybridGNN conv path; implies the
    # sampler must emit src-sorted edges (wired by the CLI).
    use_pallas: bool = False
    # HGT relation-stack grouping ("pair" | "emax", models/encoders.py)
    hgt_group_mode: str = "pair"
    # per-layer rematerialization (HybridGNN): memory lever for very long
    # full-graph training (models/encoders.py::HybridGNN.remat)
    remat: bool = False
    # fused-SAGE implementation ("node" | "edge" | "edge-zxp"): "node" wins
    # at the sampled-subgraph training shape (dispatch-bound), "edge" at
    # bandwidth-bound full-graph scale (models/fused.py; roofline A/B in
    # docs/STATUS.md)
    conv_impl: str = "node"
    # HGT q/k/v + edge-transform staging dtype (models/encoders.py HGTLayer)
    hgt_stage_dtype: str = "float32"
    # HGT softmax stabilizer (HGTLayer.softmax_stab; "global" default r5)
    hgt_softmax_stab: str = "global"
    # torch-nn.Linear-style uniform init for Dense kernels/biases — the
    # reference's effective init; measurably faster convergence at the
    # reference recipe (train/state.py::torch_style_reinit)
    torch_init: bool = True
    # extend the torch-style draw to the fused batched linears (relation-
    # batched SAGE weights + per-task head stacks) that the reference
    # implements as individual torch nn.Linears; False reproduces the
    # round-4 Dense-only scope for bisects (train/state.py docstring)
    fused_torch_init: bool = True
    # dropout after the final conv too (encoders.HybridGNN.final_dropout)
    final_dropout: bool = False
    mt_strategy: str = "wloss"
    lambda_dctn: float = 0.5
    lambda_featl: float = 0.1
    lambda_ewc: float = 2.0
    use_ewc: bool = False
    use_edge_loss: bool = False
    lambda_edge: float = 0.1
    use_smote: bool = False
    use_swa: bool = False  # stochastic weight averaging (reference
    # StochasticWeightAveraging callback, train_analysisgnn.py:243-245)
    swa_start_frac: float = 0.75  # fraction of total epochs before averaging
    cl_training: bool = False
    main_tasks: Tuple[str, ...] = ("all", "cadence", "rna")
    epochs_per_task: Tuple[int, ...] = ()
    num_epochs: int = 50
    add_beats: bool = False
    add_measures: bool = False
    seed: int = 0
    checkpoint_dir: str = "checkpoints"
    log_path: Optional[str] = None
    use_wandb: bool = False
    resume: bool = False  # restore full state from checkpoint_dir/full
    # run K optimizer updates per device dispatch via lax.scan over K staged
    # batches (bit-identical to K single steps — tests/test_train_step.py);
    # amortizes per-dispatch latency, which dominates on remote-tunnel links
    scan_steps: int = 1
    # sampling worker threads (reference DataLoader num_workers,
    # train_analysisgnn.py:60): >1 spawns that many independently-seeded
    # sampler clones feeding a shared prefetch queue — batch assembly and the
    # device upload release the GIL, so the host keeps up with a ~30 ms
    # device step.  <=1 keeps the single deterministic prefetch stream.
    num_workers: int = 0
    # every N global epochs, run the full TEST-split evaluation and append
    # one JSON line to <checkpoint_dir>/test_curve.jsonl — the win-count-vs-
    # steps crossover evidence (VERDICT r3 ask #1).  0 disables.
    test_eval_every: int = 0


class Trainer:
    def __init__(self, config: TrainConfig, datamodule: AnalysisDataModule):
        self.cfg = config
        self.dm = datamodule
        self.task_dict = dict(TASK_DICT)
        nodes, edges = metadata(config.add_beats, config.add_measures)
        self.model = AnalysisGNN(
            metadata=(nodes, edges),
            in_channels=datamodule.feature_dim,
            hidden_channels=config.hidden_channels,
            out_channels=config.out_channels,
            task_dict=tuple(self.task_dict.items()),
            num_layers=config.num_layers,
            dropout=config.dropout,
            use_jk=config.use_jk,
            logit_fusion=config.logit_fusion,
            use_rnn=config.use_rnn,
            encoder_type=config.model.lower(),
            use_edge_decoder=config.use_edge_loss,
            final_norm=config.final_norm,
            plain_proj=config.plain_proj,
            use_pallas=config.use_pallas,
            hgt_group_mode=config.hgt_group_mode,
            remat=config.remat,
            conv_impl=config.conv_impl,
            hgt_stage_dtype=config.hgt_stage_dtype,
            hgt_softmax_stab=config.hgt_softmax_stab,
            final_dropout=config.final_dropout,
        )
        self.history: List[Dict] = []
        self.best_val = float("inf")
        self._step_cache: Dict = {}

    # ------------------------------------------------------------------ #

    def _init_state(self, example_batch):
        from analysisgnn_tpu.core.graph import NOTE

        attrs = example_batch.node_attrs[NOTE]
        args = (
            example_batch.x_dict(),
            example_batch.edge_index_dict(),
            example_batch.batch,
            attrs["pitch_spelling"],
            attrs["key_signature"],
            example_batch.num_target_nodes,
        )
        params = self.model.init(
            jax.random.PRNGKey(self.cfg.seed), *args, method=self.model.full_init
        )
        if self.cfg.torch_init:
            from analysisgnn_tpu.train.state import torch_style_reinit

            params = torch_style_reinit(
                params, seed=self.cfg.seed, fused=self.cfg.fused_torch_init
            )
        total_steps = sum(self._epochs_per_task()) * max(
            self.dm.steps_per_epoch(self.dm.main_tasks[0]), 1
        )
        schedule = warmup_cosine_schedule(self.cfg.lr, total_steps=max(total_steps, 10))
        self.optimizer = make_optimizer(schedule, self.cfg.weight_decay)
        return create_train_state(
            params,
            len(self.task_dict),
            self.optimizer,
            jax.random.PRNGKey(self.cfg.seed + 1),
            mt_strategy=self.cfg.mt_strategy,
        )

    def _epochs_per_task(self) -> Tuple[int, ...]:
        if self.cfg.epochs_per_task:
            return self.cfg.epochs_per_task
        n = len(self.dm.main_tasks) if self.cfg.cl_training else 1
        return tuple([max(self.cfg.num_epochs // n, 1)] * n)

    def _steps_for(self, active: Tuple[str, ...], previous: Tuple[str, ...]):
        key = (active, previous)
        if key not in self._step_cache:
            sc = StepConfig(
                task_dict=tuple(self.task_dict.items()),
                active_tasks=active,
                previous_tasks=previous,
                mt_strategy=self.cfg.mt_strategy,
                lambda_dctn=self.cfg.lambda_dctn,
                lambda_featl=self.cfg.lambda_featl,
                lambda_ewc=self.cfg.lambda_ewc,
                use_ewc=self.cfg.use_ewc,
                use_edge_loss=self.cfg.use_edge_loss,
                lambda_edge=self.cfg.lambda_edge,
                use_smote=self.cfg.use_smote,
            )
            self._step_cache[key] = (
                make_train_step(self.model, self.optimizer, sc),
                make_eval_step(self.model, sc),
                make_fisher_step(self.model, sc),
                make_train_step_multi(self.model, self.optimizer, sc)
                if self.cfg.scan_steps > 1
                else None,
            )
        return self._step_cache[key]

    def _log(self, record: Dict) -> None:
        self.history.append(record)
        if self.cfg.log_path:
            os.makedirs(os.path.dirname(self.cfg.log_path) or ".", exist_ok=True)
            with open(self.cfg.log_path, "a") as f:
                f.write(json.dumps(record) + "\n")
        if self.cfg.use_wandb:
            try:  # optional dependency (reference logs via WandbLogger)
                import wandb

                if wandb.run is None:
                    wandb.init(
                        project="analysisgnn-tpu",
                        name=f"{self.cfg.model}_{self.cfg.num_layers}x"
                        f"{self.cfg.hidden_channels}-lr={self.cfg.lr}",
                        config=dataclasses.asdict(self.cfg),
                    )
                wandb.log({k: v for k, v in record.items() if isinstance(v, (int, float))})
            except Exception:
                pass

    def save_checkpoint(self, state, tag: str) -> str:
        import orbax.checkpoint as ocp

        path = os.path.abspath(os.path.join(self.cfg.checkpoint_dir, tag))
        checkpointer = ocp.StandardCheckpointer()
        checkpointer.save(path, state.params, force=True)
        checkpointer.wait_until_finished()
        return path

    def save_full_state(self, state, tag: str = "full") -> str:
        """Checkpoint the ENTIRE training state — params, optimizer moments,
        uncertainty weights, step counter, teacher/fisher/means — for exact
        resume (reference ModelCheckpoint ``save_last`` + hparams,
        train_analysisgnn.py:237, models/analysis.py:917)."""
        import orbax.checkpoint as ocp

        path = os.path.abspath(os.path.join(self.cfg.checkpoint_dir, tag))
        payload = {
            "step": state.step,
            "params": state.params,
            "mt_params": state.mt_params,
            "opt_state": state.opt_state,
            "teacher_params": state.teacher_params,
            "fisher": state.fisher,
            "means": state.means,
            "rng": state.rng,
        }
        checkpointer = ocp.StandardCheckpointer()
        checkpointer.save(path, payload, force=True)
        checkpointer.wait_until_finished()
        return path

    def restore_full_state(self, state, tag: str = "full"):
        import dataclasses as dc

        import orbax.checkpoint as ocp

        path = os.path.abspath(os.path.join(self.cfg.checkpoint_dir, tag))
        template = {
            "step": state.step,
            "params": state.params,
            "mt_params": state.mt_params,
            "opt_state": state.opt_state,
            "teacher_params": state.teacher_params,
            "fisher": state.fisher,
            "means": state.means,
            "rng": state.rng,
        }
        checkpointer = ocp.StandardCheckpointer()
        restored = checkpointer.restore(path, template)
        return dc.replace(state, **restored)

    def restore_checkpoint(self, state, tag: str):
        import dataclasses as dc

        import orbax.checkpoint as ocp

        path = os.path.abspath(os.path.join(self.cfg.checkpoint_dir, tag))
        checkpointer = ocp.StandardCheckpointer()
        params = checkpointer.restore(path, state.params)
        return dc.replace(state, params=params)

    # ------------------------------------------------------------------ #

    def fit(self, max_steps_per_epoch: Optional[int] = None):
        cfg = self.cfg
        requested = [t for t in cfg.main_tasks if t in self.dm.main_tasks]
        if not requested:
            requested = self.dm.main_tasks
        main_tasks = requested if cfg.cl_training else [requested[0]]
        epochs_per_task = self._epochs_per_task()
        example = next(iter(self.dm.combined_train_batches(1)))
        first_task = main_tasks[0]
        state = self._init_state(example[first_task])
        if cfg.resume and os.path.isdir(
            os.path.join(cfg.checkpoint_dir, "full")
        ):
            state = self.restore_full_state(state, "full")

        previous: Tuple[str, ...] = ()
        # stochastic weight averaging: uniform running mean of params over the
        # tail `1 - swa_start_frac` of training (Lightning SWA equivalent,
        # reference train_analysisgnn.py:243-245)
        total_epochs = sum(epochs_per_task)
        swa_begin = int(cfg.swa_start_frac * total_epochs)
        swa_params, swa_n = None, 0
        global_epoch = 0
        total_steps_done = 0
        for ti, main_task in enumerate(main_tasks):
            if cfg.cl_training:
                active = tuple(
                    t
                    for t in expand_main_task(main_task, self.task_dict)
                    if t in self.dm.active_tasks(main_task)
                )
                train_source = lambda steps, mt=main_task: self.dm.train_batches_prefetched(
                    mt, steps, num_workers=cfg.num_workers
                )
            else:
                # combined mode: union of tasks, round-robin batches per task
                active_by_task = {
                    mt: self.dm.active_tasks(mt) for mt in self.dm.main_tasks
                }
                active = tuple(sorted({t for v in active_by_task.values() for t in v}))
                train_source = None
            train_step, eval_step, fisher_step, multi_step = self._steps_for(active, previous)

            for epoch in range(epochs_per_task[ti]):
                t0 = time.time()
                steps = max_steps_per_epoch or self.dm.steps_per_epoch(main_task)
                from analysisgnn_tpu.data.prefetch import prefetch

                # device-side loss handles, fetched ONCE at epoch end so the
                # host never blocks between dispatches (a per-step float()
                # serializes the async dispatch pipeline)
                loss_handles = []
                if cfg.cl_training:
                    # host-side sampling overlaps device compute
                    # (train_source is already prefetched/multi-worker)
                    if cfg.scan_steps > 1:
                        chunk = []
                        for batch in train_source(steps):
                            chunk.append(batch)
                            if len(chunk) == cfg.scan_steps:
                                state, auxes = multi_step(state, stack_batches(chunk))
                                loss_handles.append(auxes["total_loss"])
                                chunk = []
                        for batch in chunk:  # remainder < scan_steps
                            state, aux = train_step(state, batch)
                            loss_handles.append(aux["total_loss"])
                    else:
                        for batch in train_source(steps):
                            state, aux = train_step(state, batch)
                            loss_handles.append(aux["total_loss"])
                else:
                    for batch_dict in prefetch(self.dm.combined_train_batches(steps)):
                        for mt, batch in batch_dict.items():
                            ts, _, _, _ = self._steps_for(
                                tuple(
                                    t for t in active_by_task[mt]
                                ),
                                previous,
                            )
                            state, aux = ts(state, batch)
                            loss_handles.append(aux["total_loss"])
                losses = [
                    float(x)
                    for h in loss_handles
                    for x in np.atleast_1d(np.asarray(h))
                ]
                # validation (note-weighted accumulation: a 10-note batch no
                # longer counts as much as a 10,000-note one)
                from analysisgnn_tpu.train.metrics import (
                    accumulate_weighted,
                    finalize_weighted,
                )

                val_acc: Dict[str, object] = {}
                for mt in (main_tasks if cfg.cl_training else self.dm.main_tasks):
                    _, ev, _, _ = self._steps_for(
                        tuple(
                            t
                            for t in expand_main_task(mt, self.task_dict)
                            if t in self.dm.active_tasks(mt)
                        )
                        if cfg.cl_training
                        else tuple(self.dm.active_tasks(mt)),
                        previous,
                    )
                    for batch in self.dm.val_batches(mt):
                        accumulate_weighted(val_acc, ev(state, batch))
                val_metrics = finalize_weighted(val_acc)
                rec = {
                    "task": main_task,
                    "epoch": epoch,
                    "train_loss": float(np.mean(losses)) if losses else None,
                    "secs": round(time.time() - t0, 2),
                    **{f"val/{k}": v for k, v in val_metrics.items()},
                }
                self._log(rec)
                vl = val_metrics.get("total_loss")
                if vl is not None and vl < self.best_val:
                    self.best_val = vl
                    self.save_checkpoint(state, "best")
                if cfg.use_swa and global_epoch >= swa_begin:
                    if swa_params is None:
                        swa_params = jax.tree_util.tree_map(
                            jax.numpy.copy, state.params
                        )
                    else:
                        swa_params = jax.tree_util.tree_map(
                            lambda s, p: (s * swa_n + p) / (swa_n + 1),
                            swa_params,
                            state.params,
                        )
                    swa_n += 1
                global_epoch += 1
                total_steps_done += steps
                if cfg.test_eval_every and (
                    global_epoch % cfg.test_eval_every == 0
                    or global_epoch == total_epochs
                ):
                    test_metrics = self.evaluate(state, split="test")
                    curve_path = os.path.join(
                        cfg.checkpoint_dir, "test_curve.jsonl"
                    )
                    with open(curve_path, "a") as cf:
                        cf.write(json.dumps({
                            "global_epoch": global_epoch,
                            "steps": total_steps_done,
                            # learned wloss uncertainty p per task: the
                            # per-head effective-lr probe (VERDICT r4 ask
                            # #1a) — same field in the torch anchor's curve
                            "wloss_p": [
                                round(float(v), 5)
                                for v in np.asarray(state.mt_params)
                            ],
                            **{k: float(v) for k, v in test_metrics.items()},
                        }) + "\n")

            # ---- task switch (reference on_validation_epoch_end) ----------
            self.save_checkpoint(state, f"{main_task}_model")
            if cfg.cl_training and ti < len(main_tasks) - 1:
                previous = tuple(
                    dict.fromkeys(
                        previous + expand_main_task(main_task, self.task_dict)
                    )
                )
                state = update_teacher(state)
                if cfg.use_ewc:
                    state = snapshot_ewc_anchor(state)
                    # fisher from one replay batch per seen task (:1326-1368)
                    for mt in main_tasks[: ti + 1]:
                        for batch in self.dm.val_batches(mt):
                            _, _, fs, _ = self._steps_for(active, previous)
                            state = fs(state, batch, np.float32(ti + 1))
                            break
        if cfg.use_swa and swa_params is not None:
            # swap the averaged weights in for final eval/checkpoints, as
            # Lightning's SWA callback does at the end of fit
            state = dataclasses.replace(state, params=swa_params)
            self.save_checkpoint(state, "swa")
        self.save_checkpoint(state, "last")
        return state

    def evaluate(self, state, split: str = "test") -> Dict[str, float]:
        """Full-graph evaluation on the test split with composite RNA
        metrics (reference Trainer.test path, test_step :1184-1282)."""
        from analysisgnn_tpu.train.metrics import (
            accumulate_weighted,
            finalize_weighted,
        )

        acc: Dict[str, Dict[str, object]] = {}
        for mt in self.dm.main_tasks:
            active = tuple(self.dm.active_tasks(mt))
            sc = StepConfig(
                task_dict=tuple(self.task_dict.items()), active_tasks=active
            )
            tstep = make_test_step(self.model, sc)
            batches = (
                self.dm.test_batches(mt) if split == "test" else self.dm.val_batches(mt)
            )
            per_mt = acc.setdefault(mt, {})
            for batch in batches:
                accumulate_weighted(per_mt, tstep(state, batch))
        return {
            f"{mt}/{k}": v
            for mt, d in acc.items()
            for k, v in finalize_weighted(d).items()
        }
