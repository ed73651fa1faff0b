"""Train 100 steps per variant on the identical fresh-batch stream; report
probe CE + edge-dependence (flip rate) to isolate what kills graph learning."""
import sys

import jax
import numpy as np

sys.path.insert(0, "scripts")
sys.path.insert(0, ".")

from parity_experiment import _build_datamodule
from analysisgnn_tpu.core.graph import NOTE, metadata
from analysisgnn_tpu.theory.vocab import TASK_DICT
from analysisgnn_tpu.models.analysis import AnalysisGNN
from analysisgnn_tpu.train.state import create_train_state, make_optimizer
from analysisgnn_tpu.train.step import StepConfig, TASK_MASK_ATTRS, make_train_step

N = 100
dm = _build_datamodule()
tasks = tuple(TASK_DICT.items())
active = tuple(dm.active_tasks("all"))
batches = [next(iter(dm.train_batches("all", 1))) for _ in range(N)]
probe = next(iter(dm.val_batches("all")))
nodes, ets = metadata(False, False)
REPORT = ("localkey", "romanNumeral", "root")


def run(name, lr=5e-3, flatten=True, use_jk=True, no_l2=False, wd=5e-3,
        clip=1.0, final_norm=False, dense_proj=False, dropout=0.0):
    if final_norm:
        import functools

        from analysisgnn_tpu.models import encoders

        orig_enc = encoders.ENCODERS["hybridgnn"]
        encoders.ENCODERS["hybridgnn"] = functools.partial(
            orig_enc, final_norm=True
        )
    if dense_proj:
        # torch-anchor-identical projections: single Dense instead of the
        # reference MLP/deep-projection stacks (bench_torch_reference.RefModel)
        import flax.linen as nn

        import analysisgnn_tpu.models.analysis as A

        class DenseProj(nn.Module):
            hidden: int
            out: int
            dropout: float = 0.0

            @nn.compact
            def __call__(self, x, deterministic=True):
                return nn.Dense(self.hidden if self.out is None else self.out)(x)

        orig_proj = (A.ProjectionMLP, A.EncoderProjection)
        A.ProjectionMLP = DenseProj
        A.EncoderProjection = DenseProj
    if no_l2:
        from analysisgnn_tpu.models import encoders

        orig = encoders.l2_normalize
        encoders.l2_normalize = lambda x, eps=1e-12: x
    try:
        model = AnalysisGNN(
            metadata=(nodes, ets), in_channels=dm.feature_dim,
            hidden_channels=256, out_channels=128, task_dict=tasks,
            num_layers=3, dropout=dropout, use_jk=use_jk,
        )
        b0 = batches[0]
        a0 = b0.node_attrs[NOTE]
        init_args = (
            b0.x_dict(), b0.edge_index_dict(), b0.batch,
            a0["pitch_spelling"], a0["key_signature"], b0.num_target_nodes,
        )
        params = model.init(jax.random.PRNGKey(0), *init_args)
        opt = make_optimizer(
            lambda s: lr, weight_decay=wd, flatten=flatten, clip_norm=clip
        )
        state = create_train_state(params, len(tasks), opt, jax.random.PRNGKey(1))
        cfg = StepConfig(task_dict=tasks, active_tasks=active)
        step = make_train_step(model, opt, cfg)
        for b in batches:
            state, _ = step(state, b)

        attrs = probe.node_attrs[NOTE]

        def logits_of(eid):
            a = (probe.x_dict(), eid, probe.batch, attrs["pitch_spelling"],
                 attrs["key_signature"], probe.num_target_nodes)
            x = model.apply(state.params, *a, deterministic=True, method=model.encode)
            return model.apply(state.params, x, deterministic=True, method=model.classify)

        eid = probe.edge_index_dict()
        eid_empty = {
            et: np.full_like(np.asarray(ei), probe.node_features[et[0]].shape[0])
            for et, ei in eid.items()
        }
        lf, le = logits_of(eid), logits_of(eid_empty)
        base = np.asarray(probe.target_mask())
        if "valid_label" in attrs:
            basew = base & np.asarray(attrs["valid_label"]).astype(bool)
        else:
            basew = base
        out = {}
        ces = []
        for t, c in tasks:
            if t not in attrs:
                continue
            w = basew.copy()
            mattr = TASK_MASK_ATTRS.get(t)
            if mattr and mattr in attrs:
                w &= np.asarray(attrs[mattr]).astype(bool)
            labels = np.minimum(np.asarray(attrs[t]), c - 1)
            lg = np.asarray(lf[t], np.float32)
            lse = np.log(np.exp(lg - lg.max(-1, keepdims=True)).sum(-1)) + lg.max(-1)
            nll = lse - lg[np.arange(len(labels)), labels]
            ce = float((nll * w).sum() / max(w.sum(), 1))
            ces.append(ce)
            if t in REPORT:
                flip = (np.asarray(lf[t]).argmax(-1) != np.asarray(le[t]).argmax(-1))[base].mean()
                out[t] = (round(ce, 3), round(float(flip), 3))
        print(name, "meanCE", round(float(np.mean(ces)), 3),
              {t: f"ce={v[0]} flip={v[1]}" for t, v in out.items()}, flush=True)
    finally:
        if no_l2:
            encoders.l2_normalize = orig
        if final_norm:
            encoders.ENCODERS["hybridgnn"] = orig_enc
        if dense_proj:
            A.ProjectionMLP, A.EncoderProjection = orig_proj


ARMS = {
    "base": lambda: run("base        "),
    "flat": lambda: run("flat=False  ", flatten=False),
    "jk": lambda: run("jk=False    ", use_jk=False),
    "nol2": lambda: run("no-l2norm   ", no_l2=True),
    "lr1e-3": lambda: run("lr=1e-3     ", lr=1e-3),
    "lr2e-3": lambda: run("lr=2e-3     ", lr=2e-3),
    "wd0": lambda: run("wd=0        ", wd=0.0),
    # clip_norm=1/21 ≡ undoing the /21 total division before the clip —
    # reproduces the torch anchor's ACTIVE clipping at the reference lr.
    "clip21": lambda: run("clip/21     ", clip=1.0 / 21.0),
    # relu+l2norm after the FINAL conv (the torch anchor has it; the
    # reference HGCN does not) — bounded encoder output at lr 5e-3.
    "fnorm": lambda: run("final-norm  ", final_norm=True),
    "fnorm-jk": lambda: run("fnorm jk=F  ", final_norm=True, use_jk=False),
    # torch-anchor-identical architecture (Dense projections + no JK +
    # final norm) at the reference lr — the decisive framework-vs-
    # architecture cross-check: this arm reaches the arch-matched torch
    # trajectory band (meanCE 1.222 vs torch 1.229 at 150 steps), so the
    # lr=5e-3 collapse is architectural, not a framework defect.
    "combo": lambda: run("combo d+nojk+fn", use_jk=False, final_norm=True,
                         dense_proj=True),
    # --- reference-recipe arms (lr=5e-3, dropout=0.3 — the verbatim
    # defaults, train_analysisgnn.py:57-59): which minimal architecture
    # stabilizer makes the DEFAULT train cleanly out of the box? ---
    "ref-base": lambda: run("REF base      ", dropout=0.3),
    "ref-fnorm": lambda: run("REF fnorm     ", dropout=0.3, final_norm=True),
    "ref-fnorm-nojk": lambda: run("REF fn nojk  ", dropout=0.3,
                                  final_norm=True, use_jk=False),
    "ref-fnorm-dense": lambda: run("REF fn dense ", dropout=0.3,
                                   final_norm=True, dense_proj=True),
    "ref-combo": lambda: run("REF combo     ", dropout=0.3, use_jk=False,
                             final_norm=True, dense_proj=True),
}

if __name__ == "__main__":
    names = sys.argv[1:] or ["base", "flat", "jk", "nol2", "lr1e-3", "wd0"]
    for a in names:
        ARMS[a]()
    print("DONE", flush=True)
