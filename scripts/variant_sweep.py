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


def run(name, lr=5e-3, flatten=True, use_jk=True, no_l2=False, wd=5e-3):
    if no_l2:
        from analysisgnn_tpu.models import encoders

        orig = encoders.l2_normalize
        encoders.l2_normalize = lambda x, eps=1e-12: x
    try:
        model = AnalysisGNN(
            metadata=(nodes, ets), in_channels=dm.feature_dim,
            hidden_channels=256, out_channels=128, task_dict=tasks,
            num_layers=3, dropout=0.0, use_jk=use_jk,
        )
        b0 = batches[0]
        a0 = b0.node_attrs[NOTE]
        init_args = (
            b0.x_dict(), b0.edge_index_dict(), b0.batch,
            a0["pitch_spelling"], a0["key_signature"], b0.num_target_nodes,
        )
        params = model.init(jax.random.PRNGKey(0), *init_args)
        opt = make_optimizer(lambda s: lr, weight_decay=wd, flatten=flatten)
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


run("base        ")
run("flat=False  ", flatten=False)
run("jk=False    ", use_jk=False)
run("no-l2norm   ", no_l2=True)
run("lr=1e-3     ", lr=1e-3)
run("wd=0        ", wd=0.0)
print("DONE", flush=True)
