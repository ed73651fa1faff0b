"""Fresh-batch A/B: torch anchor vs jax framework arms on the identical
pre-sampled batch stream, constant metric = probe-batch mean CE.

Discriminates single-batch-ok-but-stream-slow training pathologies:
  A  torch RefModel + wloss           (the anchor that reaches F1 0.76)
  B  jax as-configured (wloss+featl)
  C  jax plain-sum, no featl
Reports probe CE (overall + localkey + romanNumeral) every 25 steps.
"""
import json
import sys

import jax
import numpy as np

sys.path.insert(0, "scripts")
sys.path.insert(0, ".")
import torch

from parity_experiment import _RELATIONS, _build_datamodule, _unpack
from bench_torch_reference import RefModel
from analysisgnn_tpu.core.graph import NOTE, metadata
from analysisgnn_tpu.theory.vocab import TASK_DICT
from analysisgnn_tpu.models.analysis import AnalysisGNN
from analysisgnn_tpu.train.state import create_train_state, make_optimizer
from analysisgnn_tpu.train.step import StepConfig, TASK_MASK_ATTRS, make_train_step

N = 150
LR = 5e-3

dm = _build_datamodule()
tasks = tuple(TASK_DICT.items())
active = tuple(dm.active_tasks("all"))
print("sampling", N, "train batches + probe...", flush=True)
batches = [next(iter(dm.train_batches("all", 1))) for _ in range(N)]
probe = next(iter(dm.val_batches("all")))

REPORT = ("localkey", "romanNumeral", "root", "quality")


def torch_probe_ce(model):
    x, ps, ks, edges, labels, base, nvalid = _unpack(probe, tasks)
    with torch.no_grad():
        lg = model(x, ps, ks, edges)
    out = {}
    ces = []
    for t, c in tasks:
        if t not in labels:
            continue
        mask = base.copy()
        mattr = TASK_MASK_ATTRS.get(t)
        if mattr and mattr in probe.node_attrs[NOTE]:
            mask &= np.asarray(probe.node_attrs[NOTE][mattr])[: len(mask)].astype(bool)
        lw = torch.from_numpy(mask.astype(np.float32))
        ls = torch.nn.functional.cross_entropy(lg[t], labels[t], reduction="none")
        ce = float((ls * lw).sum() / lw.sum().clamp(min=1))
        ces.append(ce)
        if t in REPORT:
            out[t] = round(ce, 3)
    out["mean"] = round(float(np.mean(ces)), 3)
    return out


# ---- A: torch ----
tm = RefModel(dm.feature_dim, 256, 128, _RELATIONS, tasks)
wp = torch.nn.Parameter(torch.ones(len(tasks)))
topt = torch.optim.AdamW(list(tm.parameters()) + [wp], lr=LR, weight_decay=5e-3)
ce_fn = torch.nn.CrossEntropyLoss(label_smoothing=0.1, reduction="none")
print("A torch  step0", torch_probe_ce(tm), flush=True)
for i, b in enumerate(batches):
    x, ps, ks, edges, labels, base, _ = _unpack(b, tasks)
    topt.zero_grad()
    lg = tm(x, ps, ks, edges)
    tot = 0.0
    for ti, (t, _c) in enumerate(tasks):
        if t not in labels:
            continue
        mask = base.copy()
        mattr = TASK_MASK_ATTRS.get(t)
        if mattr and mattr in b.node_attrs[NOTE]:
            mask &= np.asarray(b.node_attrs[NOTE][mattr])[: len(mask)].astype(bool)
        lw = torch.from_numpy(mask.astype(np.float32))
        l = (ce_fn(lg[t], labels[t]) * lw).sum() / lw.sum().clamp(min=1)
        p = wp[ti]
        tot = tot + 0.5 / p.pow(2) * l + torch.log1p(p.pow(2))
    tot.backward()
    torch.nn.utils.clip_grad_norm_(tm.parameters(), 1.0)
    topt.step()
    if (i + 1) % 25 == 0:
        print(f"A torch  step{i+1}", torch_probe_ce(tm), flush=True)
print("A wloss p:", {t: round(float(wp[ti]), 2) for ti, (t, _) in enumerate(tasks) if t in REPORT}, flush=True)

# ---- jax arms ----
nodes, ets = metadata(False, False)
model = AnalysisGNN(
    metadata=(nodes, ets), in_channels=dm.feature_dim, hidden_channels=256,
    out_channels=128, task_dict=tasks, num_layers=3, dropout=0.0,
)
b0 = batches[0]
attrs0 = b0.node_attrs[NOTE]
init_args = (
    b0.x_dict(), b0.edge_index_dict(), b0.batch,
    attrs0["pitch_spelling"], attrs0["key_signature"], b0.num_target_nodes,
)
params0 = model.init(jax.random.PRNGKey(0), *init_args)

import jax.numpy as jnp

from analysisgnn_tpu.train.metrics import masked_accuracy  # noqa


def jax_probe_ce(state):
    attrs = probe.node_attrs[NOTE]
    args = (
        probe.x_dict(), probe.edge_index_dict(), probe.batch,
        attrs["pitch_spelling"], attrs["key_signature"], probe.num_target_nodes,
    )
    x = model.apply(state.params, *args, deterministic=True, method=model.encode)
    logits = model.apply(state.params, x, deterministic=True, method=model.classify)
    base = np.asarray(probe.target_mask())
    if "valid_label" in attrs:
        base = base & np.asarray(attrs["valid_label"]).astype(bool)
    out = {}
    ces = []
    for t, c in tasks:
        if t not in attrs:
            continue
        w = base.copy()
        mattr = TASK_MASK_ATTRS.get(t)
        if mattr and mattr in attrs:
            w &= np.asarray(attrs[mattr]).astype(bool)
        labels = np.minimum(np.asarray(attrs[t]), c - 1)
        lg = np.asarray(logits[t], np.float32)
        lse = np.log(np.exp(lg - lg.max(-1, keepdims=True)).sum(-1)) + lg.max(-1)
        nll = lse - lg[np.arange(len(labels)), labels]
        ce = float((nll * w).sum() / max(w.sum(), 1))
        ces.append(ce)
        if t in REPORT:
            out[t] = round(ce, 3)
    out["mean"] = round(float(np.mean(ces)), 3)
    return out


for name, kw in [
    ("B wloss+featl", dict(mt_strategy="wloss")),
    ("C plain-sum  ", dict(mt_strategy="none", lambda_featl=0.0)),
]:
    opt = make_optimizer(lambda s: LR)
    state = create_train_state(params0, len(tasks), opt, jax.random.PRNGKey(1))
    cfg = StepConfig(task_dict=tasks, active_tasks=active, **kw)
    step = make_train_step(model, opt, cfg)
    print(name, "step0", jax_probe_ce(state), flush=True)
    for i, b in enumerate(batches):
        state, aux = step(state, b)
        if (i + 1) % 25 == 0:
            print(f"{name} step{i+1}", jax_probe_ce(state), flush=True)
    mt = np.asarray(state.mt_params)
    print(name, "wloss p:", {t: round(float(mt[ti]), 2) for ti, (t, _) in enumerate(tasks) if t in REPORT}, flush=True)
print("DONE", flush=True)
