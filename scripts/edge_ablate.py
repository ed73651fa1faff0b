"""Perturbation probe: after N train steps on the real stream, how much do
predictions depend on the graph edges?  A healthy GNN's context-task logits
should change drastically when edges are emptied; a node-local memorizer's
won't.  Run for both the jax framework and the torch anchor."""
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

N = 100
LR = 5e-3
REPORT = ("localkey", "romanNumeral", "root", "staff")

dm = _build_datamodule()
tasks = tuple(TASK_DICT.items())
active = tuple(dm.active_tasks("all"))
batches = [next(iter(dm.train_batches("all", 1))) for _ in range(N)]
probe = next(iter(dm.val_batches("all")))

# ---- jax ----
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
params = model.init(jax.random.PRNGKey(0), *init_args)
opt = make_optimizer(lambda s: LR)
state = create_train_state(params, len(tasks), opt, jax.random.PRNGKey(1))
cfg = StepConfig(task_dict=tasks, active_tasks=active)
step = make_train_step(model, opt, cfg)
for b in batches:
    state, _ = step(state, b)


def jax_logits(g, empty):
    attrs = g.node_attrs[NOTE]
    eid = g.edge_index_dict()
    if empty:
        # point every edge at the padded sentinel row (dropped by scatters)
        eid = {
            et: np.full_like(np.asarray(ei), g.node_features[et[0]].shape[0])
            for et, ei in eid.items()
        }
    args = (
        g.x_dict(), eid, g.batch,
        attrs["pitch_spelling"], attrs["key_signature"], g.num_target_nodes,
    )
    x = model.apply(state.params, *args, deterministic=True, method=model.encode)
    return model.apply(state.params, x, deterministic=True, method=model.classify)


lg_full = jax_logits(probe, False)
lg_empty = jax_logits(probe, True)
base = np.asarray(probe.target_mask())
print("JAX: mean |Δlogit| with edges removed, and flip rate")
for t in REPORT:
    d = np.abs(np.asarray(lg_full[t]) - np.asarray(lg_empty[t]))[base].mean()
    flip = (
        np.asarray(lg_full[t]).argmax(-1) != np.asarray(lg_empty[t]).argmax(-1)
    )[base].mean()
    print(f"  {t}: dlogit={d:.4f} flip={flip:.3f}", flush=True)

# ---- torch ----
tm = RefModel(dm.feature_dim, 256, 128, _RELATIONS, tasks)
wp = torch.nn.Parameter(torch.ones(len(tasks)))
topt = torch.optim.AdamW(list(tm.parameters()) + [wp], lr=LR, weight_decay=5e-3)
ce_fn = torch.nn.CrossEntropyLoss(label_smoothing=0.1, reduction="none")
for b in batches:
    x, ps, ks, edges, labels, bmask, _ = _unpack(b, tasks)
    topt.zero_grad()
    lg = tm(x, ps, ks, edges)
    tot = 0.0
    for ti, (t, _c) in enumerate(tasks):
        if t not in labels:
            continue
        mask = bmask.copy()
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

x, ps, ks, edges, labels, bmask, nvalid = _unpack(probe, tasks)
with torch.no_grad():
    lg_full_t = tm(x, ps, ks, edges)
    empty_edges = {r: torch.zeros((2, 0), dtype=torch.long) for r in edges}
    # RefModel requires onset for pooling; keep a single self-loop
    empty_edges = {
        r: torch.tensor([[0], [0]], dtype=torch.long) for r in edges
    }
    lg_empty_t = tm(x, ps, ks, empty_edges)
print("TORCH: mean |Δlogit| with edges removed, and flip rate")
for t in REPORT:
    d = (lg_full_t[t] - lg_empty_t[t]).abs()[torch.from_numpy(bmask)].mean()
    flip = (
        (lg_full_t[t].argmax(-1) != lg_empty_t[t].argmax(-1))[torch.from_numpy(bmask)]
        .float().mean()
    )
    print(f"  {t}: dlogit={float(d):.4f} flip={float(flip):.3f}", flush=True)
print("DONE")
