"""A/B: Pallas fused mean-with-base aggregation vs XLA scatter path.

Same workload as bench.py (HybridGNN 3x256, 21 tasks, subgraph 500 x 8,
full train step) with src-sorted edges for both arms; the only difference
is FusedHeteroSage.use_pallas.  Run on an idle machine, default (axon) env.

Usage: python scripts/bench_pallas_ab.py [steps]
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import jax

jax.config.update("jax_compilation_cache_dir", os.path.join(ROOT, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

from analysisgnn_tpu.core.graph import NOTE, metadata
from analysisgnn_tpu.data.features import select_features
from analysisgnn_tpu.data.graph_build import build_score_graph
from analysisgnn_tpu.data.note_array import synthetic_score
from analysisgnn_tpu.data.sampler import SamplerConfig, ScoreSample, SubgraphSampler
from analysisgnn_tpu.models.analysis import AnalysisGNN
from analysisgnn_tpu.theory.encoders import KeySignatureEncoder, PitchEncoder
from analysisgnn_tpu.theory.vocab import TASK_DICT
from analysisgnn_tpu.train.schedules import warmup_cosine_schedule
from analysisgnn_tpu.train.state import create_train_state, make_optimizer
from analysisgnn_tpu.train.step import StepConfig, make_train_step

S = int(sys.argv[1]) if len(sys.argv) > 1 else 24
tasks = tuple(TASK_DICT.items())

samples = []
for s in range(4):
    na = synthetic_score(num_notes=2000, seed=s)
    feats = select_features(na, "voice")
    g = build_score_graph(na, add_beats=True, add_measures=True)
    features = {
        NOTE: feats,
        "beat": np.zeros((max(g.num_beats, 1), feats.shape[1]), np.float32),
        "measure": np.zeros((max(g.num_measures, 1), feats.shape[1]), np.float32),
    }
    rng = np.random.default_rng(s)
    attrs = {
        "pitch_spelling": PitchEncoder().encode(na),
        "key_signature": KeySignatureEncoder().encode(na),
        "onset_div": na["onset_div"].astype(np.int64),
        "valid_label": np.ones(len(na), np.int64),
    }
    for task, n_cls in tasks:
        attrs[task] = rng.integers(0, n_cls, size=len(na)).astype(np.int64)
    samples.append(ScoreSample(features=features, edges=g.edges, note_attrs=attrs))

cfg = SamplerConfig(
    subgraph_size=500, batch_size=8, num_neighbors=(5, 5), seed=0,
    sort_edges_by_src=True,
)
sampler = SubgraphSampler(samples, cfg)
batches = [jax.device_put(sampler.sample_batch()) for _ in range(4)]
jax.block_until_ready(batches)
edges_per_batch = int(sum(np.asarray(v) for v in batches[0].num_edges.values()))

nodes, edges_meta = metadata(True, True)
results = {}
for arm in ("xla", "pallas"):
    model = AnalysisGNN(
        metadata=(nodes, edges_meta),
        in_channels=25,
        hidden_channels=256,
        out_channels=128,
        task_dict=tasks,
        num_layers=3,
        dropout=0.3,
        encoder_type="hybridgnn",
        use_pallas=arm == "pallas",
    )
    attrs = batches[0].node_attrs[NOTE]
    args = (
        batches[0].x_dict(), batches[0].edge_index_dict(), batches[0].batch,
        attrs["pitch_spelling"], attrs["key_signature"],
        batches[0].num_target_nodes,
    )
    params = model.init(jax.random.PRNGKey(0), *args)
    opt = make_optimizer(warmup_cosine_schedule(5e-3, total_steps=1000))
    state = create_train_state(params, len(tasks), opt, jax.random.PRNGKey(1))
    step_cfg = StepConfig(
        task_dict=tasks, active_tasks=tuple(t for t, _ in tasks),
        mt_strategy="wloss",
    )
    train_step = make_train_step(model, opt, step_cfg)
    state, aux = train_step(state, batches[0])
    loss0 = float(aux["total_loss"])
    t0 = time.perf_counter()
    for i in range(S):
        state, aux = train_step(state, batches[i % len(batches)])
    _ = float(aux["total_loss"])
    dt = time.perf_counter() - t0
    results[arm] = {
        "ms_per_step": round(dt / S * 1e3, 2),
        "edges_per_s": round(edges_per_batch * S / dt, 1),
        "warmup_loss": round(loss0, 4),
    }
    print(arm, results[arm], flush=True)

results["speedup_pallas_vs_xla"] = round(
    results["xla"]["ms_per_step"] / results["pallas"]["ms_per_step"], 4
)
print(json.dumps(results))
