"""A/B: per-step dispatch vs K-fused lax.scan train steps on the real chip.

Same workload as bench.py (HybridGNN 3x256, 21 tasks, subgraph 500 x 8,
XLA scatter path by default — the shipped bench configuration; pass
``--pallas`` to A/B the flag-gated Pallas conv path instead).  Measures
edges/s for (a) 24 single-step dispatches and (b) 24/K dispatches of
make_train_step_multi with K steps each — the production ``--scan_steps``
path (train/step.py::make_train_step_multi).

    python scripts/bench_scan_ab.py [K] [--pallas]
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import jax

    cache_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"
    )
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    from analysisgnn_tpu.core.graph import NOTE, metadata
    from analysisgnn_tpu.data.features import select_features
    from analysisgnn_tpu.data.graph_build import build_score_graph
    from analysisgnn_tpu.data.note_array import synthetic_score
    from analysisgnn_tpu.data.sampler import (
        SamplerConfig,
        ScoreSample,
        SubgraphSampler,
    )
    from analysisgnn_tpu.models.analysis import AnalysisGNN
    from analysisgnn_tpu.theory.encoders import KeySignatureEncoder, PitchEncoder
    from analysisgnn_tpu.theory.vocab import TASK_DICT
    from analysisgnn_tpu.train.schedules import warmup_cosine_schedule
    from analysisgnn_tpu.train.state import create_train_state, make_optimizer
    from analysisgnn_tpu.train.step import (
        StepConfig,
        make_train_step,
        make_train_step_multi,
        stack_batches,
    )

    use_pallas = "--pallas" in sys.argv[1:]
    pos = [a for a in sys.argv[1:] if not a.startswith("--")]
    k = int(pos[0]) if pos else 6
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
    batch = sampler.sample_batch()

    nodes, edges_meta = metadata(True, True)
    model = AnalysisGNN(
        metadata=(nodes, edges_meta), in_channels=25, hidden_channels=256,
        out_channels=128, task_dict=tasks, num_layers=3, dropout=0.3,
        logit_fusion=False, encoder_type="hybridgnn", use_pallas=use_pallas,
    )
    attrs = batch.node_attrs[NOTE]
    args = (
        batch.x_dict(), batch.edge_index_dict(), batch.batch,
        attrs["pitch_spelling"], attrs["key_signature"], batch.num_target_nodes,
    )
    params = model.init(jax.random.PRNGKey(0), *args)
    opt = make_optimizer(warmup_cosine_schedule(5e-3, total_steps=1000))
    step_cfg = StepConfig(
        task_dict=tasks, active_tasks=tuple(t for t, _ in tasks),
        mt_strategy="wloss",
    )
    edges_per_batch = int(sum(np.asarray(v) for v in batch.num_edges.values()))
    S = 24
    batches = [jax.device_put(sampler.sample_batch()) for _ in range(4)]
    jax.block_until_ready(batches)

    # arm A: per-step dispatch
    step = make_train_step(model, opt, step_cfg)
    state = create_train_state(params, len(tasks), opt, jax.random.PRNGKey(1))
    state, aux = step(state, batches[0])
    _ = float(aux["total_loss"])
    t0 = time.perf_counter()
    for i in range(S):
        state, aux = step(state, batches[i % len(batches)])
    _ = float(aux["total_loss"])
    dt_a = time.perf_counter() - t0
    del state

    # arm B: K-fused scan dispatch (same total step count)
    multi = make_train_step_multi(model, opt, step_cfg)
    stacked = jax.device_put(
        stack_batches([sampler.sample_batch() for _ in range(k)])
    )
    jax.block_until_ready(stacked)
    state = create_train_state(params, len(tasks), opt, jax.random.PRNGKey(1))
    state, auxes = multi(state, stacked)
    _ = float(auxes["total_loss"][-1])
    t0 = time.perf_counter()
    for _ in range(S // k):
        state, auxes = multi(state, stacked)
    _ = float(auxes["total_loss"][-1])
    dt_b = time.perf_counter() - t0

    print(json.dumps({
        "k": k,
        "use_pallas": use_pallas,
        "per_step_ms": round(dt_a / S * 1e3, 2),
        "scan_ms_per_step": round(dt_b / ((S // k) * k) * 1e3, 2),
        "per_step_edges_per_s": round(edges_per_batch * S / dt_a),
        "scan_edges_per_s": round(edges_per_batch * (S // k) * k / dt_b),
    }))


if __name__ == "__main__":
    main()
