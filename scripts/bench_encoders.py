"""Per-encoder step-time benchmark on the real chip.

Same workload as bench.py (21 tasks, 3x256, subgraph 500 x 8 graphs, wloss,
beats+measures in the graph) for each encoder family; reports ms/step and
K valid-edges/s.  Run with NOTHING else on the machine (timings on the axon
tunnel are polluted by any concurrent python process).

    python scripts/bench_encoders.py [HybridGNN HGT MetricalGNN]
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_workload():
    import jax

    from analysisgnn_tpu.core.graph import NOTE, metadata
    from analysisgnn_tpu.data.features import select_features
    from analysisgnn_tpu.data.graph_build import build_score_graph
    from analysisgnn_tpu.data.note_array import synthetic_score
    from analysisgnn_tpu.data.sampler import (
        SamplerConfig,
        ScoreSample,
        SubgraphSampler,
    )
    from analysisgnn_tpu.theory.encoders import KeySignatureEncoder, PitchEncoder
    from analysisgnn_tpu.theory.vocab import TASK_DICT

    tasks = tuple(TASK_DICT.items())
    samples = []
    for s in range(8):  # one score per batch slot (loader contract)
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
    cfg = SamplerConfig(subgraph_size=500, batch_size=8, num_neighbors=(5, 5), seed=0,
                        sort_edges_by_src=True)  # Pallas arms need sorted edges
    sampler = SubgraphSampler(samples, cfg)
    batches = [jax.device_put(sampler.sample_batch()) for _ in range(4)]
    jax.block_until_ready(batches)
    return tasks, batches


def bench_encoder(encoder_type: str, tasks, batches, steps: int = 24) -> dict:
    import jax

    from analysisgnn_tpu.core.graph import NOTE, metadata
    from analysisgnn_tpu.models.analysis import AnalysisGNN
    from analysisgnn_tpu.train.schedules import warmup_cosine_schedule
    from analysisgnn_tpu.train.state import create_train_state, make_optimizer
    from analysisgnn_tpu.train.step import StepConfig, make_train_step

    nodes, edges_meta = metadata(True, True)
    # "HGT-emax" = union-space capacity-binned relation stacks;
    # "HGT-emax-pallas" additionally fuses the softmax/aggregation kernel
    enc, _, variant = encoder_type.lower().partition("-")
    use_pallas = variant.endswith("pallas")
    # round-4 fused-SAGE HBM-restructure arms (models/fused.py):
    # "HybridGNN-edge" / "HybridGNN-edgezxp" select conv_impl instead of an
    # HGT group mode
    conv_impl = "node"
    if variant in ("edge", "edgezxp"):
        conv_impl = {"edge": "edge", "edgezxp": "edge-zxp"}[variant]
        variant = ""
    # "HGT-bf16st" / "HGT-emax-bf16st": bf16 q/k/v staging (HGTLayer)
    stage_dtype = "float32"
    if variant.endswith("bf16st"):
        stage_dtype = "bfloat16"
        variant = variant[: -len("bf16st")].strip("-")
    # "HGT-gmax" / "HGT-gmax-bf16st": global-max softmax stabilizer
    # (HGTLayer.softmax_stab="global" — two fewer E-row kernels per layer)
    softmax_stab = "segment"
    if variant == "gmax" or variant.startswith("gmax-") or variant.endswith("-gmax"):
        softmax_stab = "global"
        variant = variant.replace("gmax", "").strip("-")
    group_mode = variant.split("-")[0] or "pair"
    model = AnalysisGNN(
        metadata=(nodes, edges_meta),
        in_channels=25,
        hidden_channels=256,
        out_channels=128,
        task_dict=tasks,
        num_layers=3,
        dropout=0.3,
        encoder_type=enc,
        hgt_group_mode=group_mode,
        use_pallas=use_pallas,
        conv_impl=conv_impl,
        hgt_stage_dtype=stage_dtype,
        hgt_softmax_stab=softmax_stab,
    )
    batch = batches[0]
    attrs = batch.node_attrs[NOTE]
    args = (
        batch.x_dict(), batch.edge_index_dict(), batch.batch,
        attrs["pitch_spelling"], attrs["key_signature"], batch.num_target_nodes,
    )
    params = model.init(jax.random.PRNGKey(0), *args)
    opt = make_optimizer(warmup_cosine_schedule(5e-3, total_steps=1000))
    state = create_train_state(params, len(tasks), opt, jax.random.PRNGKey(1))
    step_cfg = StepConfig(
        task_dict=tasks, active_tasks=tuple(t for t, _ in tasks), mt_strategy="wloss"
    )
    train_step = make_train_step(model, opt, step_cfg)
    edges_per_batch = int(sum(np.asarray(v) for v in batch.num_edges.values()))
    state, aux = train_step(state, batches[0])
    _ = float(aux["total_loss"])
    t0 = time.perf_counter()
    for i in range(steps):
        state, aux = train_step(state, batches[i % len(batches)])
    _ = float(aux["total_loss"])
    dt = time.perf_counter() - t0
    return {
        "encoder": encoder_type,
        "ms_per_step": round(1000 * dt / steps, 1),
        "k_edges_per_s": round(edges_per_batch * steps / dt / 1000, 1),
    }


def main() -> None:
    import os

    import jax

    cache_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"
    )
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    encoders = sys.argv[1:] or ["HybridGNN", "HGT", "MetricalGNN"]
    tasks, batches = build_workload()
    for enc in encoders:
        t0 = time.perf_counter()
        print(json.dumps(bench_encoder(enc, tasks, batches)), flush=True)
        print(f"  [{enc} total {time.perf_counter() - t0:.0f}s]", file=sys.stderr, flush=True)


if __name__ == "__main__":
    main()
