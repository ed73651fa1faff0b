"""Roofline bench: achieved FLOP/s and fraction of chip peak, small vs
compute-bound shapes (VERDICT r2 ask #2).

The headline bench (bench.py) runs the reference-default shape
(subgraph 500 x 8 graphs), where the step is dispatch-overhead-bound on
the tunnel runtime and "edges/s vs a torch-CPU anchor" says nothing about
the fraction of the chip used.  This script times the SAME production
train step (fwd + bwd + AdamW, 21 tasks, HybridGNN 3x256) at a ladder of
shapes up to compute-saturating ones, and reports for each arm:

- ms/step and valid-message-edges/s (comparable to bench.py),
- achieved TFLOP/s from XLA's own cost model
  (``compiled.cost_analysis()["flops"]``; the analytic
  ``utils/profiling.py::conv_roofline`` model is the fallback),
- achieved HBM GB/s from ``bytes accessed``,
- % of the chip's published peaks (utils/profiling.py::TPU_PEAKS),
- the roofline verdict: which of compute / bandwidth / dispatch bounds
  the measured time.

Arms also re-A/B the levers that lose at the small shape precisely
because it is dispatch-bound (bf16 compute, --use_pallas): a compute-
bound shape is where they could flip (VERDICT r2 "What's weak" #2).

    python scripts/bench_roofline.py                  # default arm set
    python scripts/bench_roofline.py small-f32 large-bf16   # named arms

Writes bench_queue/roofline.json (one record per arm) and prints one
JSON line per arm.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

CHIP = os.environ.get("ROOFLINE_CHIP", "v5e")


# name -> (subgraph_size, batch_size, notes_per_score, K, compute_dtype,
#          use_pallas, remat)
ARMS = {
    # smoke arm (CI / forced-CPU syntax check; numbers not meaningful)
    "tiny-f32": dict(sub=50, bs=2, notes=200, k=2, dtype="float32",
                     pallas=False, remat=False),
    # bench.py's exact shape, for continuity with the headline number
    "small-f32": dict(sub=500, bs=8, notes=2000, k=6, dtype="float32",
                      pallas=False, remat=False),
    "small-bf16": dict(sub=500, bs=8, notes=2000, k=6, dtype="bfloat16",
                       pallas=False, remat=False),
    # compute-bound ladder: 16x the nodes/edges of the headline shape
    "large-f32": dict(sub=2000, bs=32, notes=8000, k=2, dtype="float32",
                      pallas=False, remat=False),
    "large-bf16": dict(sub=2000, bs=32, notes=8000, k=2, dtype="bfloat16",
                       pallas=False, remat=False),
    "large-f32-pallas": dict(sub=2000, bs=32, notes=8000, k=2,
                             dtype="float32", pallas=True, remat=False),
    # remat lever at the compute-bound shape
    "large-f32-remat": dict(sub=2000, bs=32, notes=8000, k=2,
                            dtype="float32", pallas=False, remat=True),
    # 32x: full-graph-scale step (~64K nodes/batch).  NOTE: the 4000x32
    # remat variant reproducibly crashes the tunnel's remote-compile helper
    # (HTTP 500, bench_queue/roofline.json r3); this shape compiles.
    "xl-f32": dict(sub=4000, bs=16, notes=16000, k=1, dtype="float32",
                   pallas=False, remat=False),
    "xl-bf16": dict(sub=4000, bs=16, notes=16000, k=1, dtype="bfloat16",
                    pallas=False, remat=False),
    "xl-f32-remat": dict(sub=4000, bs=16, notes=16000, k=1, dtype="float32",
                         pallas=False, remat=True),
    "xl-bf16-remat": dict(sub=4000, bs=16, notes=16000, k=1, dtype="bfloat16",
                          pallas=False, remat=True),
    # round-4 HBM-restructure A/B: conv_impl=edge (models/fused.py layout 2)
    "small-f32-edge": dict(sub=500, bs=8, notes=2000, k=6, dtype="float32",
                           pallas=False, remat=False, conv_impl="edge"),
    "large-f32-edge": dict(sub=2000, bs=32, notes=8000, k=2, dtype="float32",
                           pallas=False, remat=False, conv_impl="edge"),
    "large-bf16-edge": dict(sub=2000, bs=32, notes=8000, k=2,
                            dtype="bfloat16", pallas=False, remat=False,
                            conv_impl="edge"),
    "xl-bf16-edge": dict(sub=4000, bs=16, notes=16000, k=1, dtype="bfloat16",
                         pallas=False, remat=False, conv_impl="edge"),
    "large-f32-edgezxp": dict(sub=2000, bs=32, notes=8000, k=2,
                              dtype="float32", pallas=False, remat=False,
                              conv_impl="edge-zxp"),
    "large-bf16-edgezxp": dict(sub=2000, bs=32, notes=8000, k=2,
                               dtype="bfloat16", pallas=False, remat=False,
                               conv_impl="edge-zxp"),
}

DEFAULT_ARMS = [
    "small-f32", "small-bf16", "large-f32", "large-bf16",
    "large-f32-pallas", "large-f32-remat", "xl-f32", "xl-bf16",
]


def _build_samples(notes: int, n_scores: int = 4):
    from analysisgnn_tpu.core.graph import NOTE
    from analysisgnn_tpu.data.features import select_features
    from analysisgnn_tpu.data.graph_build import build_score_graph
    from analysisgnn_tpu.data.note_array import synthetic_score
    from analysisgnn_tpu.data.sampler import ScoreSample
    from analysisgnn_tpu.theory.encoders import KeySignatureEncoder, PitchEncoder
    from analysisgnn_tpu.theory.vocab import TASK_DICT

    tasks = tuple(TASK_DICT.items())
    samples = []
    for s in range(n_scores):
        na = synthetic_score(num_notes=notes, seed=s)
        feats = select_features(na, "voice")
        g = build_score_graph(na, add_beats=True, add_measures=True)
        features = {
            NOTE: feats,
            "beat": np.zeros((max(g.num_beats, 1), feats.shape[1]), np.float32),
            "measure": np.zeros(
                (max(g.num_measures, 1), feats.shape[1]), np.float32
            ),
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
        samples.append(
            ScoreSample(features=features, edges=g.edges, note_attrs=attrs)
        )
    return samples


def _cost_analysis(compiled):
    """flops / bytes from XLA's cost model; tolerant of per-device lists."""
    try:
        ca = compiled.cost_analysis()
    except Exception:
        return None, None
    if isinstance(ca, (list, tuple)):
        ca = ca[0] if ca else {}
    if not isinstance(ca, dict):
        return None, None
    return ca.get("flops"), ca.get("bytes accessed")


def run_arm(name: str, spec: dict, samples_cache: dict) -> dict:
    import jax

    from analysisgnn_tpu.core.graph import NOTE, metadata
    from analysisgnn_tpu.data.sampler import SamplerConfig, SubgraphSampler
    from analysisgnn_tpu.models.analysis import AnalysisGNN
    from analysisgnn_tpu.theory.vocab import TASK_DICT
    from analysisgnn_tpu.train.schedules import warmup_cosine_schedule
    from analysisgnn_tpu.train.state import create_train_state, make_optimizer
    from analysisgnn_tpu.train.step import (
        StepConfig,
        make_train_step_multi,
        stack_batches,
    )
    from analysisgnn_tpu.utils.profiling import TPU_PEAKS, conv_roofline

    tasks = tuple(TASK_DICT.items())
    # one source score per batch slot (graphmuse loader contract: one
    # subgraph per score per batch) so every arm measures its declared
    # batch size — the old fixed 4-score corpus capped every batch at 4
    # graphs and 6-26% node occupancy (round-5 finding)
    key = (spec["notes"], spec["bs"])
    if key not in samples_cache:
        samples_cache[key] = _build_samples(spec["notes"], n_scores=spec["bs"])
    samples = samples_cache[key]

    cfg = SamplerConfig(
        subgraph_size=spec["sub"], batch_size=spec["bs"],
        num_neighbors=(5, 5), seed=0, sort_edges_by_src=True,
    )
    sampler = SubgraphSampler(samples, cfg)
    batch = sampler.sample_batch()

    nodes, edges_meta = metadata(True, True)
    model = AnalysisGNN(
        metadata=(nodes, edges_meta), in_channels=25, hidden_channels=256,
        out_channels=128, task_dict=tasks, num_layers=3, dropout=0.3,
        logit_fusion=False, encoder_type="hybridgnn",
        use_pallas=spec["pallas"], remat=spec["remat"],
        conv_impl=spec.get("conv_impl", "node"),
    )
    attrs = batch.node_attrs[NOTE]
    args = (
        batch.x_dict(), batch.edge_index_dict(), batch.batch,
        attrs["pitch_spelling"], attrs["key_signature"],
        batch.num_target_nodes,
    )
    params = model.init(jax.random.PRNGKey(0), *args)
    opt = make_optimizer(warmup_cosine_schedule(5e-3, total_steps=1000))
    state = create_train_state(params, len(tasks), opt, jax.random.PRNGKey(1))
    step_cfg = StepConfig(
        task_dict=tasks, active_tasks=tuple(t for t, _ in tasks),
        mt_strategy="wloss", compute_dtype=spec["dtype"],
    )
    K = spec["k"]
    train_step_multi = make_train_step_multi(model, opt, step_cfg)

    stacked = jax.device_put(
        stack_batches([sampler.sample_batch() for _ in range(K)])
    )
    jax.block_until_ready(stacked)
    edges_per_batch = float(
        sum(np.asarray(v).mean() for v in stacked.num_edges.values())
    )
    nodes_per_batch = int(np.asarray(batch.node_features[NOTE]).shape[0])

    # XLA's own cost model for the compiled K-step program
    flops_k = bytes_k = None
    try:
        lowered = train_step_multi.lower(state, stacked)
        compiled = lowered.compile()
        flops_k, bytes_k = _cost_analysis(compiled)
    except Exception as e:  # noqa: BLE001 — cost model is best-effort
        print(f"[roofline] cost_analysis unavailable: {e}", file=sys.stderr)

    # warmup (also compiles if .lower() path failed)
    state, auxes = train_step_multi(state, stacked)
    _ = float(np.asarray(auxes["total_loss"])[-1])

    # timed: enough rounds that dt >> per-dispatch overhead
    rounds = max(1, int(np.ceil(24 / K)))
    t0 = time.perf_counter()
    for _ in range(rounds):
        state, auxes = train_step_multi(state, stacked)
    _ = float(np.asarray(auxes["total_loss"])[-1])
    dt = time.perf_counter() - t0
    steps = rounds * K
    ms_per_step = dt / steps * 1e3

    peaks = TPU_PEAKS[CHIP]
    rec = {
        "arm": name,
        **{k: spec[k] for k in ("sub", "bs", "k", "dtype", "pallas", "remat")},
        "conv_impl": spec.get("conv_impl", "node"),
        "nodes_per_batch": nodes_per_batch,
        "valid_edges_per_batch": round(edges_per_batch),
        "ms_per_step": round(ms_per_step, 2),
        "edges_per_s": round(edges_per_batch * steps / dt),
        "chip": CHIP,
        "peak_bf16_tflops": peaks["bf16_flops"] / 1e12,
        "peak_hbm_gbps": peaks["hbm_bw"] / 1e9,
    }
    if flops_k:
        # cost model counts the whole K-scan program once
        achieved = flops_k / K / (dt / steps)
        rec["xla_flops_per_step"] = flops_k / K
        rec["achieved_tflops"] = round(achieved / 1e12, 3)
        rec["pct_bf16_peak"] = round(100 * achieved / peaks["bf16_flops"], 2)
    if bytes_k:
        bw = bytes_k / K / (dt / steps)
        rec["xla_bytes_per_step"] = bytes_k / K
        rec["achieved_hbm_gbps"] = round(bw / 1e9, 1)
        rec["pct_hbm_peak"] = round(100 * bw / peaks["hbm_bw"], 2)
    # analytic fallback / cross-check: 4 fused multi-relation conv layers
    # (3 encoder + final), 7 note-note relations
    dtype_bytes = 2 if spec["dtype"] == "bfloat16" else 4
    rl = conv_roofline(
        num_nodes=nodes_per_batch, num_edges=int(edges_per_batch),
        in_features=256, out_features=256, num_relations=7,
        dtype_bytes=dtype_bytes,
    )
    # fwd + bwd ~ 3x fwd FLOPs, 4 conv layers
    rec["model_flops_per_step"] = rl.flops * 4 * 3
    rec["model_bytes_per_step"] = rl.bytes * 4 * 3
    if "pct_bf16_peak" in rec and "pct_hbm_peak" in rec:
        rec["bound"] = (
            "compute" if rec["pct_bf16_peak"] >= rec["pct_hbm_peak"]
            else "bandwidth"
        )
        if max(rec["pct_bf16_peak"], rec["pct_hbm_peak"]) < 10:
            rec["bound"] = "dispatch/latency"
    return rec


def main() -> None:
    import jax

    cache_dir = os.path.join(ROOT, ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass
    print(f"[roofline] devices: {jax.devices()}", file=sys.stderr, flush=True)

    arm_names = sys.argv[1:] or DEFAULT_ARMS
    out_path = os.path.join(ROOT, "bench_queue", "roofline.json")
    existing = []
    if os.path.exists(out_path):
        with open(out_path) as f:
            existing = json.load(f)
    recs = {r["arm"]: r for r in existing}
    samples_cache: dict = {}
    for name in arm_names:
        t0 = time.perf_counter()
        try:
            rec = run_arm(name, ARMS[name], samples_cache)
        except Exception as e:  # noqa: BLE001 — record OOM/compile failures
            rec = {"arm": name, **ARMS[name], "error": str(e)[:400]}
        rec["wall_s"] = round(time.perf_counter() - t0, 1)
        # never clobber an existing SUCCESSFUL record with an error (a
        # tunnel-worker crash poisons the whole process: every later arm
        # fails instantly; run arms one-per-process to avoid the cascade)
        if "error" in rec and "ms_per_step" in recs.get(rec["arm"], {}):
            print(json.dumps(rec), flush=True)
            print(f"[roofline] keeping prior successful {rec['arm']} record",
                  file=sys.stderr, flush=True)
            continue
        recs[rec["arm"]] = rec
        print(json.dumps(rec), flush=True)
        with open(out_path, "w") as f:
            json.dump(list(recs.values()), f, indent=1)


if __name__ == "__main__":
    main()
