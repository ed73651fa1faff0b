"""Inference-path throughput: full-graph predict on a long score.

Mirrors the reference's test-time protocol (near-full graphs,
``subgraph_size=10000, batch_size=1`` — datamodules/analysis.py:310-324):
one jitted full-graph forward of the flagship model over an ~N-note score
plus the host-side onset-wise smoothing, measured in notes/s.

    python scripts/bench_inference.py [n_notes] [encoder]

Run on the default (axon) platform for chip numbers; honest-timing rules
from docs/STATUS.md apply (idle machine, scalar fetch).
Writes bench_inference.json.
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
    from analysisgnn_tpu.data.note_array import synthetic_score
    from analysisgnn_tpu.inference.predict import (
        graph_from_note_array,
        onsetwise_smooth,
    )
    from analysisgnn_tpu.models.analysis import AnalysisGNN
    from analysisgnn_tpu.theory.vocab import TASK_DICT

    n_notes = int(sys.argv[1]) if len(sys.argv) > 1 else 10000
    encoder = sys.argv[2] if len(sys.argv) > 2 else "HybridGNN"
    tasks = tuple(TASK_DICT.items())
    na = synthetic_score(num_notes=n_notes, seed=0)
    graph = graph_from_note_array(na)
    nodes, edges_meta = metadata(True, True)
    enc, _, variant = encoder.lower().partition("-")
    # "<enc>-edge" selects the fused-SAGE edge impl (models/fused.py) —
    # same arm grammar as scripts/bench_encoders.py
    conv_impl = "node"
    if variant in ("edge", "edgezxp"):
        conv_impl = {"edge": "edge", "edgezxp": "edge-zxp"}[variant]
        variant = ""
    model = AnalysisGNN(
        metadata=(nodes, edges_meta), in_channels=25, hidden_channels=256,
        out_channels=128, task_dict=tasks, num_layers=3, dropout=0.0,
        encoder_type=enc, hgt_group_mode=variant or "pair",
        conv_impl=conv_impl,
    )
    attrs = graph.node_attrs[NOTE]
    args = (
        graph.x_dict(), graph.edge_index_dict(), graph.batch,
        attrs["pitch_spelling"], attrs["key_signature"], graph.num_target_nodes,
    )
    params = model.init(jax.random.PRNGKey(0), *args)
    fwd = jax.jit(model.apply)
    args_dev = jax.device_put(args)
    jax.block_until_ready(args_dev)

    # device forward
    logits = fwd(params, *args_dev)
    _ = float(logits["cadence"].sum())  # force completion
    steps = 8
    t0 = time.perf_counter()
    for _ in range(steps):
        logits = fwd(params, *args_dev)
    _ = float(logits["cadence"].sum())
    dt_fwd = (time.perf_counter() - t0) / steps

    # host-side decode chain (softmax + onset smoothing), once
    def np_softmax(x):
        x = np.asarray(x, np.float64)
        x = x - x.max(-1, keepdims=True)
        e = np.exp(x)
        return e / e.sum(-1, keepdims=True)

    t0 = time.perf_counter()
    probs = {k: np_softmax(v) for k, v in logits.items()}
    onset_edges = np.asarray(graph.edges((NOTE, "onset", NOTE)))
    ne = int(graph.num_edges["note__onset__note"])
    _ = onsetwise_smooth(probs, onset_edges[:, :ne], na["onset_div"])
    dt_host = time.perf_counter() - t0

    # serving path: ids-only device decode (softmax + onset aggregation +
    # argmax on device, ONE [T, N] int32 fetch) — what the predict CLI uses
    from analysisgnn_tpu.inference.predict import predict_score_ids

    ids = predict_score_ids(model, params, na, add_beats=True, add_measures=True)
    assert all(v.shape == (n_notes,) for v in ids.values())
    steps_ids = 4
    t0 = time.perf_counter()
    for _ in range(steps_ids):
        ids = predict_score_ids(model, params, na, add_beats=True, add_measures=True)
    dt_ids = (time.perf_counter() - t0) / steps_ids

    out = {
        "metric": "full_graph_inference_notes_per_s",
        "encoder": encoder,
        "n_notes": n_notes,
        "forward_ms": round(dt_fwd * 1e3, 1),
        "host_decode_ms": round(dt_host * 1e3, 1),
        "ids_path_ms": round(dt_ids * 1e3, 1),
        "notes_per_s_device": round(n_notes / dt_fwd),
        "notes_per_s_end_to_end": round(n_notes / (dt_fwd + dt_host)),
        "notes_per_s_ids_path": round(n_notes / dt_ids),
        "platform": jax.devices()[0].platform,
    }
    print(json.dumps(out))
    with open(
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "bench_inference.json"), "w"
    ) as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
