"""DP scaling harness: the FULL production train step over a data mesh.

Complements scripts/bench_scaling.py (which measures the graph-partition /
CP-analog axis on the partitioned encoder): this one measures the DATA
axis — the whole multi-task train step (`distributed/mesh.py::
make_sharded_train_step`: fwd + bwd + AdamW + gradient psum over the mesh)
at the reference configuration (HybridGNN 3×256, 21 tasks, subgraph 500),
strong-scaling a fixed global batch of 8 sampled subgraphs across
D ∈ {1, 2, 4, 8} devices.

One real chip is available here, so the mesh is the 8-device virtual CPU
mesh (this host has 4 physical cores — past one device per core the
"devices" timeshare and wall time stops improving; the protocol and the
comm-fraction measurement are what transfer to a real slice, where the
gradient all-reduce rides ICI).

Usage: python scripts/bench_dp_scaling.py [max_devices]
Writes dp_scaling_table.json and prints a markdown table.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if "xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

if (jax.config.jax_platforms or "") != "cpu":
    jax.config.update("jax_platforms", "cpu")

import numpy as np

GLOBAL_GRAPHS = 8  # reference batch: 8 subgraphs x 500 targets per step
SUBGRAPH = 500
STEPS = 4


def main():
    import dataclasses

    import __graft_entry__ as ge
    from analysisgnn_tpu.core.graph import NOTE
    from analysisgnn_tpu.distributed.mesh import (
        make_mesh,
        make_sharded_train_step,
        replicate,
        shard_stacked_batch,
        stack_batches,
    )
    from analysisgnn_tpu.theory.vocab import TASK_DICT
    from analysisgnn_tpu.train.schedules import warmup_cosine_schedule
    from analysisgnn_tpu.train.state import create_train_state, make_optimizer
    from analysisgnn_tpu.train.step import StepConfig

    max_dev = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    tasks = tuple(TASK_DICT.items())
    model = ge._make_model(hidden=256, out=128, layers=3, tasks=tasks)
    opt = make_optimizer(warmup_cosine_schedule(5e-3, total_steps=1000))
    cfg = StepConfig(
        task_dict=tasks,
        active_tasks=tuple(t for t, _ in tasks),
        mt_strategy="wloss",
    )

    rows = []
    t1 = None
    params = None
    edges_per_step = None
    for d in (1, 2, 4, 8):
        if d > max_dev:
            break
        # strong scaling: fixed global batch, 8/D graphs per device
        graphs_per_dev = GLOBAL_GRAPHS // d
        sampler = ge._build_batch(
            num_notes=2000, subgraph=SUBGRAPH, batch_graphs=graphs_per_dev,
            tasks=tasks,
        )
        per_dev = [sampler.sample_batch() for _ in range(d)]
        stacked = stack_batches(per_dev)
        if edges_per_step is None:
            # valid message edges in the full global batch (same at every D)
            edges_per_step = float(
                sum(np.asarray(v).sum() for v in stacked.num_edges.values())
            )
        if params is None:
            b0 = per_dev[0]
            attrs = b0.node_attrs[NOTE]
            params = model.init(
                jax.random.PRNGKey(0),
                b0.x_dict(), b0.edge_index_dict(), b0.batch,
                attrs["pitch_spelling"], attrs["key_signature"],
                b0.num_target_nodes,
            )
        # NOTE: per-device batch SHAPES differ per D (graphs_per_dev), so
        # each D compiles its own step — that's the strong-scaling protocol.
        mesh = make_mesh(d, model_size=1)  # pure DP: all devices on "data"
        state = create_train_state(params, len(tasks), opt, jax.random.PRNGKey(1))
        with mesh:
            state = replicate(state, mesh)
            sb = shard_stacked_batch(stacked, mesh)
            step = make_sharded_train_step(model, opt, cfg, mesh)
            state, loss = step(state, sb)
            _ = float(loss)
            t0 = time.perf_counter()
            for _ in range(STEPS):
                state, loss = step(state, sb)
            _ = float(loss)
            dt = (time.perf_counter() - t0) / STEPS
        if t1 is None:
            t1 = dt
        rows.append(
            {
                "devices": d,
                "graphs_per_device": graphs_per_dev,
                "ms_per_step": round(dt * 1e3, 1),
                "k_edges_per_s": round(edges_per_step / dt / 1e3, 1),
                "strong_scaling_efficiency": round(t1 / dt / d, 3),
            }
        )
        print(json.dumps(rows[-1]), flush=True)

    out = {
        "problem": {
            "global_graphs": GLOBAL_GRAPHS,
            "subgraph": SUBGRAPH,
            "tasks": len(tasks),
            "model": "HybridGNN 3x256 out 128",
            "edges_per_step": edges_per_step,
        },
        "host_cores": os.cpu_count(),
        "rows": rows,
    }
    with open(
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "dp_scaling_table.json",
        ),
        "w",
    ) as f:
        json.dump(out, f, indent=1)
    print("| D | graphs/dev | ms/step | K edges/s | strong eff |")
    print("|---|---|---|---|---|")
    for r in rows:
        print(
            f"| {r['devices']} | {r['graphs_per_device']} | {r['ms_per_step']} "
            f"| {r['k_edges_per_s']} | {r['strong_scaling_efficiency']} |"
        )


if __name__ == "__main__":
    main()
