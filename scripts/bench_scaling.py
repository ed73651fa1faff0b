"""Scaling-efficiency harness: partitioned-graph throughput vs device count.

BASELINE.json protocol: edges/s at 1 chip → N devices with ≥80% efficiency.
On this machine the mesh is the virtual CPU mesh (one real chip available);
the harness demonstrates the measurement and the collective path — absolute
numbers come from real slices.

Usage: JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
       python scripts/bench_scaling.py
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
from jax.sharding import Mesh

from analysisgnn_tpu.core.graph import NOTE
from analysisgnn_tpu.data.graph_build import build_score_graph
from analysisgnn_tpu.data.note_array import synthetic_score
from analysisgnn_tpu.distributed.partition import (
    make_partitioned_forward,
    partition_graph,
)


def run(num_devices: int, n_notes: int = 16384, f: int = 64, layers: int = 3):
    rng = np.random.default_rng(0)
    na = synthetic_score(num_notes=n_notes, seed=0)
    g = build_score_graph(na, add_beats=False, add_measures=False)
    relations = [
        (NOTE, "onset", NOTE),
        (NOTE, "consecutive", NOTE),
        (NOTE, "consecutive_rev", NOTE),
        (NOTE, "during", NOTE),
        (NOTE, "during_rev", NOTE),
    ]
    edges = {et: g.edges[et] for et in relations}
    total_edges = sum(e.shape[1] for e in edges.values())
    x = rng.normal(size=(len(na), f)).astype(np.float32)
    params = {
        et[1]: {
            "w_neigh": np.random.default_rng(1).normal(size=(f, f)).astype(np.float32) * 0.1,
            "b_neigh": np.zeros(f, np.float32),
            "w_self": np.random.default_rng(2).normal(size=(f, f)).astype(np.float32) * 0.1,
            "w_agg": np.random.default_rng(3).normal(size=(f, f)).astype(np.float32) * 0.1,
            "b_out": np.zeros(f, np.float32),
        }
        for et in relations
    }
    devices = jax.devices()[:num_devices]
    mesh = Mesh(np.asarray(devices).reshape(num_devices, 1), ("data", "model"))
    part = partition_graph(x, edges, num_devices=num_devices)
    fwd = jax.jit(
        make_partitioned_forward(relations, num_layers=layers, mesh=mesh, axis="data"),
        static_argnums=(4,),
    )
    import jax.numpy as jnp

    args = (
        jnp.asarray(part.x),
        {k: jnp.asarray(v) for k, v in part.edge_src.items()},
        {k: jnp.asarray(v) for k, v in part.edge_dst.items()},
        [params] * layers,
        part.halo,
    )
    out = fwd(*args)
    jax.block_until_ready(out)
    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fwd(*args)
    _ = float(np.asarray(out).ravel()[0])
    dt = (time.perf_counter() - t0) / iters
    return total_edges * layers / dt


def main():
    results = {}
    base = None
    for d in (1, 2, 4, 8):
        if d > len(jax.devices()):
            break
        eps = run(d)
        if base is None:
            base = eps
        eff = eps / (base * d)
        results[d] = {"edges_per_s": round(eps, 1), "efficiency": round(eff, 3)}
        print(f"devices={d}: {eps/1e6:8.2f} M edges/s  efficiency={eff:.2%}")
    print(json.dumps(results))


if __name__ == "__main__":
    main()
