"""Scaling harness: partitioned PRODUCTION-encoder throughput vs devices.

BASELINE.json protocol: edges/s at 1 chip → N devices with ≥80% efficiency.
One real chip is available here, so the mesh is the virtual CPU mesh and
the HONEST measurements are:

  * strong-scaling wall time of the per-layer-exchange regime
    (distributed/partition_encoder.py::make_partitioned_fused_sage) on a
    fixed 3×256 HybridGNN over a large score graph, at D ∈ {1, 2, 4}
    (this host has 4 physical cores — beyond one device per core the
    "devices" timeshare and the numbers stop meaning anything);
  * the communication fraction: the same partitioned step with the
    ppermute halo exchange stubbed to zeros, isolating collective cost —
    the quantity that transfers to real ICI (where the collectives are
    ~100× faster relative to compute than on a shared-memory CPU ring).

Absolute multi-chip efficiency needs a real slice; the harness is the
measurement protocol and will produce it unchanged there.

Usage: python scripts/bench_scaling.py [max_devices]
Writes scaling_table.json and prints a markdown table.
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

import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from analysisgnn_tpu.core.graph import NOTE, metadata
from analysisgnn_tpu.data.graph_build import build_score_graph
from analysisgnn_tpu.data.note_array import synthetic_score

N_NOTES = 24576
HIDDEN = 256
LAYERS = 3
STEPS = 6


def build_problem():
    na = synthetic_score(num_notes=N_NOTES, seed=0)
    g = build_score_graph(na, add_beats=False, add_measures=False)
    _, ets = metadata(False, False)
    note_rels = tuple(et for et in ets if et[0] == NOTE and et[2] == NOTE)
    edges = {et: np.asarray(g.edges[et]) for et in note_rels if et in g.edges}
    rng = np.random.default_rng(0)
    x = rng.normal(size=(N_NOTES, HIDDEN)).astype(np.float32)
    total_edges = sum(e.shape[1] for e in edges.values())
    return x, edges, tuple(edges.keys()), total_edges


def init_encoder(x, edges, relations):
    from analysisgnn_tpu.models.encoders import HybridGNN

    _, ets = metadata(False, False)
    enc = HybridGNN(hidden=HIDDEN, num_layers=LAYERS, dropout=0.0,
                    use_jk=False, edge_types=ets)
    small_ei = {et: jnp.asarray(v[:, :64].astype(np.int32)) for et, v in edges.items()}
    params = enc.init(
        jax.random.PRNGKey(0), {NOTE: jnp.asarray(x[:256])}, small_ei
    )
    return params["params"]


def run(num_devices, x, edges, relations, enc_params, no_comm=False):
    from analysisgnn_tpu.distributed.partition import partition_graph
    from analysisgnn_tpu.distributed import partition_encoder as pe

    pg = partition_graph(x, edges, num_devices)
    mesh = Mesh(np.array(jax.devices("cpu")[:num_devices]), ("graph",))

    halo_pull_real = pe.halo_pull
    if no_comm:
        pe.halo_pull = lambda xl, h, ax: jnp.zeros((2 * h, xl.shape[1]), xl.dtype)
    try:
        fn = pe.make_partitioned_fused_sage(
            relations, num_layers=LAYERS, mesh=mesh, use_jk=False, hidden=HIDDEN
        )
        xp = jnp.asarray(pg.x)
        es = {et: jnp.asarray(pg.edge_src[et]) for et in relations}
        ed = {et: jnp.asarray(pg.edge_dst[et]) for et in relations}
        jit_fn = jax.jit(
            lambda xp, es, ed: fn(enc_params, xp, es, ed, pg.halo)
        )
        with mesh:
            out = jit_fn(xp, es, ed)
            out.block_until_ready()
            t0 = time.perf_counter()
            for _ in range(STEPS):
                out = jit_fn(xp, es, ed)
            float(out.sum())
            dt = (time.perf_counter() - t0) / STEPS
    finally:
        pe.halo_pull = halo_pull_real
    return dt, pg.halo


def main():
    max_dev = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    x, edges, relations, total_edges = build_problem()
    enc_params = init_encoder(x, edges, relations)
    rows = []
    t1 = None
    for d in (1, 2, 4, 8):
        if d > max_dev:
            break
        dt, halo = run(d, x, edges, relations, enc_params)
        dt_nc, _ = run(d, x, edges, relations, enc_params, no_comm=True)
        if t1 is None:
            t1 = dt
        eff = t1 / (dt * d)
        rows.append(
            {
                "devices": d,
                "ms_per_step": round(dt * 1e3, 1),
                "k_edges_per_s": round(total_edges / dt / 1e3, 1),
                "strong_scaling_efficiency": round(t1 / dt / d, 3),
                "comm_fraction": round(max(dt - dt_nc, 0.0) / dt, 3),
                "halo": halo,
            }
        )
        print(json.dumps(rows[-1]), flush=True)
    out = {
        "problem": {
            "n_notes": N_NOTES, "hidden": HIDDEN, "layers": LAYERS,
            "total_edges": total_edges,
        },
        "host_cores": os.cpu_count(),
        "rows": rows,
    }
    with open(
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "scaling_table.json"), "w"
    ) as f:
        json.dump(out, f, indent=1)
    print("| D | ms/step | K edges/s | strong eff | comm frac |")
    print("|---|---|---|---|---|")
    for r in rows:
        print(
            f"| {r['devices']} | {r['ms_per_step']} | {r['k_edges_per_s']} "
            f"| {r['strong_scaling_efficiency']} | {r['comm_fraction']} |"
        )


if __name__ == "__main__":
    main()
