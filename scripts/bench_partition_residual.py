"""Decompose the graph-partition strong-scaling residual (VERDICT r3 ask #4).

Round 3 measured D=2 strong-scaling efficiency 0.676 with the collectives
DIRECT-timed at 0.8% of the step (scaling_table.json) — so ~32% of the step
was lost to something that is neither communication nor explained.  This
harness attributes it term by term:

  t(D=2)  =  work(one shard, fair core share)  +  comm  +  mesh overhead

* ANALYTIC terms (properties of the partition plan, exact):
    - edge-padding overhead: sum_d E_cap - E_total over relations (devices
      compute the max shard's padded edge count);
    - halo-duplicated compute: (n_local + 2·halo)/n_local - 1 per layer.
* MEASURED terms:
    - work(one shard, all cores):   the D=2 shard-0 computation run as a
      1-device partition (identical shapes, zero halos = identical work);
    - work(one shard, half cores):  same, under ``taskset`` on cores/D
      physical cores — on the virtual CPU mesh, D devices SHARE the host's
      intra-op pool, so each shard effectively gets cores/D; the delta
      between these two rows is a HOST ARTIFACT that does not exist on a
      real slice (every chip is a whole chip);
    - comm: the direct-timed ppermute exchange (scripts/bench_scaling.py
      protocol);
    - mesh overhead: t(D=2) - work(half cores) - comm  (dispatch/sync).

Usage:  python scripts/bench_partition_residual.py
        (re-invokes itself under taskset for the core-budget arms)
Writes bench_queue/partition_residual.json.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

if "xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=8"
    ).strip()

N_NOTES = 24576
HIDDEN = 256
LAYERS = 3
STEPS = 6


def _setup():
    import jax

    if (jax.config.jax_platforms or "") != "cpu":
        jax.config.update("jax_platforms", "cpu")
    import bench_scaling as bs

    return bs


def time_shard(shard: int, devices: int) -> float:
    """Time ONE shard of the D-way partition as a 1-device partitioned run
    (same shapes + zero halos == same work, no collectives)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh

    bs = _setup()
    from analysisgnn_tpu.distributed import partition_encoder as pe
    from analysisgnn_tpu.distributed.partition import partition_graph

    x, edges, relations, _ = bs.build_problem()
    enc_params = bs.init_encoder(x, edges, relations)
    pg = partition_graph(x, edges, devices)
    mesh = Mesh(np.array(jax.devices("cpu")[:1]), ("graph",))
    fn = pe.make_partitioned_fused_sage(
        relations, num_layers=LAYERS, mesh=mesh, use_jk=False, hidden=HIDDEN
    )
    xp = jnp.asarray(pg.x[shard : shard + 1])
    es = {et: jnp.asarray(pg.edge_src[et][shard : shard + 1]) for et in relations}
    ed = {et: jnp.asarray(pg.edge_dst[et][shard : shard + 1]) for et in relations}
    jit_fn = jax.jit(lambda xp, es, ed: fn(enc_params, xp, es, ed, pg.halo))
    with mesh:
        out = jit_fn(xp, es, ed)
        out.block_until_ready()
        t0 = time.perf_counter()
        for _ in range(STEPS):
            out = jit_fn(xp, es, ed)
        float(out.sum())
        return (time.perf_counter() - t0) / STEPS


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "shard":
        # subprocess arm: print one number
        print(json.dumps({"t_shard": time_shard(int(sys.argv[2]), int(sys.argv[3]))}))
        return

    import numpy as np

    bs = _setup()
    from analysisgnn_tpu.distributed.partition import partition_graph

    cores = os.cpu_count() or 1
    d = 2  # the honest budget on this 4-core host (see bench_scaling.py)

    x, edges, relations, total_edges = bs.build_problem()
    enc_params = bs.init_encoder(x, edges, relations)
    pg = partition_graph(x, edges, d)

    # ---- analytic terms -------------------------------------------------
    pad_counts = {}
    for et in relations:
        caps = pg.edge_src[et].shape[1]
        valid = int((pg.edge_src[et] < pg.num_local).sum())
        pad_counts[str(et)] = {"cap_per_dev": caps, "valid_total": valid,
                               "padded_total": d * caps}
    padded_edges = sum(v["padded_total"] for v in pad_counts.values())
    edge_pad_overhead = padded_edges / total_edges - 1.0
    halo_compute_overhead = (pg.num_local + 2 * pg.halo) / pg.num_local - 1.0

    # ---- measured terms --------------------------------------------------
    t_d1, _ = bs.run(1, x, edges, relations, enc_params)
    t_d2, halo = bs.run(d, x, edges, relations, enc_params)
    t_comm = bs.time_comm_only(d, N_NOTES // d, halo)

    # one-shard work at full host vs at its fair core share (subprocess so
    # the XLA:CPU intra-op pool is actually bounded by the cpuset)
    def shard_time(cpu_list: str) -> float:
        cmd = ["taskset", "-c", cpu_list, sys.executable,
               os.path.abspath(__file__), "shard", "0", str(d)]
        out = subprocess.run(cmd, capture_output=True, text=True, check=True)
        return json.loads(out.stdout.strip().splitlines()[-1])["t_shard"]

    all_cores = ",".join(str(i) for i in range(cores))
    half_cores = ",".join(str(i) for i in range(cores // d))
    t_shard_full = shard_time(all_cores)
    t_shard_half = shard_time(half_cores)

    mesh_overhead = t_d2 - t_shard_half - t_comm
    host_artifact = t_shard_half - t_shard_full

    result = {
        "problem": {"n_notes": N_NOTES, "hidden": HIDDEN, "layers": LAYERS,
                    "total_edges": total_edges, "halo": pg.halo},
        "host_cores": cores,
        "analytic": {
            "edge_pad_overhead_frac": round(edge_pad_overhead, 4),
            "halo_compute_overhead_frac": round(halo_compute_overhead, 4),
            "per_relation": pad_counts,
        },
        "measured_ms": {
            "t_d1": round(t_d1 * 1e3, 1),
            "t_d2": round(t_d2 * 1e3, 1),
            "t_comm_direct": round(t_comm * 1e3, 3),
            "t_shard0_all_cores": round(t_shard_full * 1e3, 1),
            "t_shard0_fair_share_cores": round(t_shard_half * 1e3, 1),
        },
        "attribution_of_d2_step": {
            "work_fair_core_share_pct": round(100 * t_shard_half / t_d2, 1),
            "comm_pct": round(100 * t_comm / t_d2, 1),
            "mesh_dispatch_sync_pct": round(100 * mesh_overhead / t_d2, 1),
        },
        "host_artifact": {
            "definition": "extra ms one shard takes on cores/D cores vs all "
                          "cores — exists only because virtual devices share "
                          "the host intra-op pool; a real chip is whole",
            "ms": round(host_artifact * 1e3, 1),
            "pct_of_d2_step": round(100 * host_artifact / t_d2, 1),
        },
        "efficiency": {
            "measured_d2": round(t_d1 / t_d2 / d, 3),
            "hardware_projection_d2": round(
                t_d1 / (d * (t_shard_full + t_comm * 0.0 + 1.64e-6)), 3
            ),
            "projection_note": "each real chip runs its shard at full-chip "
                               "speed (t_shard0_all_cores) and the exchange "
                               "rides ICI at ~1.6 us/step "
                               "(scaling_table.json ici_projection); >1.0 "
                               "reflects CPU cache effects (a half-size "
                               "shard fits caches better), not real "
                               "super-linearity",
        },
    }
    out_path = os.path.join(ROOT, "bench_queue", "partition_residual.json")
    with open(out_path, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result, indent=1))


if __name__ == "__main__":
    main()
