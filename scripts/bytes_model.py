"""Analytic HBM bytes/step lower bound for the HybridGNN train step
(VERDICT r4 ask #3: quantify "irreducible" at the train shape).

Methodology — the *perfect-fusion* minimum: every tensor the dataflow must
materialize is written once and read once; every per-edge gather reads
exactly one F-wide row per edge; every aggregation writes each output row
once; no layout copies, no padding.  Two variants are computed:

* ``min_valid``  — the true lower bound: only VALID content (valid nodes,
  valid edges) is touched.  No implementation computing the same function
  needs fewer HBM bytes (short of caching whole layers in VMEM).
* ``min_padded`` — the same ops at the sampler's PADDED capacities: what a
  zero-copy static-shape implementation pays.  (min_padded − min_valid) is
  the padding tax; (xla_bytes − min_padded) is layout/copy/remat waste.

Results land in ``bench_queue/bytes_model.json`` next to the matching
roofline rows (xla_bytes_per_step = the XLA cost model's bytes for the
compiled program; achieved GB/s in roofline.json divides those by measured
time).

Run (host-only, forced CPU; reads bench_queue/roofline.json if present):

    python scripts/bytes_model.py [arms...]   # default: large-f32 xl-bf16
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax

if (jax.config.jax_platforms or "") != "cpu":
    jax.config.update("jax_platforms", "cpu")

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

HIDDEN = 256
OUT = 128
LAYERS = 3  # + 1 final conv
EMBED = 64


def batch_shapes(spec: dict) -> dict:
    """Build the arm's batch (same code path as bench_roofline) and report
    valid + padded shape inventory."""
    import bench_roofline as br
    from analysisgnn_tpu.core.graph import NOTE
    from analysisgnn_tpu.data.sampler import SamplerConfig, SubgraphSampler

    samples = br._build_samples(spec["notes"], n_scores=spec["bs"])
    cfg = SamplerConfig(
        subgraph_size=spec["sub"], batch_size=spec["bs"],
        num_neighbors=(5, 5), seed=0, sort_edges_by_src=True,
    )
    sampler = SubgraphSampler(samples, cfg)
    b = sampler.sample_batch(to_device=False)
    nodes_valid = {t: int(np.asarray(b.num_nodes[t])) for t in b.num_nodes}
    nodes_cap = {t: int(np.asarray(v).shape[0]) for t, v in b.node_features.items()}
    edges_valid = {k: int(np.asarray(b.num_edges[k])) for k in b.edge_index}
    edges_cap = {k: int(np.asarray(v).shape[1]) for k, v in b.edge_index.items()}
    n_feat = int(np.asarray(b.node_features[NOTE]).shape[1])
    return {
        "nodes_valid": nodes_valid, "nodes_cap": nodes_cap,
        "edges_valid": edges_valid, "edges_cap": edges_cap,
        "in_features": n_feat,
        "num_targets": int(np.asarray(b.num_target_nodes)),
    }


def param_count(task_dict) -> int:
    """Parameter count of the flagship model (measured, not estimated)."""
    import bench_roofline as br  # noqa: F401  (sys.path)
    from analysisgnn_tpu.core.graph import metadata
    from analysisgnn_tpu.models.analysis import AnalysisGNN

    # cheap init at tiny shapes: param tree is shape-independent
    import __graft_entry__ as ge

    sampler = ge._build_batch(num_notes=128, subgraph=32, batch_graphs=2,
                              tasks=task_dict)
    batch = sampler.sample_batch(to_device=False)
    from analysisgnn_tpu.core.graph import NOTE

    nodes, edges = metadata(True, True)
    model = AnalysisGNN(
        metadata=(nodes, edges), in_channels=25, hidden_channels=HIDDEN,
        out_channels=OUT, task_dict=task_dict, num_layers=LAYERS,
        dropout=0.3, encoder_type="hybridgnn",
    )
    attrs = batch.node_attrs[NOTE]
    params = model.init(
        jax.random.PRNGKey(0), batch.x_dict(), batch.edge_index_dict(),
        batch.batch, attrs["pitch_spelling"], attrs["key_signature"],
        batch.num_target_nodes,
    )
    return sum(int(np.prod(l.shape)) for l in jax.tree_util.tree_leaves(params))


def analytic_min(shapes: dict, task_dict, n_params: int, dbytes: int) -> dict:
    """Itemized perfect-fusion byte count; all figures in bytes/step.

    fwd items are listed; bwd is counted as 2x the activation-path items
    (grad-of-activations mirrors the forward reads/writes, and the weight-
    grad pass re-reads the saved activations once) — the standard 3x-
    forward traffic model for gather/scatter-dominated graphs.
    """
    d = dbytes
    f32 = 4
    nv = shapes["nodes_valid"]
    ev = shapes["edges_valid"]
    n_notes = nv["note"]
    n_nodes_all = sum(nv.values())
    e_all = sum(ev.values())
    f_in = shapes["in_features"]
    sum_classes = sum(c for _, c in task_dict)

    items = {}
    # input features + embedding gathers + projection output
    items["inputs"] = n_notes * (f_in + 2 * EMBED) * d + n_nodes_all * HIDDEN * d
    # conv layers (3 + final): per edge ONE F-wide gather read; per node
    # ONE aggregated write per layer + the self-path read of the layer
    # input; relation transforms happen at node level post-aggregation
    # (the edge impl's linearity commute) so they cost node-level traffic.
    per_layer = (
        e_all * HIDDEN * d            # gather reads (one row per edge)
        + n_nodes_all * HIDDEN * d    # aggregation output write
        + n_nodes_all * HIDDEN * d    # layer input read (self path)
        + n_nodes_all * HIDDEN * d    # post-activation write (relu/norm)
    )
    items["conv_layers_fwd"] = (LAYERS + 1) * per_layer
    # JK attention over 3 layer states + onset pooling + enc projection
    items["jk_pool_proj"] = (
        LAYERS * n_notes * HIDDEN * d       # JK reads
        + n_notes * HIDDEN * d              # JK output
        + ev.get("note__onset__note", 0) * HIDDEN * d  # onset pool gather
        + n_notes * (HIDDEN + OUT) * d      # pool write + proj output
    )
    # heads: z read per task batch + logits write + softmax/CE read
    items["heads_logits_fwd"] = (
        n_notes * OUT * d
        + 2 * n_notes * sum_classes * f32   # logits write + CE read (f32)
    )
    act_path = (
        items["conv_layers_fwd"] + items["jk_pool_proj"]
        + items["heads_logits_fwd"]
    )
    # backward: grad-of-activation mirror (1x) + weight-grad re-read (1x)
    items["backward"] = 2 * act_path
    # params: fwd read + bwd grad write + AdamW (read p,m,v + write p,m,v
    # + read grads) — 9 passes of f32
    items["params_optimizer"] = 9 * n_params * f32
    total = sum(items.values())
    return {"items_gb": {k: round(v / 1e9, 3) for k, v in items.items()},
            "total_gb": round(total / 1e9, 3)}


def main() -> None:
    import bench_roofline as br
    from analysisgnn_tpu.theory.vocab import TASK_DICT

    arms = sys.argv[1:] or ["large-f32", "xl-bf16"]
    task_dict = tuple(TASK_DICT.items())
    n_params = param_count(task_dict)
    roofline = {}
    rp = os.path.join(ROOT, "bench_queue", "roofline.json")
    if os.path.exists(rp):
        with open(rp) as f:
            roofline = {r["arm"]: r for r in json.load(f)}

    out = {"n_params": n_params, "arms": {}}
    for arm in arms:
        spec = br.ARMS[arm]
        shapes = batch_shapes(spec)
        d = 2 if spec["dtype"] == "bfloat16" else 4
        mn_valid = analytic_min(shapes, task_dict, n_params, d)
        # padded variant: same formulas at capacity shapes
        padded = dict(shapes)
        padded = {
            **shapes,
            "nodes_valid": shapes["nodes_cap"],
            "edges_valid": shapes["edges_cap"],
        }
        mn_padded = analytic_min(padded, task_dict, n_params, d)
        rec = {
            "shapes": shapes,
            "min_valid_gb": mn_valid["total_gb"],
            "min_valid_items_gb": mn_valid["items_gb"],
            "min_padded_gb": mn_padded["total_gb"],
        }
        rl = roofline.get(arm)
        if rl and rl.get("xla_bytes_per_step"):
            xla_gb = rl["xla_bytes_per_step"] / 1e9
            rec["xla_bytes_gb"] = round(xla_gb, 2)
            rec["ms_per_step"] = rl["ms_per_step"]
            rec["achieved_over_min_valid"] = round(xla_gb / mn_valid["total_gb"], 2)
            rec["achieved_over_min_padded"] = round(xla_gb / mn_padded["total_gb"], 2)
            rec["padding_tax"] = round(
                mn_padded["total_gb"] / mn_valid["total_gb"], 2
            )
            # time lower bound at HBM peak for the valid minimum
            rec["min_valid_ms_at_hbm_peak"] = round(
                mn_valid["total_gb"] / 820.0 * 1e3, 1
            )
        out["arms"][arm] = rec
        print(json.dumps({arm: rec}), flush=True)
    with open(os.path.join(ROOT, "bench_queue", "bytes_model.json"), "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
