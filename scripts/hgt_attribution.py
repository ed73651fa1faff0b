"""HGT step-time attribution from a real jax.profiler device trace
(VERDICT r2 ask #3).

Round 2 left HGT at ~434K edges/s (~3x slower than HybridGNN/MetricalGNN)
with the claim "fundamentally ~R x the gather/scatter work" asserted, not
shown.  This script traces the production HGT train step on the chip,
parses the xplane protobuf directly (tensorflow.tsl xplane_pb2 — this
image's tensorboard_plugin_profile lacks the conversion pywrap), and
buckets per-HLO-op device time into: matmul/einsum, gather, scatter,
softmax-ish elementwise, data formatting (copies/transposes), and other —
so the remaining cost is attributed, not guessed.

    python scripts/hgt_attribution.py [HGT|HybridGNN] [steps]

Writes bench_queue/hgt_trace.json (bucket table + top ops) and leaves the
raw profile under /tmp/hgt_trace/ for manual inspection.
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


BUCKETS = (
    # (bucket, category regex, name regex) — first match wins
    ("matmul", r"convolution|dot|matmul|contraction", r"\bdot\b|conv"),
    ("gather", r"gather", r"gather|dynamic-slice"),
    ("scatter", r"scatter", r"scatter|dynamic-update"),
    ("softmax-elementwise", r"", r"exp|divide|max|softmax|reduce"),
    ("data-formatting", r"data formatting|copy|transpose|reshape",
     r"copy|transpose|bitcast|pad|slice|concat"),
)


def bucket_of(category: str, name: str) -> str:
    cat = (category or "").lower()
    nm = (name or "").lower()
    for bucket, cat_re, name_re in BUCKETS:
        if cat_re and re.search(cat_re, cat):
            return bucket
        if name_re and re.search(name_re, nm):
            return bucket
    return "other"


def parse_xplane(path: str) -> dict:
    """xplane.pb -> per-op device-time table from the TPU device plane(s).

    Aggregates XEvent durations per event-metadata (HLO op) name on every
    line of every device plane (planes whose name mentions TPU / device,
    not the host-threads plane).  The per-op ``hlo_category`` stat, when
    recorded, rides on the event metadata's stats."""
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    with open(path, "rb") as f:
        space = xplane_pb2.XSpace.FromString(f.read())
    per_op: dict = {}
    plane_names = [p.name for p in space.planes]
    device_planes = [
        p for p in space.planes
        if ("tpu" in p.name.lower() or "device" in p.name.lower())
        and not ("host" in p.name.lower() and "tpu" not in p.name.lower())
    ]
    if not device_planes:
        # CPU-platform traces put XLA ops on the host plane
        device_planes = [p for p in space.planes if "cpu" in p.name.lower()]
    for plane in device_planes:
        stat_names = {m.id: m.name for m in plane.stat_metadata.values()}
        meta = {}
        for m in plane.event_metadata.values():
            cat = ""
            for st in m.stats:
                if stat_names.get(st.metadata_id) == "hlo_category":
                    cat = st.str_value
            meta[m.id] = (m.name, m.display_name, cat)
        # avoid double counting: module/step-level lines span the same
        # wall time as the op-level line — keep op-level lines only when
        # present ("XLA Ops" in the standard TPU plane layout), else the
        # busiest line
        lines = [
            ln for ln in plane.lines
            if "op" in ln.name.lower() or not ln.name
        ] or sorted(plane.lines, key=lambda ln: -len(ln.events))[:1]
        for line in lines:
            for ev in line.events:
                name, disp, cat = meta.get(ev.metadata_id, ("?", "", ""))
                rec = per_op.setdefault(
                    name, {"name": name, "display": disp, "category": cat,
                           "us": 0.0, "count": 0}
                )
                rec["us"] += ev.duration_ps / 1e6
                rec["count"] += int(ev.num_occurrences or 1)
    buckets: dict = {}
    for rec in per_op.values():
        b = bucket_of(rec["category"],
                      f"{rec['name']} {rec['display']} {rec['category']}")
        buckets[b] = buckets.get(b, 0.0) + rec["us"]
    ops = sorted(per_op.values(), key=lambda o: -o["us"])
    return {"buckets_us": buckets, "top_ops": ops[:25],
            "planes": plane_names}


def main() -> None:
    import jax
    import numpy as np

    # HGT_ATTR_PLATFORM=cpu lets the parse path be smoke-tested without
    # the chip (the sitecustomize pins JAX_PLATFORMS=axon globally)
    platform = os.environ.get("HGT_ATTR_PLATFORM")
    if platform:
        jax.config.update("jax_platforms", platform)

    cache_dir = os.path.join(ROOT, ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    encoder = sys.argv[1] if len(sys.argv) > 1 else "HGT"
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 8

    import bench_encoders as be

    tasks, batches = be.build_workload()

    # replicate bench_encoders.bench_encoder but keep the step fn around
    from analysisgnn_tpu.core.graph import NOTE, metadata
    from analysisgnn_tpu.models.analysis import AnalysisGNN
    from analysisgnn_tpu.train.schedules import warmup_cosine_schedule
    from analysisgnn_tpu.train.state import create_train_state, make_optimizer
    from analysisgnn_tpu.train.step import StepConfig, make_train_step

    nodes, edges_meta = metadata(True, True)
    enc, _, variant = encoder.lower().partition("-")
    # "<enc>-edge" / "<enc>-edgezxp" select the fused-SAGE conv_impl
    # (models/fused.py), same arm grammar as scripts/bench_encoders.py
    conv_impl = "node"
    if variant in ("edge", "edgezxp"):
        conv_impl = {"edge": "edge", "edgezxp": "edge-zxp"}[variant]
        variant = ""
    # "HGT-bf16st" / "HGT-emax-bf16st": bf16 q/k/v staging (HGTLayer),
    # same arm grammar as scripts/bench_encoders.py
    stage_dtype = "float32"
    if variant.endswith("bf16st"):
        stage_dtype = "bfloat16"
        variant = variant[: -len("bf16st")].strip("-")
    model = AnalysisGNN(
        metadata=(nodes, edges_meta), in_channels=25, hidden_channels=256,
        out_channels=128, task_dict=tasks, num_layers=3, dropout=0.3,
        encoder_type=enc,
        hgt_group_mode=(variant.split("-")[0] or "pair"),
        use_pallas=variant.endswith("pallas"),
        conv_impl=conv_impl,
        hgt_stage_dtype=stage_dtype,
    )
    batch = batches[0]
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
        mt_strategy="wloss",
    )
    train_step = make_train_step(model, opt, step_cfg)

    state, aux = train_step(state, batches[0])
    _ = float(aux["total_loss"])

    logdir = f"/tmp/hgt_trace/{encoder.lower()}"
    os.makedirs(logdir, exist_ok=True)
    t0 = time.perf_counter()
    with jax.profiler.trace(logdir):
        for i in range(steps):
            state, aux = train_step(state, batches[i % len(batches)])
        _ = float(aux["total_loss"])
    dt = time.perf_counter() - t0
    ms_per_step = dt / steps * 1e3
    print(f"[trace] {encoder}: {ms_per_step:.1f} ms/step over {steps} steps",
          file=sys.stderr, flush=True)

    xplanes = sorted(glob.glob(
        os.path.join(logdir, "plugins/profile/*/*.xplane.pb")
    ))
    if not xplanes:
        print(json.dumps({"error": "no xplane.pb produced", "logdir": logdir}))
        return
    xplane = xplanes[-1]

    result = {"encoder": encoder, "steps": steps,
              "ms_per_step": round(ms_per_step, 2), "xplane": xplane}
    parsed = None
    try:
        parsed = parse_xplane(xplane)
        result["planes"] = parsed["planes"]
    except Exception as e:  # noqa: BLE001 — report honestly, keep raw trace
        print(f"[trace] xplane parse failed: {e}", file=sys.stderr)
        result["parse_error"] = str(e)[:300]
    if parsed:
        total_us = sum(parsed["buckets_us"].values())
        device_ms_per_step = total_us / 1e3 / steps
        result["buckets_us"] = {
            k: round(v, 1) for k, v in sorted(
                parsed["buckets_us"].items(), key=lambda kv: -kv[1]
            )
        }
        result["bucket_pct"] = {
            k: round(100 * v / total_us, 1)
            for k, v in result["buckets_us"].items()
        }
        result["device_ms_per_step"] = round(device_ms_per_step, 2)
        result["dispatch_gap_ms_per_step"] = round(
            ms_per_step - device_ms_per_step, 2
        )
        result["top_ops"] = parsed["top_ops"][:15]
    out_path = os.path.join(ROOT, "bench_queue", "hgt_trace.json")
    existing = {}
    if os.path.exists(out_path):
        with open(out_path) as f:
            existing = json.load(f)
    existing[encoder] = result
    with open(out_path, "w") as f:
        json.dump(existing, f, indent=1)
    print(json.dumps({k: v for k, v in result.items() if k != "top_ops"}))


if __name__ == "__main__":
    main()
