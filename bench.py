"""Benchmark: hetero message-passing training throughput on one chip.

Measures end-to-end jitted train-step throughput (forward + backward + AdamW)
of the flagship HybridGNN multi-task configuration over sampled score
subgraphs, reported as **edges per second per chip** — the BASELINE.json
north-star metric for the hetero SpMM path.

``vs_baseline`` is the speedup over the measured reference-equivalent torch
implementation of the SAME workload on this host's CPU
(scripts/bench_torch_reference.py → bench_baseline.json; the reference repo
publishes no numbers of its own — BASELINE.md).  Falls back to a nominal
1 GEdge/s speed-of-light anchor when the baseline file is absent.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

``--sustained`` additionally times the ACTUAL training regime — fresh
batches flowing through the production prefetch pipeline (sampler worker
pool feeding device steps) instead of re-dispatching the same staged
batches — and reports it on stderr (VERDICT r2 weak #4).  The staged
number stays the headline for cross-round continuity.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

_T0 = time.perf_counter()


def _phase(msg: str) -> None:
    print(f"[bench +{time.perf_counter() - _T0:7.1f}s] {msg}", file=sys.stderr, flush=True)

SPEED_OF_LIGHT_EDGES_PER_S = 1e9


def main() -> None:
    import os
    import threading

    import jax

    # Backend-init watchdog: when the tunnel TPU service is down,
    # jax.devices() blocks forever waiting to claim a chip — which would
    # hang the driver's round-end bench indefinitely.  Bound the wait and
    # exit loudly instead (no fake numbers).
    init_done = threading.Event()

    def _watchdog():
        if not init_done.wait(timeout=300):
            print(
                "[bench] FATAL: TPU backend failed to initialize within "
                "300 s (tunnel worker down?) — aborting without a result",
                file=sys.stderr, flush=True,
            )
            os._exit(17)

    threading.Thread(target=_watchdog, daemon=True).start()

    # persistent compilation cache: repeat runs skip the (minutes-long)
    # remote compile of the train step
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass
    _phase(f"devices: {jax.devices()}")
    init_done.set()

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

    tasks = tuple(TASK_DICT.items())

    # corpus: 8 synthetic polyphonic scores, ~2000 notes each — one per
    # batch slot: the sampler (graphmuse loader contract) yields one
    # subgraph per score per batch, so fewer scores than batch_size would
    # silently measure a smaller batch (round-5 finding: the old 4-score
    # corpus made every "batch of 8" a batch of 4 at 26% node occupancy)
    samples = []
    for s in range(8):
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

    # reference default scale: subgraph_size=500, neighbors [5,5].
    # Pallas conv path OFF: the late-round on-chip A/B (4 interleaved runs,
    # bench_queue/hybrid_ab.out) reads 28.1-28.5 ms/step XLA vs 30.8-32.1
    # with the Pallas fused aggregation on this tunnel runtime, reversing
    # the earlier mid-round reading — the XLA scatter path is the measured
    # production default; --use_pallas stays available as a flag.
    cfg = SamplerConfig(
        subgraph_size=500, batch_size=8, num_neighbors=(5, 5), seed=0,
        sort_edges_by_src=True,
    )
    _phase("corpus built")
    sampler = SubgraphSampler(samples, cfg)
    batch = sampler.sample_batch()

    nodes, edges_meta = metadata(True, True)
    model = AnalysisGNN(
        metadata=(nodes, edges_meta),
        in_channels=25,
        hidden_channels=256,
        out_channels=128,
        task_dict=tasks,
        num_layers=3,
        dropout=0.3,
        logit_fusion=False,
        encoder_type="hybridgnn",
        use_pallas=False,
    )
    attrs = batch.node_attrs[NOTE]
    args = (
        batch.x_dict(),
        batch.edge_index_dict(),
        batch.batch,
        attrs["pitch_spelling"],
        attrs["key_signature"],
        batch.num_target_nodes,
    )
    _phase("sampling done; init starting")
    params = model.init(jax.random.PRNGKey(0), *args)
    _phase("init done")
    opt = make_optimizer(warmup_cosine_schedule(5e-3, total_steps=1000))
    state = create_train_state(params, len(tasks), opt, jax.random.PRNGKey(1))
    step_cfg = StepConfig(
        task_dict=tasks,
        active_tasks=tuple(t for t, _ in tasks),
        mt_strategy="wloss",
    )
    # production ``--scan_steps`` path: K optimizer updates fused into one
    # device dispatch via lax.scan (bit-identical math to K sequential steps,
    # tests/test_train_step.py); amortizes per-dispatch latency.
    # scripts/bench_scan_ab.py A/Bs K on-chip (see docs/STATUS.md for the
    # reading on the shipped XLA path).
    K = 6
    train_step_multi = make_train_step_multi(model, opt, step_cfg)

    # the number of *valid* message edges processed per step (each of the 3
    # encoder layers + final conv touches every edge; count raw graph edges
    # once per step for an implementation-independent denominator)
    # Pre-sample batches on the host and STAGE THEM ON DEVICE, then dispatch
    # steps back-to-back — async dispatch pipelines host latency behind
    # device compute (the training loop overlaps uploads via prefetch, and
    # the tunnel transport here is far slower than a real host-TPU link);
    # the final scalar fetch forces completion.
    S = 24
    stacked = jax.device_put(
        stack_batches([sampler.sample_batch() for _ in range(K)])
    )
    jax.block_until_ready(stacked)
    # mean valid message edges per step over the K timed batches
    edges_per_batch = float(
        sum(np.asarray(v).mean() for v in stacked.num_edges.values())
    )

    _phase("batches staged; warmup starting")
    state, auxes = train_step_multi(state, stacked)
    _ = float(auxes["total_loss"][-1])
    _phase("warmup done")

    t0 = time.perf_counter()
    for _ in range(S // K):
        state, auxes = train_step_multi(state, stacked)
    _ = float(auxes["total_loss"][-1])  # forces the whole chain
    dt = time.perf_counter() - t0

    _phase(f"timed loop done dt={dt:.2f}s")
    edges_per_s = edges_per_batch * S / dt

    if "--sustained" in sys.argv:
        # the actual training regime: fresh sampler batches through the
        # MULTI-WORKER prefetch pool (the analog of the reference's
        # num_workers=5 DataLoader, train_analysisgnn.py:60), stacked in
        # K-packs, dispatched back-to-back.  Round 4 fed this from ONE
        # producer thread (prefetch_calls) and sustained 42% of staged;
        # host sampling is embarrassingly parallel across batches, so a
        # worker per spare core overlaps it with the device step.
        from analysisgnn_tpu.data.prefetch import prefetch_workers

        n_workers = max(2, min(4, (os.cpu_count() or 4) - 1))
        clones = sampler.spawn(n_workers)

        def _make_pack(s):
            return lambda: jax.device_put(
                stack_batches([s.sample_batch() for _ in range(K)])
            )

        S2 = 48
        packs = prefetch_workers(
            [_make_pack(s) for s in clones],
            steps=S2 // K + 1,
            buffer_size=2 * n_workers,
        )
        state, auxes = train_step_multi(state, next(packs))  # warm pipeline
        _ = float(auxes["total_loss"][-1])
        t0 = time.perf_counter()
        n_steps = 0
        for pack in packs:
            state, auxes = train_step_multi(state, pack)
            n_steps += K
            if n_steps >= S2:
                break
        _ = float(auxes["total_loss"][-1])
        dt2 = time.perf_counter() - t0
        sustained = edges_per_batch * n_steps / dt2
        _phase(
            f"sustained ({n_workers}-worker prefetch-fed fresh batches): "
            f"{sustained:,.0f} edges/s over {n_steps} steps "
            f"({dt2 / n_steps * 1e3:.1f} ms/step) vs staged "
            f"{edges_per_s:,.0f}"
        )
        # component breakdown: serialized cost of each pipeline stage on
        # this runtime, so the sustained/staged gap is attributed, not
        # guessed (VERDICT r4 ask #5).  The overlap floor for the pipeline
        # is max(device, upload) when sampling parallelizes across
        # n_workers — committed to bench_queue/sustained_breakdown.json.
        t0 = time.perf_counter()
        for _ in range(4):
            host_pack = stack_batches([sampler.sample_batch() for _ in range(K)])
        t_sample = (time.perf_counter() - t0) / (4 * K)
        t0 = time.perf_counter()
        for _ in range(4):
            dev_pack = jax.device_put(host_pack)
            jax.block_until_ready(dev_pack)
        t_upload = (time.perf_counter() - t0) / (4 * K)
        breakdown = {
            "staged_ms_per_step": round(dt / S * 1e3, 2),
            "sustained_ms_per_step": round(dt2 / n_steps * 1e3, 2),
            "sustained_edges_per_s": round(sustained, 1),
            "sustained_over_staged": round(sustained / edges_per_s, 4),
            "n_workers": n_workers,
            "host_sample_stack_ms_per_step": round(t_sample * 1e3, 2),
            "tunnel_upload_ms_per_step": round(t_upload * 1e3, 2),
            "pipeline_floor_ms_per_step": round(
                max(dt / S, t_upload, t_sample / n_workers) * 1e3, 2
            ),
            # this runtime's tunnel transport serializes the host->device
            # copy with device execution (no separate copy engine through
            # the proxied link), so the achievable floor here is
            # upload + device, with sampling overlapped by the workers
            "no_overlap_floor_ms_per_step": round(
                (dt / S + t_upload) * 1e3, 2
            ),
            # on a real PCIe/ICI-attached host the same batch uploads in
            # ~1 ms (tens of MB at >=16 GB/s) and overlaps compute, so
            # sustained ~= staged (floor = max(device, sampling/workers))
            "pcie_projection_ms_per_step": round(
                max(dt / S, t_sample / n_workers) * 1e3, 2
            ),
            "note": "floor = max(device step, serialized upload, sampling/"
                    "n_workers): uploads serialize on the single tunnel "
                    "link, sampling parallelizes across workers",
        }
        bq = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "bench_queue")
        os.makedirs(bq, exist_ok=True)
        with open(os.path.join(bq, "sustained_breakdown.json"), "w") as f:
            json.dump(breakdown, f, indent=1)
        _phase(f"breakdown: {json.dumps(breakdown)}")
    baseline_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "bench_baseline.json"
    )
    if os.path.exists(baseline_path):
        with open(baseline_path) as f:
            baseline = json.load(f)["edges_per_s"]
    else:
        baseline = SPEED_OF_LIGHT_EDGES_PER_S
    print(
        json.dumps(
            {
                "metric": "hetero_train_edges_per_s_per_chip",
                "value": round(edges_per_s, 1),
                "unit": "edges/s",
                "vs_baseline": round(edges_per_s / baseline, 4),
            }
        )
    )


def _run_with_retry() -> None:
    """The tunnel TPU worker intermittently crashes/restarts mid-program
    (jax UNAVAILABLE: "TPU worker process crashed or restarted"); the PJRT
    client cannot recover in-process, but the restarted worker serves a
    fresh process fine.  Re-exec ourselves up to 2 times on that failure so
    one flaky worker restart doesn't sink the benchmark run."""
    import os
    import sys

    try:
        main()
    except Exception as e:  # noqa: BLE001 — inspect and re-raise below
        attempt = int(os.environ.get("BENCH_RETRY", "0"))
        msg = str(e)
        if ("UNAVAILABLE" in msg or "crashed or restarted" in msg) and attempt < 2:
            print(
                f"[bench] TPU worker crashed (attempt {attempt}); re-executing",
                file=sys.stderr, flush=True,
            )
            env = dict(os.environ, BENCH_RETRY=str(attempt + 1))
            os.execve(sys.executable, [sys.executable] + sys.argv, env)
        raise


if __name__ == "__main__":
    _run_with_retry()
