"""Score-level inference: full-graph forward, onset-wise aggregation, exports.

Pipeline parity with the reference predict path (``ContinualAnalysisGNN.
predict``, analysisgnn/models/analysis.py:1497-1593, and the CLI
inference/predict_analysis.py): score file → note array → voice features →
score graph (with beats+measures) → whole-graph model forward → softmax →
onset-wise RNA aggregation and change-point smoothing
(``onsetwise_logit_aggregation``, models/analysis.py:44-101) → decoded labels
→ CSV / Roman-numeral MusicXML exports (predict_analysis.py:215-298).
"""

from __future__ import annotations

import csv
import os
from typing import Dict, Optional, Sequence, Tuple

import numpy as np

from analysisgnn_tpu.core.graph import HeteroGraph, NOTE
from analysisgnn_tpu.data.features import select_features
from analysisgnn_tpu.data.graph_build import build_score_graph
from analysisgnn_tpu.theory.encoders import KeySignatureEncoder, PitchEncoder
from analysisgnn_tpu.theory.vocab import available_representations

RNA_KEYS = ("quality", "inversion", "degree1", "degree2")


def bucket_capacity(n: int, factor: float = 1.25, base: int = 64) -> int:
    """Round ``n`` up the geometric capacity ladder ``base·factor^k``.

    Full-graph inference pads every score to a ladder rung so a corpus of
    arbitrary-length scores triggers only O(log N / log factor) distinct
    XLA compiles instead of one per score (the serving analog of the
    training sampler's static capacities)."""
    if factor <= 1.0:
        raise ValueError(f"bucket factor must be > 1, got {factor}")
    cap = base
    while cap < n:
        cap = int(np.ceil(cap * factor))
    return cap


def graph_from_note_array(
    note_array: np.ndarray,
    measures: Optional[np.ndarray] = None,
    feature_type: str = "voice",
    add_beats: bool = True,
    add_measures: bool = True,
    bucket_factor: Optional[float] = None,
) -> HeteroGraph:
    feats = select_features(note_array, feature_type)
    g = build_score_graph(
        note_array, measures=measures, add_beats=add_beats, add_measures=add_measures
    )
    features = {NOTE: feats}
    if add_beats:
        features["beat"] = np.zeros((max(g.num_beats, 1), feats.shape[1]), np.float32)
    if add_measures:
        features["measure"] = np.zeros(
            (max(g.num_measures, 1), feats.shape[1]), np.float32
        )
    attrs = {
        "pitch_spelling": PitchEncoder().encode(note_array).astype(np.int64),
        "key_signature": KeySignatureEncoder().encode(note_array).astype(np.int64),
        "onset_div": note_array["onset_div"].astype(np.int64),
    }
    node_capacity = edge_capacity = None
    if bucket_factor and bucket_factor > 1.0:
        node_capacity = {
            t: bucket_capacity(x.shape[0], bucket_factor) for t, x in features.items()
        }
        edge_capacity = {
            et: bucket_capacity(ei.shape[1], bucket_factor)
            for et, ei in g.edges.items()
        }
    return HeteroGraph.from_numpy(
        features,
        g.edges,
        node_attrs={NOTE: attrs},
        num_target_nodes=len(note_array),
        node_capacity=node_capacity,
        edge_capacity=edge_capacity,
    )


# jitted-forward cache so repeated predict_score calls (batch/serving mode)
# reuse the traced+compiled program for every score that lands in the same
# capacity bucket; keyed by model identity (kept alive via the stored ref).
_APPLY_CACHE: Dict[int, Tuple[object, object]] = {}


def _jitted_apply(model):
    import jax

    hit = _APPLY_CACHE.get(id(model))
    if hit is not None and hit[0] is model:
        return hit[1]
    fn = jax.jit(model.apply)
    _APPLY_CACHE[id(model)] = (model, fn)
    return fn


_DECODE_CACHE: Dict[int, Tuple[object, object]] = {}


def _jitted_decode(model):
    """Device-side decode: forward + softmax + onset scatter-mean + argmax.

    The CSV / Roman-numeral exports only consume class ids, yet the probs
    path ships every head's full ``[N, C]`` probabilities to the host
    (~24 MB for a 10 K-note score across the 21 tasks) — on a slow
    host↔device link that transfer dominates end-to-end serving latency
    (bench_inference.json: 24 ms forward vs 8 s host decode on the tunnel).
    This program keeps the reference decode semantics
    (softmax → onset-edge mean-with-self → representative-row argmax;
    reference ``onsetwise_logit_aggregation`` models/analysis.py:44-101) on
    device and fetches ONE stacked ``[T, N]`` int32 array instead.
    The data-dependent change-point smoothing stays host-side but operates
    on ids only (see ``predict_score_ids``)."""
    import jax
    import jax.numpy as jnp

    hit = _DECODE_CACHE.get(id(model))
    if hit is not None and hit[0] is model:
        return hit[1]

    def decode(params, x_dict, edge_index_dict, batch, ps, ks, ntn,
               rep_rows, n_valid):
        logits = model.apply(params, x_dict, edge_index_dict, batch, ps, ks, ntn)
        onset = edge_index_dict[(NOTE, "onset", NOTE)]
        return _ids_from_logits(logits, onset, rep_rows, n_valid)

    fn = jax.jit(decode)
    _DECODE_CACHE[id(model)] = (model, fn)
    return fn


def _ids_from_logits(logits, onset, rep_rows, n_valid):
    """Device decode core (traced under jit): softmax + onset-edge
    mean-with-self + representative-row argmax for the RNA keys, plain
    argmax for every other head; returns ``[T, N]`` int32 stacked in
    sorted-key order."""
    import jax
    import jax.numpy as jnp

    keys = sorted(logits.keys())
    n_cap = logits[keys[0]].shape[0]
    src, dst = onset[0], onset[1]
    # padding edges point one past the padded node array (core/graph.py),
    # so a single `< n_valid` test drops both padding and out-of-score rows
    valid_e = (src != dst) & (src < n_valid) & (dst < n_valid)
    if "tpc_in_label" in logits:
        m = jnp.argmax(logits["tpc_in_label"], axis=-1).astype(bool)
        cs = jnp.clip(src, 0, n_cap - 1)
        cd = jnp.clip(dst, 0, n_cap - 1)
        valid_e = valid_e & m[cs] & m[cd]
    srcc = jnp.where(valid_e, src, 0)
    dstc = jnp.where(valid_e, dst, 0)
    cnt = 1.0 + jax.ops.segment_sum(
        valid_e.astype(jnp.float32), dstc, num_segments=n_cap
    )
    ids = {}
    for k in keys:
        if k in RNA_KEYS:
            p = jax.nn.softmax(logits[k].astype(jnp.float32), axis=-1)
            msg = jnp.where(valid_e[:, None], p[srcc], 0.0)
            acc = p + jax.ops.segment_sum(msg, dstc, num_segments=n_cap)
            rep = (acc / cnt[:, None])[rep_rows]
            ids[k] = jnp.argmax(rep, axis=-1).astype(jnp.int32)
        else:
            ids[k] = jnp.argmax(logits[k], axis=-1).astype(jnp.int32)
    return jnp.stack([ids[k] for k in keys])


def _rep_rows_and_grid(note_array: np.ndarray):
    """Host-side onset grid: representative note per unique onset."""
    onsets = note_array["onset_div"] - note_array["onset_div"].min()
    order = np.argsort(onsets, kind="stable")
    uniq, first_idx = np.unique(onsets[order], return_index=True)
    return onsets, uniq, order[first_idx].astype(np.int32)


def _smooth_ids_host(
    stacked: np.ndarray,
    keys: Sequence[str],
    note_array: np.ndarray,
    uniq: np.ndarray,
    onsets: np.ndarray,
    u: int,
    n: int,
    tasks: Optional[Sequence[str]],
) -> Dict[str, np.ndarray]:
    """Host change-point smoothing on per-onset ids (RNA keys) and slicing
    for the rest — identical to onsetwise_smooth followed by argmax (the
    representative row's argmax IS the segment's prediction)."""
    out: Dict[str, np.ndarray] = {}
    note_onset_idx = np.searchsorted(uniq, onsets)
    for i, k in enumerate(keys):
        if tasks and k not in tasks:
            continue
        if k in RNA_KEYS:
            preds = stacked[i][:u]
            change = np.r_[0, np.flatnonzero(preds[1:] != preds[:-1]) + 1]
            seg_of_onset = np.searchsorted(uniq[change], uniq, side="right") - 1
            out[k] = preds[change][seg_of_onset][note_onset_idx]
        else:
            out[k] = stacked[i][:n]
    return out


def predict_score_ids(
    model,
    params,
    note_array: np.ndarray,
    measures: Optional[np.ndarray] = None,
    tasks: Optional[Sequence[str]] = None,
    feature_type: str = "voice",
    add_beats: bool = True,
    add_measures: bool = True,
    bucket_factor: Optional[float] = None,
) -> Dict[str, np.ndarray]:
    """Fast serving path: per-note predicted class ids (what the CSV /
    MusicXML exports consume), with the softmax + onset-wise RNA
    aggregation computed ON DEVICE and only ``[T, N]`` int32 ids fetched.

    Prediction-equivalent to ``argmax(predict_score(...))``
    (tests/test_inference_cli.py); use ``predict_score`` when full
    per-class probabilities are required."""
    import jax.numpy as jnp

    graph = graph_from_note_array(
        note_array, measures, feature_type, add_beats, add_measures,
        bucket_factor=bucket_factor,
    )
    n = len(note_array)
    cap = graph.capacity(NOTE)
    # one representative note per unique onset (host-side, cheap): the
    # smoothing grid of the reference aggregation
    onsets, uniq, rep_rows = _rep_rows_and_grid(note_array)
    u = len(uniq)
    rep_padded = np.zeros(cap, np.int32)
    rep_padded[:u] = rep_rows

    attrs = graph.node_attrs[NOTE]
    stacked = _jitted_decode(model)(
        params,
        graph.x_dict(),
        graph.edge_index_dict(),
        graph.batch,
        attrs["pitch_spelling"],
        attrs["key_signature"],
        graph.num_target_nodes,
        jnp.asarray(rep_padded),
        jnp.int32(n),
    )
    keys = sorted(t for t, _ in model.task_dict)
    stacked = np.asarray(stacked)  # ONE [T, N_cap] int32 host transfer
    return _smooth_ids_host(stacked, keys, note_array, uniq, onsets, u, n, tasks)


def onsetwise_smooth(
    probs: Dict[str, np.ndarray],
    onset_edges: np.ndarray,
    onset_div: np.ndarray,
    rna_keys: Sequence[str] = RNA_KEYS,
    tpc_in_label_mask: Optional[np.ndarray] = None,
) -> Dict[str, np.ndarray]:
    """Onset-wise aggregation + change-point smoothing of RNA probabilities
    (reference onsetwise_logit_aggregation, models/analysis.py:44-101)."""
    out = dict(probs)
    if not all(k in probs for k in rna_keys):
        return out
    n = len(onset_div)
    src, dst = onset_edges[0], onset_edges[1]
    keep = (src != dst) & (src < n) & (dst < n)
    src, dst = src[keep], dst[keep]
    if tpc_in_label_mask is not None:
        m = tpc_in_label_mask.astype(bool)
        e = m[src] & m[dst]
        src, dst = src[e], dst[e]

    def softmax(x):
        x = x - x.max(-1, keepdims=True)
        e = np.exp(x)
        return e / e.sum(-1, keepdims=True)

    for k in rna_keys:
        v = probs[k]
        # (self + Σ neighbors) / count — torch_scatter mean-with-out semantics
        acc = v.copy()
        np.add.at(acc, dst, v[src])
        counts = np.ones(n)
        np.add.at(counts, dst, np.ones(len(dst)))
        out[k] = softmax(acc / counts[:, None])

    # change-point smoothing on the onset grid
    onsets = onset_div - onset_div.min()
    order = np.argsort(onsets, kind="stable")
    uniq, first_idx = np.unique(onsets[order], return_index=True)
    rep_rows = order[first_idx]  # one representative note per onset
    for k in rna_keys:
        preds = out[k][rep_rows].argmax(-1)
        change = np.r_[0, np.flatnonzero(preds[1:] != preds[:-1]) + 1]
        seg_of_onset = np.searchsorted(uniq[change], uniq, side="right") - 1
        seg_rows = rep_rows[change]
        note_onset_idx = np.searchsorted(uniq, onsets)
        out[k] = out[k][seg_rows[seg_of_onset]][note_onset_idx]
    return out


def predict_score(
    model,
    params,
    note_array: np.ndarray,
    measures: Optional[np.ndarray] = None,
    tasks: Optional[Sequence[str]] = None,
    feature_type: str = "voice",
    add_beats: bool = True,
    add_measures: bool = True,
    bucket_factor: Optional[float] = None,
) -> Dict[str, np.ndarray]:
    """Run the full-graph forward and return per-note class probabilities.

    ``bucket_factor`` pads the graph to a geometric capacity ladder so many
    scores share one compiled program (see ``bucket_capacity``)."""
    graph = graph_from_note_array(
        note_array, measures, feature_type, add_beats, add_measures,
        bucket_factor=bucket_factor,
    )
    n_valid = len(note_array)
    attrs = graph.node_attrs[NOTE]
    logits = _jitted_apply(model)(
        params,
        graph.x_dict(),
        graph.edge_index_dict(),
        graph.batch,
        attrs["pitch_spelling"],
        attrs["key_signature"],
        graph.num_target_nodes,
    )
    # drop padded rows before the host softmax/decodes
    logits = {k: v[:n_valid] for k, v in logits.items()}
    onset_edges = np.asarray(graph.edges((NOTE, "onset", NOTE)))
    ne = int(graph.num_edges["note__onset__note"])
    return _logits_to_probs(logits, note_array, onset_edges[:, :ne], tasks)


def _np_softmax(x):
    # numpy softmax: per-task jax.nn.softmax would trigger one small XLA
    # compile per task shape (~21 compiles, seconds of host latency on the
    # one-score predict path) for work that is trivially host-side
    x = np.asarray(x, np.float64)
    x = x - x.max(-1, keepdims=True)
    e = np.exp(x)
    return e / e.sum(-1, keepdims=True)


def _logits_to_probs(
    logits: Dict[str, "np.ndarray"],
    note_array: np.ndarray,
    onset_edges: np.ndarray,
    tasks: Optional[Sequence[str]],
) -> Dict[str, np.ndarray]:
    # the RNA smoothing uses the tpc mask even when that task isn't requested
    tpc_mask = (
        np.asarray(logits["tpc_in_label"]).argmax(-1)
        if "tpc_in_label" in logits
        else None
    )
    if tasks:
        # filter BEFORE the host transfer + softmax: a task subset on a long
        # score should not materialize all 21 heads' float64 probabilities
        logits = {k: v for k, v in logits.items() if k in tasks}
    probs = {k: _np_softmax(v) for k, v in logits.items()}
    return onsetwise_smooth(
        probs, onset_edges, note_array["onset_div"], tpc_in_label_mask=tpc_mask
    )


def predict_score_partitioned(
    model,
    params,
    note_array: np.ndarray,
    num_devices: Optional[int] = None,
    tasks: Optional[Sequence[str]] = None,
    feature_type: str = "voice",
    mesh=None,
    ids_only: bool = False,
) -> Dict[str, np.ndarray]:
    """Long-score serving: the full-graph encode partitioned over the device
    mesh (overlap-region regime of ``distributed/partition_encoder.py`` —
    exact vs the single-device forward), task heads + host decode on the
    gathered owned embeddings.

    This is the serving path for scores whose full graph exceeds one chip's
    HBM — the TPU analog of the reference's test-time near-full-graph
    evaluation (datamodules/analysis.py:310-324) scaled past one device.
    Covers note-node models (the reference flagship config); beat/measure
    node types are host-attached per shard, so configs needing them should
    use ``predict_score``.
    """
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from analysisgnn_tpu.distributed.partition_encoder import (
        make_partitioned_encode,
        partition_full_graph,
        unpartition,
    )

    feats = select_features(note_array, feature_type).astype(np.float32)
    g = build_score_graph(note_array, add_beats=False, add_measures=False)
    edges = {et: np.asarray(ei) for et, ei in g.edges.items()}
    ps = PitchEncoder().encode(note_array).astype(np.int32)
    ks = KeySignatureEncoder().encode(note_array).astype(np.int32)

    if mesh is None:
        devs = jax.devices()
        d = num_devices or len(devs)
        mesh = Mesh(np.array(devs[:d]), ("graph",))
    d = mesh.devices.size
    # restored checkpoints arrive committed to one device; replicate over
    # the mesh so the shard_map accepts them
    from jax.sharding import NamedSharding, PartitionSpec

    params = jax.device_put(params, NamedSharding(mesh, PartitionSpec()))
    # receptive field: GNN layers + final conv + onset pooling
    part = partition_full_graph(
        feats, ps, ks, edges, num_devices=d,
        num_message_hops=model.num_layers + 2,
    )
    encode_fn = make_partitioned_encode(model, mesh)
    with mesh:
        emb = unpartition(encode_fn(params, part), part)
    onset_key = (NOTE, "onset", NOTE)
    if ids_only:
        # ids-only decode on device (see predict_score_ids): classify +
        # softmax + onset aggregation + argmax, ONE [T, N] int32 fetch
        n = len(note_array)
        onsets, uniq, rep_rows = _rep_rows_and_grid(note_array)
        u = len(uniq)
        rep_padded = np.zeros(n, np.int32)
        rep_padded[:u] = rep_rows

        def _classify_decode(p, x, onset, rep, n_valid):
            logits = model.apply(p, x, method=model.classify)
            return _ids_from_logits(logits, onset, rep, n_valid)

        stacked = np.asarray(jax.jit(_classify_decode)(
            params, jnp.asarray(emb), jnp.asarray(edges[onset_key]),
            jnp.asarray(rep_padded), jnp.int32(n),
        ))
        keys = sorted(t for t, _ in model.task_dict)
        return _smooth_ids_host(stacked, keys, note_array, uniq, onsets, u, n, tasks)
    logits = jax.jit(
        lambda p, x: model.apply(p, x, method=model.classify)
    )(params, jnp.asarray(emb))
    logits = {k: np.asarray(v) for k, v in logits.items()}
    return _logits_to_probs(logits, note_array, edges[onset_key], tasks)


def decode_predictions(
    probs: Dict[str, np.ndarray]
) -> Dict[str, list]:
    """Class-id → label decoding via the task vocabularies (reference
    predict_step, models/analysis.py:1302-1305)."""
    reps = available_representations()
    out = {}
    for task, p in probs.items():
        p = np.asarray(p)
        # accepts either [N, C] probabilities or already-argmaxed [N] ids
        # (the fast predict_score_ids path)
        ids = p.argmax(-1) if p.ndim > 1 else p
        if task in reps:
            out[task] = reps[task].decode(ids)
        else:
            out[task] = ids.tolist()
    return out


def export_predictions_csv(
    path: str,
    note_array: np.ndarray,
    decoded: Dict[str, list],
) -> None:
    """Per-note CSV export (reference predict_analysis.py:215-222)."""
    tasks = sorted(decoded.keys())
    with open(path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["onset_div", "onset_beat", "pitch"] + tasks)
        for i in range(len(note_array)):
            w.writerow(
                [
                    int(note_array["onset_div"][i]),
                    float(note_array["onset_beat"][i]),
                    int(note_array["pitch"][i]),
                ]
                + [decoded[t][i] for t in tasks]
            )


def _roman_numeral_strings(decoded: Dict[str, list], note_array: np.ndarray):
    """One (onset_div, rn_text) per unique onset where the numeral changes."""
    onsets = note_array["onset_div"]
    uniq, first = np.unique(onsets, return_index=True)
    rn = decoded.get("romanNumeral")
    key = decoded.get("localkey")
    out = []
    prev = None
    for o, i in zip(uniq, first):
        label = str(rn[i]) if rn else ""
        if key:
            label = f"{key[i]}:{label}"
        if label != prev:
            out.append((int(o), label))
            prev = label
    return out


def export_roman_numerals_to_musicxml(
    path: str,
    note_array: np.ndarray,
    decoded: Dict[str, list],
    divisions: int = 4,
) -> None:
    """Write a MusicXML file with an "RNA" annotation part: one
    percussion-clef staff whose notes carry the Roman-numeral labels as
    lyrics at each harmony change (reference
    export_roman_numerals_to_musicxml, predict_analysis.py:225-298)."""
    changes = _roman_numeral_strings(decoded, note_array)
    total = int((note_array["onset_div"] + note_array["duration_div"]).max())
    parts = []
    parts.append('<?xml version="1.0" encoding="UTF-8"?>')
    parts.append('<score-partwise version="3.1">')
    parts.append(
        '<part-list><score-part id="RNA"><part-name>RNA</part-name></score-part></part-list>'
    )
    parts.append('<part id="RNA">')
    ts_beats = int(note_array["ts_beats"][0])
    measure_len = ts_beats * divisions
    n_measures = max((total + measure_len - 1) // measure_len, 1)
    ci = 0
    for m in range(n_measures):
        m_start = m * measure_len
        parts.append(f'<measure number="{m + 1}">')
        if m == 0:
            parts.append(
                f"<attributes><divisions>{divisions}</divisions>"
                f"<time><beats>{ts_beats}</beats><beat-type>4</beat-type></time>"
                "<clef><sign>percussion</sign></clef></attributes>"
            )
        cursor = m_start
        while ci < len(changes) and changes[ci][0] < m_start + measure_len:
            onset, label = changes[ci]
            if onset > cursor:
                parts.append(
                    f"<note><rest/><duration>{onset - cursor}</duration></note>"
                )
                cursor = onset
            nxt = (
                changes[ci + 1][0]
                if ci + 1 < len(changes)
                else total
            )
            dur = max(min(nxt, m_start + measure_len) - cursor, 1)
            parts.append(
                "<note><unpitched><display-step>E</display-step>"
                "<display-octave>4</display-octave></unpitched>"
                f"<duration>{dur}</duration>"
                f"<lyric><text>{label}</text></lyric></note>"
            )
            cursor += dur
            if cursor >= m_start + measure_len:
                break
            ci += 1
        if cursor < m_start + measure_len:
            parts.append(
                f"<note><rest/><duration>{m_start + measure_len - cursor}</duration></note>"
            )
        parts.append("</measure>")
        while ci < len(changes) and changes[ci][0] < m_start + measure_len:
            ci += 1
    parts.append("</part></score-partwise>")
    with open(path, "w") as f:
        f.write("\n".join(parts))
