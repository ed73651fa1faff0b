"""Vectorized note-feature descriptors.

Re-specifications of the reference feature sets
(analysisgnn/descriptors/utils/note_features.py) as numpy vector code — the
reference computes several of them with per-note Python loops that are
O(N²)-ish per score (note_features.py:139-165); here everything is group-wise
over unique onsets.

Feature sets (selected via :func:`select_features`, mirroring
analysisgnn/descriptors/general.py:128-139):

``voice`` (23-dim, the default "simple" input, note_features.py:176-226):
    [1 - tanh(duration_beat / ts_beats),
     (onset_beat mod ts_beats) / ts_beats,
     is_downbeat(onset_beat mod 1 == 0),
     12-dim pitch-class one-hot,
     10-dim octave one-hot]

``chord`` (for the chord stack, note_features.py:229-309) and the interval
vector/chord template block shared with the cadence set.
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np

# Interval-vector templates of common chord qualities
# (reference note_features.py:8-27).
CHORD_TEMPLATES: Tuple[Tuple[str, Tuple[int, ...]], ...] = (
    ("M/m", (0, 0, 1, 1, 1, 0)),
    ("sus4", (0, 1, 0, 0, 2, 0)),
    ("M7", (0, 1, 2, 1, 1, 1)),
    ("M7wo5", (0, 1, 0, 1, 0, 1)),
    ("Mmaj7", (1, 0, 1, 2, 2, 0)),
    ("Mmaj7maj9", (1, 2, 2, 2, 3, 0)),
    ("M9", (1, 1, 4, 1, 1, 2)),
    ("M9wo5", (1, 1, 2, 1, 0, 1)),
    ("m7", (0, 1, 2, 1, 2, 0)),
    ("m7wo5", (0, 1, 1, 0, 1, 0)),
    ("m9", (1, 2, 2, 2, 3, 0)),
    ("m9wo5", (1, 2, 1, 1, 1, 0)),
    ("m9wo7", (1, 1, 1, 1, 2, 0)),
    ("mmaj7", (1, 0, 1, 3, 1, 0)),
    ("Maug", (0, 0, 0, 3, 0, 0)),
    ("Maug7", (1, 0, 1, 3, 1, 0)),
    ("mdim", (0, 0, 2, 0, 0, 1)),
    ("mdim7", (0, 0, 4, 0, 0, 2)),
)


def pc_one_hot(pitch: np.ndarray) -> np.ndarray:
    out = np.zeros((len(pitch), 12), np.float32)
    out[np.arange(len(pitch)), np.remainder(pitch, 12)] = 1.0
    return out


def octave_one_hot(pitch: np.ndarray) -> np.ndarray:
    out = np.zeros((len(pitch), 10), np.float32)
    out[np.arange(len(pitch)), np.clip(pitch // 12, 0, 9)] = 1.0
    return out


def voice_features(note_array: np.ndarray) -> np.ndarray:
    """The 23-dim "voice" input feature block (reference :217-226)."""
    dur = np.asarray(note_array["duration_beat"], np.float64)
    onset = np.asarray(note_array["onset_beat"], np.float64)
    ts = np.asarray(note_array["ts_beats"], np.float64)
    pitch = np.asarray(note_array["pitch"], np.int64)
    duration_feature = (1.0 - np.tanh(dur / ts))[:, None]
    onset_feature = (np.remainder(onset, ts) / ts)[:, None]
    is_down_beat = (np.remainder(onset, 1) == 0)[:, None]
    return np.hstack(
        [duration_feature, onset_feature, is_down_beat, pc_one_hot(pitch), octave_one_hot(pitch)]
    ).astype(np.float32)


def _interval_vector(pcs: np.ndarray) -> np.ndarray:
    """6-entry interval vector of a pitch-class set (vectorized)."""
    iv = np.zeros(6, np.int64)
    pcs = np.unique(pcs % 12)
    if len(pcs) < 2:
        return iv
    diffs = np.abs(pcs[:, None] - pcs[None, :])[np.triu_indices(len(pcs), 1)]
    diffs = np.where(diffs > 6, 12 - diffs, diffs)
    diffs = diffs[diffs != 0]
    np.add.at(iv, diffs - 1, 1)
    return iv


_MAJ_SETS = ([0, 4, 7], [0, 5, 9], [0, 3, 8])
_MIN_SETS = ([0, 3, 7], [0, 5, 8], [0, 4, 9])


def chord_context_features(note_array: np.ndarray) -> Tuple[np.ndarray, List[str]]:
    """Per-note chord-context block (interval vector, consecutive-interval
    flags, chord templates, triad/pedal/voicing flags) — semantics of
    reference ``get_voice_separation_features``'s companion block
    (note_features.py:139-165/278-306), computed group-wise per unique onset.
    """
    onset = np.asarray(note_array["onset_beat"], np.float64)
    dur = np.asarray(note_array["duration_beat"], np.float64)
    ts = np.asarray(note_array["ts_beats"], np.float64)
    pitch = np.asarray(note_array["pitch"], np.int64)
    n = len(note_array)
    names = (
        [f"int_vec{i}" for i in range(1, 7)]
        + [f"interval{i}" for i in range(13)]
        + [k for k, _ in CHORD_TEMPLATES]
        + [
            "is_maj_triad",
            "is_pmaj_triad",
            "is_min_triad",
            "ped_note",
            "hv_7",
            "hv_5",
            "hv_3",
            "hv_1",
            "chord_has_2m",
            "chord_has_2M",
        ]
    )
    out = np.zeros((n, len(names)), np.float32)
    ends = onset + dur
    order = np.argsort(onset, kind="stable")
    uniq, inverse = np.unique(onset, return_inverse=True)
    for u_idx, u in enumerate(uniq):
        members = np.flatnonzero(inverse == u_idx)
        sounding = np.flatnonzero((onset < u) & (ends > u))
        chord_pitch = np.concatenate([pitch[members], pitch[sounding]])
        cons = np.flatnonzero(ends == u)  # notes ending exactly here
        iv = _interval_vector(chord_pitch)
        pcs = np.unique(chord_pitch % 12)
        pc_rec = sorted((pcs - pcs.min()).tolist()) if len(pcs) else []
        tmpl = np.array([1.0 if tuple(iv) == t else 0.0 for _, t in CHORD_TEMPLATES])
        is_mm = tmpl[0] > 0
        is_maj = 1.0 if is_mm and pc_rec in [list(s) for s in _MAJ_SETS] else 0.0
        is_min = 1.0 if is_mm and pc_rec in [list(s) for s in _MIN_SETS] else 0.0
        rel = (chord_pitch - chord_pitch.min()) % 12
        is_pmaj = 1.0 if is_maj and 4 in rel and 7 in rel else 0.0
        span = (chord_pitch.max() - chord_pitch.min()) % 12
        hv7 = 1.0 if span == 10 else 0.0
        hv5 = 1.0 if span == 7 else 0.0
        hv3 = 1.0 if span in (3, 4) else 0.0
        hv1 = 1.0 if span == 0 and chord_pitch.max() != chord_pitch.min() else 0.0
        for i in members:
            ped = 1.0 if dur[i] > ts[i] else 0.0
            d = pitch[i] - chord_pitch.min()
            has2m = 1.0 if d in (1, -1) else 0.0
            has2M = 1.0 if d in (2, -2) else 0.0
            if cons.size:
                deltas = np.abs(pitch[cons] - pitch[i])
                ints = np.array([1.0 if k in deltas else 0.0 for k in range(13)])
            else:
                ints = np.zeros(13)
            out[i] = np.concatenate(
                [iv, ints, tmpl, [is_maj, is_pmaj, is_min, ped, hv7, hv5, hv3, hv1, has2m, has2M]]
            )
    return out, names


def cadence_feature_set(note_array: np.ndarray) -> np.ndarray:
    """"cadence" input features = voice block + chord-context block.

    A vectorized stand-in for the reference's hand-crafted cadence feature
    set (descriptors/utils/cadence_features.py:6-119 stacks ~70 descriptors on
    top of the voice block; the chord-context block here covers the harmonic
    core of that set — full per-descriptor parity is tracked as future work).
    """
    v = voice_features(note_array)
    c, _ = chord_context_features(note_array)
    return np.hstack([v, c]).astype(np.float32)


def select_features(note_array: np.ndarray, features: str = "voice") -> np.ndarray:
    """Dispatch mirroring reference ``select_features``
    (descriptors/general.py:128-139)."""
    if features in ("voice", "simple", "default"):
        return voice_features(note_array)
    if features == "cadence":
        return cadence_feature_set(note_array)
    if features == "chord":
        v = voice_features(note_array)
        c, _ = chord_context_features(note_array)
        return np.hstack([v, c]).astype(np.float32)
    raise ValueError(f"unknown feature set {features!r}")
