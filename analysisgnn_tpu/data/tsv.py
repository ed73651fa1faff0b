"""DLC / AugmentedNet pitch-array TSV ingestion → note array + labels.

Re-specification of the reference TSV pipeline (analysisgnn/utils/
dcl_tsv_utils.py): ``create_graph_from_df`` note-array assembly incl.
divs-per-beat inference (:97-203), measure-span extraction from
``mn_playthrough`` change points (:162-171), and the label factories
``create_labels``/``create_labels_dlc`` (:325-444) re-expressed through the
static vocabulary tables of theory/vocab.py (no music21).

Naming note: the DLC "pedal" label is stored under the task name
``organ_point`` so the TASK_DICT head actually trains (the reference keeps
them apart, which silently disables that task — SURVEY hard part 8 family of
quirks; divergence documented here).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np
import pandas as pd

from analysisgnn_tpu.data.note_array import NOTE_ARRAY_DTYPE
from analysisgnn_tpu.utils.general import exit_after, parse_budget_s
from analysisgnn_tpu.theory.encoders import CadenceEncoder
from analysisgnn_tpu.theory.vocab import (
    available_representations,
    normalize_key_name,
    normalize_tone_function,
)


@exit_after(parse_budget_s())
def load_pitch_array(path: str, dropna_tpc: bool = True) -> pd.DataFrame:
    df = pd.read_csv(path, sep="\t", low_memory=False)
    if dropna_tpc and "tpc" in df.columns:
        df = df.dropna(subset=["tpc"])
    return df.reset_index(drop=True)


def clean_pitch_frame(df: pd.DataFrame) -> pd.DataFrame:
    """Schema hardening for real-world pitch arrays: coerce the numeric
    columns (files in the wild carry float-typed div columns, stray strings,
    and NA cells at pickup measures) and DROP rows with no usable
    onset/pitch — they cannot be placed in the graph (the reference's
    dtype-spec loader would instead raise, dcl_tsv_utils.py:78-96 —
    divergence documented).

    IMPORTANT: any consumer that builds per-note labels from the same frame
    (data/corpus.py::process_file) must clean the frame FIRST and derive
    both the note array and the labels from the cleaned frame — otherwise a
    dropped row silently shifts every subsequent label.  Idempotent.
    """
    df = df.copy()
    if "continuous_beats" in df.columns:
        df["onset_beat"] = df["continuous_beats"]
    for col in ("onset_div", "duration_div", "onset_beat"):
        if col in df.columns:
            df[col] = pd.to_numeric(df[col], errors="coerce")
    pitch_col = "pitch" if "pitch" in df.columns else (
        "s_midi" if "s_midi" in df.columns else None
    )
    if pitch_col is None:
        raise ValueError(
            "pitch array has neither a 'pitch' nor an 's_midi' column"
        )
    df[pitch_col] = pd.to_numeric(df[pitch_col], errors="coerce")
    # replace non-finite numerics (inf from hostile exports) with NA so the
    # usable-row filter / interpolation below treats them as missing
    for col in ("onset_div", "onset_beat", pitch_col):
        if col in df.columns:
            v = df[col].to_numpy(dtype=float, na_value=np.nan)
            df[col] = np.where(np.isfinite(v), v, np.nan)
    usable = (
        df["onset_div"].notna()
        & df[pitch_col].notna()
        & (df[pitch_col] >= 0)
        & (df[pitch_col] < 128)  # MIDI range; out-of-range is unplaceable
    )
    df = df[usable].reset_index(drop=True)
    # duration default is 1 div whether the column is missing entirely or a
    # cell is NA (a 0 default would create zero-extent notes for the
    # during/consecutive edge builders)
    df["duration_div"] = (
        df.get("duration_div", pd.Series([1] * len(df)))
        .fillna(1)
        .clip(lower=0)  # negative durations are export bugs, never real
    )
    if "ts_beats" not in df.columns:
        df["ts_beats"] = 4
    df["ts_beats"] = (
        pd.to_numeric(df["ts_beats"], errors="coerce").fillna(4).astype(int)
    )
    return df


def note_array_from_df(df: pd.DataFrame) -> Tuple[np.ndarray, np.ndarray]:
    """Assemble the framework note array + measure spans from a DLC/AN frame
    (reference create_graph_from_df :130-171).  Applies
    :func:`clean_pitch_frame` (idempotent) — callers that also build labels
    must clean the frame themselves and label from the cleaned frame."""
    df = clean_pitch_frame(df)
    if "onset_beat" not in df.columns or df["onset_beat"].isna().all():
        df["onset_beat"] = df["onset_div"].astype(float)
    elif df["onset_beat"].isna().any():
        # sparse NA beats: fill by interpolating from onset_div at the
        # file's div/beat ratio estimated from the non-NA rows
        ok = df["onset_beat"].notna()
        ratio = np.polyfit(
            df.loc[ok, "onset_div"], df.loc[ok, "onset_beat"], 1
        )
        df.loc[~ok, "onset_beat"] = np.polyval(
            ratio, df.loc[~ok, "onset_div"]
        )
    uniq_beat = np.unique(df["onset_beat"].to_numpy())
    uniq_div = np.unique(df["onset_div"].to_numpy())
    diff_beat = np.diff(uniq_beat)
    diff_div = np.diff(uniq_div)
    if len(diff_beat) == 0 or np.isclose(diff_beat[0], 0):
        divs_per_beat = 1.0
    else:
        divs_per_beat = diff_div[0] / diff_beat[0]
    if "pitch" not in df.columns:
        df["pitch"] = df["s_midi"]
    if "step" not in df.columns:
        if "s_step" in df.columns:
            df["step"] = df["s_step"]
            df["alter"] = df["s_alter"]
        else:  # spelling absent: sharp-side spelling from the midi pitch
            from analysisgnn_tpu.data.note_array import _PC_TO_SPELLING

            pcs = df["pitch"].to_numpy(np.int64) % 12
            df["step"] = [_PC_TO_SPELLING[p][0] for p in pcs]
            df["alter"] = [_PC_TO_SPELLING[p][1] for p in pcs]
    if "staff" not in df.columns:
        if "s_part_id" in df.columns:
            staffs = {s: i for i, s in enumerate(df["s_part_id"].unique())}
            df["staff"] = df["s_part_id"].map(staffs)
        else:
            df["staff"] = 1
    if "voice" not in df.columns:
        df["voice"] = df.get("s_voice_id", 1)

    n = len(df)
    if n == 0:
        return np.zeros(0, dtype=NOTE_ARRAY_DTYPE), None
    na = np.zeros(n, dtype=NOTE_ARRAY_DTYPE)
    na["onset_div"] = df["onset_div"].to_numpy(np.int64)
    na["duration_div"] = df["duration_div"].to_numpy(np.int64)
    na["onset_beat"] = df["onset_beat"].to_numpy(np.float64)
    na["duration_beat"] = df["duration_div"].to_numpy(np.float64) / max(divs_per_beat, 1e-9)
    na["pitch"] = df["pitch"].to_numpy(np.int64)
    na["voice"] = pd.to_numeric(df["voice"], errors="coerce").fillna(1).to_numpy(np.int64)
    na["staff"] = pd.to_numeric(df["staff"], errors="coerce").fillna(1).to_numpy(np.int64)
    na["ts_beats"] = df["ts_beats"].to_numpy(np.int64)
    na["ts_beat_type"] = (
        pd.to_numeric(df.get("ts_beat_type", pd.Series([4] * n)), errors="coerce")
        .fillna(4)
        .to_numpy(np.int64)
    )
    na["step"] = df["step"].astype(str).to_numpy()
    na["alter"] = pd.to_numeric(df["alter"], errors="coerce").fillna(0).to_numpy(np.int64)
    na["octave"] = na["pitch"] // 12 - 1
    na["ks_fifths"] = pd.to_numeric(df.get("ks_fifths", 0), errors="coerce").fillna(0).to_numpy(np.int64) if "ks_fifths" in df.columns else 0
    na["is_downbeat"] = np.remainder(na["onset_beat"], 1) == 0

    # measure spans from measure-number change points (:162-171)
    mn_col = "mn_playthrough" if "mn_playthrough" in df.columns else (
        "measureNumberWithSuffix" if "measureNumberWithSuffix" in df.columns else None
    )
    if mn_col is not None:
        mn = df[mn_col].to_numpy()
        change = np.flatnonzero(mn[:-1] != mn[1:])
        change = np.r_[0, change + 1]
        starts = na["onset_div"][change]
        offsets = na["onset_div"] + na["duration_div"]
        ends = np.r_[offsets[change[1:]], offsets[-1]]
        measures = np.stack([starts, ends], axis=1)
    else:
        measures = None
    return na, measures


_DEGREE_NONE = "None"


def _col(df: pd.DataFrame, name: str, default=None):
    if name in df.columns:
        return df[name]
    return pd.Series([default] * len(df))


def create_labels_dlc(df: pd.DataFrame, interval: str = "P1") -> Dict[str, np.ndarray]:
    """DLC label set: 19 label arrays + 5 validity masks
    (reference create_labels_dlc :374-444), via static vocab tables."""
    reps = available_representations()
    cad = CadenceEncoder()
    n = len(df)

    def norm_series(col, fn):
        return [fn(v) if pd.notna(v) else None for v in _col(df, col)]

    roots = norm_series("a_root", normalize_tone_function)
    basses = norm_series("a_bass", normalize_tone_function)
    localkeys = norm_series("a_localKey", normalize_key_name)
    tonkeys = norm_series("a_tonicizedKey", normalize_key_name)

    def enc(rep_name, values):
        return reps[rep_name].encode(values, transposition=interval)

    def raw(col, dtype=np.int64, default=0):
        return (
            pd.to_numeric(_col(df, col, default), errors="coerce")
            .fillna(default)
            .to_numpy(dtype)
        )

    def rows(col):
        return [None if pd.isna(v) else v for v in _col(df, col)]

    labels: Dict[str, np.ndarray] = {
        "localkey": enc("localkey", localkeys),
        "tonkey": enc("tonkey", tonkeys),
        "quality": enc("quality", rows("a_quality")),
        "root": enc("root", roots),
        "inversion": enc("inversion", rows("a_inversion")),
        "degree1": enc("degree1", [str(v) if v is not None else _DEGREE_NONE for v in rows("a_degree1")]),
        "degree2": enc("degree2", [str(v) if v is not None else _DEGREE_NONE for v in rows("a_degree2")]),
        "bass": enc("bass", basses),
        "hrythm": enc("hrythm", [bool(v) if v is not None else False for v in rows("a_isOnset")]),
        "romanNumeral": enc("romanNumeral", rows("a_simpleNumeral")),
        "note_degree": enc("note_degree", rows("note_degree")),
        "metrical_strength": raw("downbeat"),
        "downbeat": raw("downbeat"),
        "section": raw("section_start"),
        "phrase": raw("a_phraseend"),
        "tpc_in_label": raw("tpc_is_in_label"),
        "tpc_is_root": raw("tpc_is_root"),
        "tpc_is_bass": raw("tpc_is_bass"),
        "cadence": np.array(
            [cad.encode_from_text(v) if pd.notna(v) else 0 for v in _col(df, "cadence_type")],
            np.int64,
        ),
        # reference name "pedal"; stored under the task head's name
        "organ_point": np.array(
            [1 if pd.notna(v) else 0 for v in _col(df, "pedal")], np.int64
        ),
        "staff": raw("staff", default=1),
        "valid_label": raw("valid_chord_label", default=1),
        "valid_cadence_label": raw("valid_cadence_label", default=1),
        "valid_phrase_label": raw("valid_phrase_label", default=1),
        "valid_organ_point_label": raw("valid_pedal_point_label", default=1),
        "valid_section_start_label": raw("valid_section_start_label", default=1),
    }
    return labels


def create_labels_augmentednet(df: pd.DataFrame, interval: str = "P1") -> Dict[str, np.ndarray]:
    """AugmentedNet-style label set (reference create_labels :325-371)."""
    reps = available_representations()

    def rows(col):
        return [None if pd.isna(v) else v for v in _col(df, col)]

    tpc = [
        (str(s) + ("#" * int(a) if a >= 0 else "-" * int(-a)))
        if pd.notna(s) and pd.notna(a)
        else None
        for s, a in zip(_col(df, "step"), pd.to_numeric(_col(df, "alter", 0), errors="coerce").fillna(0))
    ]
    a_bass = rows("a_bass")
    a_root = rows("a_root")
    pitch_names = rows("a_pitchNames")
    tpc_in = np.array(
        [1 if (t is not None and p is not None and t in p) else 0 for t, p in zip(tpc, pitch_names)],
        np.int64,
    )

    def enc(rep_name, values):
        return reps[rep_name].encode(values, transposition=interval)

    labels = {
        "localkey": enc("localkey", rows("a_localKey")),
        "tonkey": enc("tonkey", rows("a_tonicizedKey")),
        "quality": enc("quality", rows("a_quality")),
        "root": enc("root", a_root),
        "inversion": enc("inversion", rows("a_inversion")),
        "degree1": enc("degree1", [str(v) if v is not None else _DEGREE_NONE for v in rows("a_degree1")]),
        "degree2": enc("degree2", [str(v) if v is not None else _DEGREE_NONE for v in rows("a_degree2")]),
        "bass": enc("bass", a_bass),
        "hrythm": enc("hrythm", [bool(v) if v is not None else False for v in rows("a_isOnset")]),
        "romanNumeral": enc("romanNumeral", rows("a_simpleNumeral")),
        "pcset": enc("pcset", [tuple(v) if isinstance(v, (list, tuple)) else v for v in rows("a_pcset")]),
        "tpc_in_label": tpc_in,
        "tpc_is_root": np.array([1 if t is not None and t == r else 0 for t, r in zip(tpc, a_root)], np.int64),
        "tpc_is_bass": np.array([1 if t is not None and t == b else 0 for t, b in zip(tpc, a_bass)], np.int64),
        "valid_label": pd.to_numeric(_col(df, "valid_chord_label", 1), errors="coerce").fillna(1).to_numpy(np.int64),
    }
    return labels
