"""Schema-variant hardening of the TSV front-end: real-world pitch arrays
carry shuffled column orders, float-typed div columns, NA cells, missing
optional columns, and unknown extra columns (reference loader would raise —
dcl_tsv_utils.py:78-96; this front-end coerces and documents divergences in
data/tsv.py)."""

import numpy as np
import pandas as pd
import pytest

from analysisgnn_tpu.data.tsv import (
    create_labels_dlc,
    load_pitch_array,
    note_array_from_df,
)
from tests.test_corpus_datamodule import make_dlc_df


def test_shuffled_columns_and_extras(tmp_path):
    df = make_dlc_df(32)
    df["totally_unknown_column"] = "x"
    df = df[list(reversed(df.columns))]  # shuffled order
    p = tmp_path / "v.tsv"
    df.to_csv(p, sep="\t", index=False)
    na, measures = note_array_from_df(load_pitch_array(str(p)))
    assert len(na) == 32 and measures is not None
    labels = create_labels_dlc(load_pitch_array(str(p)))
    assert labels["localkey"].shape == (32,)


def test_float_div_columns_and_na_cells(tmp_path):
    df = make_dlc_df(32)
    df["onset_div"] = df["onset_div"].astype(float)  # float-typed divs
    df["ts_beats"] = df["ts_beats"].astype(object)
    df["alter"] = df["alter"].astype(object)
    df["voice"] = df["voice"].astype(object)
    df.loc[3, "ts_beats"] = np.nan  # NA at a pickup measure
    df.loc[5, "alter"] = np.nan
    df.loc[7, "voice"] = "bad"  # stray string
    p = tmp_path / "v.tsv"
    df.to_csv(p, sep="\t", index=False)
    na, _ = note_array_from_df(load_pitch_array(str(p)))
    assert len(na) == 32
    assert na["ts_beats"][3] == 4  # filled
    assert na["alter"][5] == 0
    assert na["voice"][7] == 1


def test_unplaceable_rows_dropped():
    df = make_dlc_df(32)
    df.loc[2, "onset_div"] = np.nan
    df.loc[4, "pitch"] = np.nan
    na, _ = note_array_from_df(df)
    assert len(na) == 30  # the two unusable rows dropped


def test_missing_optional_columns():
    df = make_dlc_df(32).drop(
        columns=["onset_beat", "ts_beats", "ts_beat_type", "step", "alter",
                 "staff", "voice", "ks_fifths"]
    )
    na, _ = note_array_from_df(df)
    assert len(na) == 32
    assert (na["ts_beats"] == 4).all() and (na["ts_beat_type"] == 4).all()
    # beats fall back to divs; spelling derived from the midi pitch
    assert np.all(na["onset_beat"] == na["onset_div"])
    assert set(na["step"]) <= set("ABCDEFG")


def test_sparse_na_beats_interpolated():
    df = make_dlc_df(32)
    df.loc[10, "onset_beat"] = np.nan
    na, _ = note_array_from_df(df)
    # row 10's beat re-derived from its onset_div at the file's ratio
    assert np.isclose(na["onset_beat"][10], na["onset_div"][10] / 4.0)


def test_no_pitch_column_raises():
    df = make_dlc_df(8).drop(columns=["pitch"])
    with pytest.raises(ValueError, match="pitch"):
        note_array_from_df(df)


def test_empty_after_drop():
    df = make_dlc_df(8)
    df["onset_div"] = np.nan
    na, measures = note_array_from_df(df)
    assert len(na) == 0 and measures is None


def test_dropped_rows_keep_labels_aligned(tmp_path):
    """A dropped unplaceable row must NOT shift the labels of subsequent
    notes: corpus.process_file cleans once and labels from the cleaned
    frame (the raw-frame labeling bug found in round-2 review)."""
    from analysisgnn_tpu.data.corpus import CorpusConfig, DLCTsvCorpus

    df = make_dlc_df(32)
    df["onset_div"] = df["onset_div"].astype(object)
    # make note 5's localkey distinctive, then break note 3's onset
    df["a_localKey"] = ["C"] * 32
    df.loc[5:, "a_localKey"] = "G"
    df.loc[3, "onset_div"] = np.nan
    d = tmp_path / "all"
    d.mkdir()
    df.to_csv(d / "x.tsv", sep="\t", index=False)
    corpus = DLCTsvCorpus(
        CorpusConfig(cache_dir=str(tmp_path / ".cache"), transpose=False),
        source_dir=str(tmp_path),
    )
    samples = corpus.process_file(str(d / "x.tsv"))
    s = samples[0]
    n = len(s.note_attrs["localkey"])
    assert n == 31  # one row dropped
    # notes 0..4 in the ORIGINAL frame were C; after dropping row 3 the
    # kept rows 0,1,2,4 are C and everything from original row 5 on is G —
    # i.e. the first 4 kept labels equal the C id, the rest the G id
    lk = s.note_attrs["localkey"]
    assert len(set(lk[:4])) == 1 and len(set(lk[4:])) == 1
    assert lk[0] != lk[-1]
