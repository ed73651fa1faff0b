"""Legacy time-divided TSV ingestion (reference
chord_representations.py:105-240 + data/datasets/chord.py:145-588)."""

import os

import numpy as np
import pytest

from analysisgnn_tpu.data.time_divided import (
    ANJointTsvCorpus,
    TimeDividedTsvCorpus,
    create_divs_from_beats,
    load_time_divided_tsv,
    tie_consecutive_notes,
    time_divided_to_note_array,
)


def _write_fixture(path):
    """Two 4/4 measures at 8 slices/beat: C-major triad held 3 beats
    (duration change at beat 2 exercises tying), A4 + B4 half-beat notes,
    then a V7 chord for measure 2."""
    rows = []

    def emit(start_row, n_rows, measure, notes, dur, onset_first, rn, pcset,
             root, bass, quality, inversion, degree1):
        for i in range(n_rows):
            r = start_row + i
            onset = r / 8.0
            is_onset = "[" + ", ".join(
                ["True" if (i == 0 and onset_first) else "False"] * len(notes)
            ) + "]"
            rows.append({
                "j_offset": onset,
                "s_measure": measure,
                "s_isOnset": is_onset,
                "s_notes": "[" + ", ".join(f"'{n}'" for n in notes) + "]",
                "s_duration": dur,
                "a_localKey": "C",
                "a_tonicizedKey": "C",
                "a_degree1": degree1,
                "a_degree2": "None",
                "a_quality": quality,
                "a_inversion": inversion,
                "a_root": root,
                "a_bass": bass,
                "a_romanNumeral": rn,
                "a_isOnset": i == 0 and onset_first,
                "a_pcset": str(pcset),
            })

    triad = ["C4", "E4", "G4"]
    emit(0, 16, 1, triad, 2.0, True, "I", [0, 4, 7], "C", "C",
         "major triad", 0, "1")
    emit(16, 8, 1, triad, 1.0, False, "I", [0, 4, 7], "C", "C",
         "major triad", 0, "1")
    emit(24, 4, 1, ["A4"], 0.5, True, "I", [0, 4, 7], "C", "C",
         "major triad", 0, "1")
    emit(28, 4, 1, ["B4"], 0.5, True, "I", [0, 4, 7], "C", "C",
         "major triad", 0, "1")
    emit(32, 32, 2, ["G3", "B3", "D4", "F4"], 4.0, True, "V7",
         [2, 5, 7, 11], "G", "G", "dominant seventh chord", 0, "5")

    import pandas as pd

    pd.DataFrame(rows).to_csv(path, sep="\t", index=False)


def test_load_and_filter(tmp_path):
    p = str(tmp_path / "training-piece.tsv")
    _write_fixture(p)
    fdf, ts, spans = load_time_divided_tsv(p)
    assert ts == 4.0
    # kept slices: onset/duration/voice-count changes only
    assert list(fdf["j_offset"]) == [0.0, 2.0, 3.0, 3.5, 4.0]
    np.testing.assert_allclose(spans, [[0.0, 4.0], [4.0, 8.0]])


def test_note_array_tying_and_divs(tmp_path):
    p = str(tmp_path / "training-piece.tsv")
    _write_fixture(p)
    na, labels, label_onsets, spans_div = time_divided_to_note_array(p)
    # triad tied across the duration change: 3 notes of 3 beats
    triad = na[na["onset_beat"] == 0.0]
    assert len(triad) == 3
    np.testing.assert_allclose(triad["duration_beat"], 3.0)
    assert sorted(triad["pitch"].tolist()) == [60, 64, 67]
    # half-beat notes force divs=2
    a4 = na[na["pitch"] == 69]
    np.testing.assert_allclose(a4["onset_div"], 6)
    np.testing.assert_allclose(a4["duration_div"], 1)
    np.testing.assert_array_equal(spans_div, [[0, 8], [8, 16]])
    # note-level broadcast: chord notes at beat 4 carry the V7 labels
    v7 = labels["romanNumeral"][na["onset_beat"] == 4.0]
    i_label = labels["romanNumeral"][na["onset_beat"] == 0.0]
    assert (v7 == v7[0]).all() and v7[0] != i_label[0]
    assert (labels["hrythm"][na["onset_beat"] == 0.0][0] ==
            labels["hrythm"][na["onset_beat"] == 4.0][0])
    # localkey identical everywhere
    assert len(np.unique(labels["localkey"])) == 1


def test_transposition_octave_consistency(tmp_path):
    p = str(tmp_path / "training-piece.tsv")
    _write_fixture(p)
    na_p1, lab_p1, _, _ = time_divided_to_note_array(p, "P1")
    na_m2, lab_m2, _, _ = time_divided_to_note_array(p, "M2")
    # exact chromatic shift of +2 on every note (octave bookkeeping correct)
    np.testing.assert_array_equal(na_m2["pitch"], na_p1["pitch"] + 2)
    # transposed localkey differs, hrythm (TI) identical
    assert lab_m2["localkey"][0] != lab_p1["localkey"][0]
    np.testing.assert_array_equal(lab_m2["hrythm"], lab_p1["hrythm"])


def test_tie_chain_of_three():
    from analysisgnn_tpu.data.note_array import make_note_array

    na = make_note_array(
        onset_div=[0, 4, 8, 0], duration_div=[4, 4, 4, 8],
        pitch=[60, 60, 60, 64], divs_per_beat=4,
    )
    tied = tie_consecutive_notes(na)
    assert len(tied) == 2
    c4 = tied[tied["pitch"] == 60]
    np.testing.assert_allclose(c4["duration_beat"], 3.0)


def test_corpus_split_semantics(tmp_path):
    from analysisgnn_tpu.data.corpus import CorpusConfig

    src = tmp_path / "src"
    for split in ("training", "validation", "test"):
        os.makedirs(src / split)
        _write_fixture(str(src / split / f"{split}-x.tsv"))
    cfg = CorpusConfig(cache_dir=str(tmp_path / "cache"), transpose=True,
                       add_beats=False, add_measures=False)
    corpus = TimeDividedTsvCorpus(cfg, str(src)).load()
    assert not corpus.errors, corpus.errors
    splits = {}
    for s in corpus.samples:
        splits.setdefault(s.split, []).append(s)
    # only the training collection is transposition-augmented
    assert len(splits["training"]) > 1
    assert len(splits["validation"]) == 1
    assert len(splits["test"]) == 1
    assert splits["test"][0].test and not splits["validation"][0].test
    # cache round-trip preserves the split field
    corpus2 = TimeDividedTsvCorpus(cfg, str(src)).load()
    assert sorted(s.split for s in corpus2.samples) == sorted(
        s.split for s in corpus.samples
    )


def test_explicit_split_wins_in_datamodule(tmp_path):
    from analysisgnn_tpu.data.corpus import CorpusConfig
    from analysisgnn_tpu.data.datamodule import train_val_test_split

    src = tmp_path / "src"
    for split in ("training", "validation", "test"):
        os.makedirs(src / split)
        _write_fixture(str(src / split / f"{split}-x.tsv"))
    cfg = CorpusConfig(cache_dir=str(tmp_path / "cache"), transpose=False,
                       add_beats=False, add_measures=False)
    corpus = TimeDividedTsvCorpus(cfg, str(src)).load()
    tr, va, te = train_val_test_split(corpus.samples)
    assert [corpus.samples[i].split for i in va] == ["validation"]
    assert [corpus.samples[i].split for i in te] == ["test"]
    assert all(corpus.samples[i].split == "training" for i in tr)


def test_an_joint_corpus_walks_split_dirs(tmp_path):
    """ANJointTsvCorpus walks {training,test,validation}/*joint.tsv and
    stamps splits (reference AugmentedNetv100Dataset.process,
    chord.py:87-103) — exercised on the synthetic DLC-schema corpus."""
    from analysisgnn_tpu.data.corpus import CorpusConfig
    from analysisgnn_tpu.data.synth_dlc import write_corpus

    flat = tmp_path / "flat"
    write_corpus(str(flat), n_pieces=3, n_phrases=2, seed=1, test_fraction=0.0)
    tsvs = sorted(os.listdir(flat))[:3]
    src = tmp_path / "AN"
    for split, fn in zip(("training", "test", "validation"), tsvs):
        os.makedirs(src / split, exist_ok=True)
        os.rename(flat / fn, src / split / fn.replace(".tsv", "_joint.tsv"))
    cfg = CorpusConfig(cache_dir=str(tmp_path / "cache"), transpose=True,
                       add_beats=False, add_measures=False)
    corpus = ANJointTsvCorpus(cfg, str(src)).load()
    assert not corpus.errors, corpus.errors
    by_split = {}
    for s in corpus.samples:
        by_split.setdefault(s.split, []).append(s)
    assert set(by_split) == {"training", "test", "validation"}
    assert len(by_split["training"]) > 1  # augmented
    assert len(by_split["test"]) == 1 and by_split["test"][0].test
    assert len(by_split["validation"]) == 1
    # AN label set present at note level
    s = by_split["test"][0]
    for k in ("localkey", "quality", "romanNumeral", "bass", "hrythm"):
        assert k in s.note_attrs
