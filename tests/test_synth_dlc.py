"""Synthetic DLC-format corpus generator: schema + label coherence."""

import os

import numpy as np
import pytest

from analysisgnn_tpu.data.synth_dlc import (
    generate_piece,
    lof_pc,
    lof_to_step_alter,
    note_degree_name,
    spell,
    step_alter_to_lof,
    write_corpus,
)


def test_lof_spelling_roundtrip():
    for lof in range(-15, 16):
        step, alter = lof_to_step_alter(lof)
        assert step_alter_to_lof(step, alter) == lof
    assert spell(1) == "G" and spell(-2) == "Bb" and spell(6) == "F#"
    assert lof_pc(0) == 0 and lof_pc(1) == 7 and lof_pc(-2) == 10


def test_note_degree_names():
    # C major: C=1, E=3, Eb=b3, F#=#4
    assert note_degree_name(0, 0) == "1"
    assert note_degree_name(4, 0) == "3"
    assert note_degree_name(-3, 0) == "b3"
    assert note_degree_name(6, 0) == "#4"


def test_piece_labels_all_in_vocab_and_learnable():
    import jax

    from analysisgnn_tpu.data.tsv import create_labels_dlc, note_array_from_df
    from analysisgnn_tpu.theory.vocab import TASK_DICT, available_representations

    reps = available_representations()
    df = generate_piece(3, n_phrases=6)
    na, measures = note_array_from_df(df)
    assert len(na) == len(df) and measures is not None
    labels = create_labels_dlc(df)
    for task, n_cls in TASK_DICT.items():
        if task == "pcset":
            continue  # DLC label set has no pcset (reference parity)
        assert labels[task].max() < n_cls, task
    # no fallback-to-unknown for the structured vocab tasks
    for t in ("localkey", "root", "bass", "quality", "romanNumeral",
              "note_degree", "degree1"):
        last = len(reps[t].class_list) - 1
        assert (labels[t] == last).mean() == 0.0, t
    # cadences happen and are sparse
    assert 0 < (labels["cadence"] > 0).mean() < 0.5
    # chord tones dominate; NCTs exist
    assert 0.5 < labels["tpc_in_label"].mean() < 1.0


def test_chord_tone_pitch_consistency():
    """Realized midi pitches match the spelled tones (label ↔ surface
    coherence — the property that makes the tasks learnable from notes)."""
    df = generate_piece(7, n_phrases=4)
    from analysisgnn_tpu.data.synth_dlc import _LETTER_PC

    for _, row in df.iterrows():
        pc = (_LETTER_PC[row["step"]] + row["alter"]) % 12
        assert row["pitch"] % 12 == pc
        if row["tpc_is_bass"] and row["staff"] == 2:
            assert row["tpc"] == row["a_bass"]


def test_write_corpus_ingests_through_dlc_corpus(tmp_path):
    from analysisgnn_tpu.data.corpus import CorpusConfig, DLCTsvCorpus

    split = write_corpus(str(tmp_path), n_pieces=3, n_phrases=3, seed=2)
    assert len(split["train"]) == 2 and len(split["test"]) == 1
    cfg = CorpusConfig(cache_dir=str(tmp_path / ".cache"), feature_type="voice")
    corpus = DLCTsvCorpus(cfg, str(tmp_path), test_names=split["test"], dlc=True).load()
    assert len(corpus.samples) >= 3
    test_samples = [s for s in corpus.samples if s.test]
    assert len(test_samples) == 1  # test pieces are not augmented
    s = corpus.samples[0]
    assert s.features["note"].shape[1] == 25
    assert ("note", "onset", "note") in s.edges
    assert s.note_attrs["cadence"].max() <= 3
