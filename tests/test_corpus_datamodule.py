"""Corpus caching, TSV ingestion, datamodule splits."""

import numpy as np
import pandas as pd
import pytest

from analysisgnn_tpu.core.graph import NOTE
from analysisgnn_tpu.data.corpus import (
    CorpusConfig,
    DLCTsvCorpus,
    load_sample,
    samples_from_note_array,
    save_sample,
)
from analysisgnn_tpu.data.datamodule import (
    AnalysisDataModule,
    DataModuleConfig,
    train_val_test_split,
)
from analysisgnn_tpu.data.note_array import synthetic_score, transpose_note_array
from analysisgnn_tpu.data.tsv import create_labels_dlc, note_array_from_df


def make_dlc_df(n=32):
    rng = np.random.default_rng(0)
    onset = np.repeat(np.arange(n // 2) * 4, 2)
    pitches = rng.integers(48, 80, n)
    steps = np.array(["C", "D", "E", "F", "G", "A", "B"])[pitches % 7]
    return pd.DataFrame(
        {
            "onset_div": onset,
            "duration_div": np.full(n, 4),
            "onset_beat": onset / 4.0,
            "ts_beats": np.full(n, 4),
            "ts_beat_type": np.full(n, 4),
            "pitch": pitches,
            "step": steps,
            "alter": np.zeros(n, int),
            "staff": np.ones(n, int),
            "voice": np.ones(n, int),
            "ks_fifths": np.zeros(n, int),
            "tpc": steps,
            "mn_playthrough": np.repeat(np.arange(n // 8), 8)[:n],
            "a_localKey": ["C"] * n,
            "a_tonicizedKey": ["G"] * n,
            "a_quality": ["M"] * n,
            "a_root": ["C"] * n,
            "a_bass": ["E"] * n,
            "a_inversion": [1] * n,
            "a_degree1": ["1"] * n,
            "a_degree2": [None] * n,
            "a_isOnset": [True] * n,
            "a_simpleNumeral": ["I"] * n,
            "note_degree": ["1"] * n,
            "downbeat": (onset % 16 == 0).astype(int),
            "section_start": np.zeros(n, int),
            "a_phraseend": np.zeros(n, int),
            "tpc_is_in_label": np.ones(n, int),
            "tpc_is_root": np.ones(n, int),
            "tpc_is_bass": np.zeros(n, int),
            "cadence_type": ["PAC"] + [None] * (n - 1),
            "pedal": [None] * n,
            "valid_chord_label": np.ones(n, int),
            "valid_cadence_label": np.ones(n, int),
            "valid_phrase_label": np.ones(n, int),
            "valid_pedal_point_label": np.ones(n, int),
            "valid_section_start_label": np.ones(n, int),
        }
    )


def test_note_array_from_df():
    df = make_dlc_df()
    na, measures = note_array_from_df(df)
    assert len(na) == 32
    np.testing.assert_allclose(na["duration_beat"], 1.0)
    assert measures is not None and measures.shape[1] == 2


def test_create_labels_dlc_and_transposed():
    df = make_dlc_df()
    labels = create_labels_dlc(df)
    assert labels["localkey"][0] == 8  # 'C' index in keys50
    assert labels["inversion"][0] == 1
    assert labels["cadence"][0] == 1 and labels["cadence"][1] == 0
    up = create_labels_dlc(df, interval="M2")
    from analysisgnn_tpu.theory.vocab import available_representations

    reps = available_representations()
    assert reps["localkey"].decode([up["localkey"][0]]) == ["D"]
    assert reps["root"].decode([up["root"][0]]) == ["D"]


def test_transpose_note_array_roundtrip():
    na = synthetic_score(24, seed=0)
    up = transpose_note_array(na, "M2")
    assert ((up["pitch"] - na["pitch"]) % 128 == 2).all()
    down_then_up = transpose_note_array(transpose_note_array(na, "P5"), "P4")
    assert ((down_then_up["pitch"] - na["pitch"]) % 12 == 0).all()


def test_samples_from_note_array_augmentation():
    na = synthetic_score(40, seed=1)
    out = samples_from_note_array(
        na, name="x", transpositions=("P1", "M2", "P5"), add_beats=False, add_measures=False
    )
    assert len(out) == 3
    # shared edge arrays across transpositions (no copies)
    assert out[0].edges[(NOTE, "onset", NOTE)] is out[1].edges[(NOTE, "onset", NOTE)]
    assert not np.array_equal(
        out[0].features[NOTE][:, 3:15], out[1].features[NOTE][:, 3:15]
    )


def test_save_load_sample(tmp_path):
    na = synthetic_score(24, seed=2)
    (s,) = samples_from_note_array(na, name="x", transpositions=("P1",))
    p = str(tmp_path / "s.npz")
    save_sample(s, p)
    s2 = load_sample(p)
    np.testing.assert_array_equal(s.features[NOTE], s2.features[NOTE])
    assert set(s.edges.keys()) == set(s2.edges.keys())
    assert s2.transposition == "P1"


def test_dlc_corpus_with_cache(tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    make_dlc_df().to_csv(src / "piece1.tsv", sep="\t", index=False)
    make_dlc_df(24).to_csv(src / "piece2.tsv", sep="\t", index=False)
    cfg = CorpusConfig(cache_dir=str(tmp_path / "cache"), transpose=False)
    corpus = DLCTsvCorpus(cfg, str(src), test_names=["piece2"]).load()
    assert len(corpus.samples) == 2
    assert corpus.samples[1].test
    # second load hits the cache
    corpus2 = DLCTsvCorpus(cfg, str(src), test_names=["piece2"]).load()
    assert len(corpus2.samples) == 2
    assert "organ_point" in corpus2.samples[0].note_attrs


def test_split_and_datamodule():
    na_samples = []
    for i in range(10):
        na = synthetic_score(40, seed=i)
        na_samples += samples_from_note_array(
            na,
            name=f"p{i}",
            transpositions=("P1",),
            add_beats=False,
            add_measures=False,
            test=(i >= 8),
            labels={"cadence": (na["pitch"] % 4).astype(np.int64)},
        )
    tr, va, te = train_val_test_split(na_samples)
    assert len(te) == 2 and len(tr) + len(va) == 8
    dm = AnalysisDataModule(
        {"cadence": na_samples},
        DataModuleConfig(subgraph_size=16, batch_size=2, num_neighbors=(3,)),
    ).setup()
    b = next(iter(dm.combined_train_batches(1)))
    assert "cadence" in b
    assert "cadence" in dm.active_tasks("cadence")
    assert dm.feature_dim == 25
    test_batches = list(dm.test_batches("cadence"))
    assert len(test_batches) == 2
