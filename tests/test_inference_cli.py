"""Inference pipeline, exports, CLI train→predict roundtrip, SMOTE."""

import csv
import json
import os

import numpy as np
import jax
import pytest

from analysisgnn_tpu.core.graph import NOTE, metadata
from analysisgnn_tpu.data.note_array import synthetic_score
from analysisgnn_tpu.inference.predict import (
    decode_predictions,
    export_predictions_csv,
    export_roman_numerals_to_musicxml,
    onsetwise_smooth,
    predict_score,
)
from analysisgnn_tpu.models.analysis import AnalysisGNN
from analysisgnn_tpu.theory.vocab import TASK_DICT
from analysisgnn_tpu.train.smote import smote_oversample, smote_feature_penalty

SCORE_XML = """<?xml version="1.0"?>
<score-partwise version="3.1">
  <part-list><score-part id="P1"/></part-list>
  <part id="P1">
    <measure number="1">
      <attributes><divisions>1</divisions>
        <time><beats>4</beats><beat-type>4</beat-type></time></attributes>
      <note><pitch><step>C</step><octave>4</octave></pitch><duration>1</duration></note>
      <note><pitch><step>E</step><octave>4</octave></pitch><duration>1</duration></note>
      <note><pitch><step>G</step><octave>4</octave></pitch><duration>1</duration></note>
      <note><pitch><step>C</step><octave>5</octave></pitch><duration>1</duration></note>
    </measure>
    <measure number="2">
      <note><pitch><step>D</step><octave>4</octave></pitch><duration>2</duration></note>
      <note><pitch><step>F</step><octave>4</octave></pitch><duration>2</duration></note>
    </measure>
  </part>
</score-partwise>
"""


def small_model():
    nodes, edges = metadata(False, False)
    return AnalysisGNN(
        metadata=(nodes, edges),
        in_channels=25,
        hidden_channels=16,
        out_channels=8,
        task_dict=tuple(TASK_DICT.items()),
        num_layers=1,
        dropout=0.0,
    )


def test_predict_score_and_exports(tmp_path):
    model = small_model()
    na = synthetic_score(30, seed=0)
    from analysisgnn_tpu.inference.predict import graph_from_note_array

    g = graph_from_note_array(na, add_beats=False, add_measures=False)
    attrs = g.node_attrs[NOTE]
    params = model.init(
        jax.random.PRNGKey(0),
        g.x_dict(), g.edge_index_dict(), g.batch,
        attrs["pitch_spelling"], attrs["key_signature"], g.num_target_nodes,
    )
    probs = predict_score(model, params, na, add_beats=False, add_measures=False)
    assert set(TASK_DICT).issubset(probs.keys())
    for k, v in probs.items():
        assert v.shape[0] == len(na)
        np.testing.assert_allclose(v.sum(-1), 1.0, rtol=1e-3)
    decoded = decode_predictions(probs)
    assert len(decoded["localkey"]) == len(na)
    csv_path = str(tmp_path / "out.csv")
    export_predictions_csv(csv_path, na, decoded)
    rows = list(csv.reader(open(csv_path)))
    assert len(rows) == len(na) + 1
    xml_path = str(tmp_path / "rna.musicxml")
    export_roman_numerals_to_musicxml(xml_path, na, decoded)
    import xml.etree.ElementTree as ET

    root = ET.parse(xml_path).getroot()
    assert root.tag == "score-partwise"
    assert root.findall(".//lyric/text")


def test_predict_score_ids_matches_probs_path():
    """The ids-only device decode is prediction-equivalent to
    argmax(predict_score(...)) — same forward, same onset-wise RNA
    aggregation and change-point smoothing semantics."""
    from analysisgnn_tpu.inference.predict import (
        graph_from_note_array,
        predict_score_ids,
    )

    model = small_model()
    na = synthetic_score(40, seed=3)
    g = graph_from_note_array(na, add_beats=False, add_measures=False)
    attrs = g.node_attrs[NOTE]
    params = model.init(
        jax.random.PRNGKey(1),
        g.x_dict(), g.edge_index_dict(), g.batch,
        attrs["pitch_spelling"], attrs["key_signature"], g.num_target_nodes,
    )
    probs = predict_score(model, params, na, add_beats=False, add_measures=False)
    for bucket in (None, 1.5):  # exact shapes and padded-ladder shapes
        ids = predict_score_ids(
            model, params, na, add_beats=False, add_measures=False,
            bucket_factor=bucket,
        )
        assert set(ids) == set(probs)
        for k in probs:
            assert ids[k].shape == (len(na),)
            np.testing.assert_array_equal(
                ids[k], probs[k].argmax(-1), err_msg=f"task {k} bucket {bucket}"
            )


def test_onsetwise_smooth_constant_within_segments():
    n = 6
    onset_div = np.array([0, 0, 4, 4, 8, 8])
    onset_edges = np.array([[0, 1, 2, 3, 4, 5], [1, 0, 3, 2, 5, 4]])
    rng = np.random.default_rng(0)
    probs = {k: rng.random((n, 5)).astype(np.float32) for k in
             ("quality", "inversion", "degree1", "degree2")}
    probs = {k: v / v.sum(-1, keepdims=True) for k, v in probs.items()}
    out = onsetwise_smooth(probs, onset_edges, onset_div)
    for k in out:
        # notes sharing an onset get identical distributions
        np.testing.assert_allclose(out[k][0], out[k][1], rtol=1e-5)
        np.testing.assert_allclose(out[k][2], out[k][3], rtol=1e-5)


def test_cli_train_predict_roundtrip(tmp_path):
    from analysisgnn_tpu.cli import predict as predict_cli
    from analysisgnn_tpu.cli import train as train_cli

    ckpt = str(tmp_path / "ckpt")
    train_cli.main([
        "--demo", "--do_train",
        "--num_layers", "1", "--hidden_channels", "16", "--out_channels", "8",
        "--num_epochs", "1", "--subgraph_size", "24", "--batch_size", "20",
        "--main_tasks", "all", "--checkpoint_dir", ckpt,
        "--max_steps_per_epoch", "2",
    ])
    assert os.path.exists(os.path.join(ckpt, "model_config.json"))
    assert os.path.exists(os.path.join(ckpt, "last"))
    score = tmp_path / "score.xml"
    score.write_text(SCORE_XML)
    out_csv = str(tmp_path / "analysis.csv")
    out_xml = str(tmp_path / "rna.musicxml")
    predict_cli.main([
        "--score", str(score), "--checkpoint_dir", ckpt, "--checkpoint", "last",
        "--output_csv", out_csv, "--output_musicxml", out_xml,
    ])
    assert os.path.exists(out_csv) and os.path.exists(out_xml)
    rows = list(csv.reader(open(out_csv)))
    assert len(rows) == 7  # 6 notes + header


def test_smote_shapes_and_penalty():
    rng = np.random.default_rng(0)
    x = jax.numpy.asarray(rng.normal(size=(40, 8)), jax.numpy.float32)
    y = jax.numpy.asarray(np.r_[np.zeros(30), np.ones(10)].astype(np.int32))
    w = jax.numpy.ones(40, bool)
    xs, ys, ws = smote_oversample(
        x, y, w, jax.random.PRNGKey(0), num_classes=2, num_synthetic=16, k=3
    )
    assert xs.shape == (16, 8) and ys.shape == (16,)
    assert bool(ws.all())
    # deficit sampling: all synthetic rows belong to the minority class
    assert (np.asarray(ys) == 1).all()
    pen = smote_feature_penalty(xs, ws, x, y, ys, w)
    assert np.isfinite(float(pen))


def test_resolve_checkpoint_chain(tmp_path):
    """Reference resolution chain (predict_analysis.py:79-125): local dir
    first, then the artifacts cache, then a clear error for W&B ids
    without wandb/network."""
    import pytest

    from analysisgnn_tpu.cli.predict import resolve_checkpoint

    # 1. local hit
    local = tmp_path / "ckpt"
    (local / "best").mkdir(parents=True)
    assert resolve_checkpoint(str(local), "best") == str(local)

    # 2. cache scan: missing local dir falls back to a cached artifact
    cache = tmp_path / "artifacts" / "models"
    art = cache / "model-abc:v3"
    (art / "best").mkdir(parents=True)
    (art / "model_config.json").write_text("{}")
    got = resolve_checkpoint(str(tmp_path / "nope"), "best", str(cache))
    assert got == str(art)

    # 3. W&B id with no cached copy -> ImportError (wandb not installed)
    #    or FileNotFoundError for plain paths
    with pytest.raises((ImportError, FileNotFoundError)):
        resolve_checkpoint("entity/project/model-x:v1", "best",
                           str(tmp_path / "empty"))
    with pytest.raises(FileNotFoundError):
        resolve_checkpoint(str(tmp_path / "nope2"), "best",
                           str(tmp_path / "empty"))


@pytest.mark.slow
def test_cli_train_predict_roundtrip_hgt_emax(tmp_path):
    """HGT emax checkpoints must restore at predict time: the union-stack
    param structure is static (family-based), not a function of the live
    graph's edge counts (round-2 review finding)."""
    from analysisgnn_tpu.cli import predict as predict_cli
    from analysisgnn_tpu.cli import train as train_cli

    ckpt = str(tmp_path / "ckpt")
    train_cli.main([
        "--demo", "--do_train", "--model", "HGT", "--hgt_group_mode", "emax",
        "--num_layers", "1", "--hidden_channels", "16", "--out_channels", "8",
        "--num_epochs", "1", "--subgraph_size", "24", "--batch_size", "20",
        "--main_tasks", "all", "--checkpoint_dir", ckpt,
        "--max_steps_per_epoch", "2",
    ])
    score = tmp_path / "score.xml"
    score.write_text(SCORE_XML)
    out_csv = str(tmp_path / "analysis.csv")
    predict_cli.main([
        "--score", str(score), "--checkpoint_dir", ckpt, "--checkpoint", "last",
        "--output_csv", out_csv,
    ])
    rows = list(csv.reader(open(out_csv)))
    assert len(rows) == 7  # 6 notes + header


def test_bucketed_predict_matches_exact_shapes():
    """bucket_factor pads to a capacity ladder; probabilities must be
    IDENTICAL to the exact-shape forward (padding rows are dropped by the
    segment ops / sliced before softmax)."""
    from analysisgnn_tpu.inference.predict import (
        bucket_capacity,
        graph_from_note_array,
    )

    model = small_model()
    na = synthetic_score(30, seed=0)
    g = graph_from_note_array(na, add_beats=False, add_measures=False)
    attrs = g.node_attrs[NOTE]
    params = model.init(
        jax.random.PRNGKey(0),
        g.x_dict(), g.edge_index_dict(), g.batch,
        attrs["pitch_spelling"], attrs["key_signature"], g.num_target_nodes,
    )
    exact = predict_score(model, params, na, add_beats=False, add_measures=False)
    padded = predict_score(
        model, params, na, add_beats=False, add_measures=False,
        bucket_factor=1.25,
    )
    assert set(exact) == set(padded)
    for k in exact:
        assert padded[k].shape == exact[k].shape
        np.testing.assert_allclose(padded[k], exact[k], rtol=1e-5, atol=1e-6)
    # ladder sanity: monotone, covers n, bounded blow-up
    for n in (1, 63, 64, 65, 1000, 12345):
        cap = bucket_capacity(n)
        assert cap >= max(n, 64) and cap <= max(64, int(np.ceil(n * 1.25)))
    # two scores in the same rung share every array shape (= one compile)
    ga = graph_from_note_array(
        synthetic_score(70, seed=1), add_beats=False, add_measures=False,
        bucket_factor=1.25,
    )
    gb = graph_from_note_array(
        synthetic_score(78, seed=2), add_beats=False, add_measures=False,
        bucket_factor=1.25,
    )
    assert ga.capacity(NOTE) == gb.capacity(NOTE)


def test_cli_batch_score_dir(tmp_path):
    """--score_dir batch mode: one CSV per score file into --output_dir."""
    from analysisgnn_tpu.cli import predict as predict_cli
    from analysisgnn_tpu.cli import train as train_cli

    ckpt = str(tmp_path / "ckpt")
    train_cli.main([
        "--demo", "--do_train",
        "--num_layers", "1", "--hidden_channels", "16", "--out_channels", "8",
        "--num_epochs", "1", "--subgraph_size", "24", "--batch_size", "20",
        "--main_tasks", "all", "--checkpoint_dir", ckpt,
        "--max_steps_per_epoch", "2",
    ])
    scores = tmp_path / "scores"
    scores.mkdir()
    (scores / "a.xml").write_text(SCORE_XML)
    (scores / "sub").mkdir()
    (scores / "sub" / "b.musicxml").write_text(SCORE_XML)
    # basename collision across subdirs must NOT overwrite
    (scores / "sub" / "a.xml").write_text(SCORE_XML)
    out_dir = tmp_path / "out"
    predict_cli.main([
        "--score_dir", str(scores), "--checkpoint_dir", ckpt,
        "--checkpoint", "last", "--output_dir", str(out_dir),
    ])
    got = sorted(os.listdir(out_dir))
    assert got == [
        "a_analysis.csv", "sub__a_analysis.csv", "sub__b_analysis.csv",
    ]
    rows = list(csv.reader(open(out_dir / "a_analysis.csv")))
    assert len(rows) == 7  # 6 notes + header

    # exactly one of --score / --score_dir
    with pytest.raises(SystemExit):
        predict_cli.main(["--checkpoint_dir", ckpt])


@pytest.mark.slow
def test_cli_partition_devices(tmp_path):
    """--partition_devices with an Orbax-RESTORED checkpoint: restored
    params arrive committed to one device and must be replicated over the
    mesh (regression: shard_map rejected single-device-committed params)."""
    from analysisgnn_tpu.cli import predict as predict_cli
    from analysisgnn_tpu.cli import train as train_cli

    ckpt = str(tmp_path / "ckpt")
    train_cli.main([
        "--demo", "--do_train",
        "--num_layers", "1", "--hidden_channels", "16", "--out_channels", "8",
        "--num_epochs", "1", "--subgraph_size", "24", "--batch_size", "20",
        "--main_tasks", "all", "--checkpoint_dir", ckpt,
        "--max_steps_per_epoch", "2",
    ])
    score = tmp_path / "score.xml"
    score.write_text(SCORE_XML)
    single = str(tmp_path / "single.csv")
    part = str(tmp_path / "part.csv")
    predict_cli.main([
        "--score", str(score), "--checkpoint_dir", ckpt, "--checkpoint", "last",
        "--output_csv", single,
    ])
    predict_cli.main([
        "--score", str(score), "--checkpoint_dir", ckpt, "--checkpoint", "last",
        "--output_csv", part, "--partition_devices", "4",
    ])
    assert open(single).read() == open(part).read()
