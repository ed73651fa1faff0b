"""Chord inference chain: latest vocabularies, OnsetEdgePooling/coalesce,
SpellingAwareChordEncoder variants, predict-chords CLI end-to-end."""

import os

import numpy as np
import pytest

from analysisgnn_tpu.core.graph import NOTE, metadata
from analysisgnn_tpu.theory.vocab import (
    TASK_DICT_LATEST,
    available_representations_latest,
)


def test_latest_representations_sizes_and_roundtrip():
    reps = available_representations_latest()
    assert set(reps) == set(TASK_DICT_LATEST)
    for task, n in TASK_DICT_LATEST.items():
        assert reps[task].num_classes == n, (task, reps[task].num_classes, n)
    # key representation round-trips and transposes
    lk = reps["localkey"]
    cid = lk.encode_value("C")
    assert lk.decode(np.array([cid])) == ["C"]
    table = lk.reindex_table("P5")
    assert lk.decode(np.array([table[cid]])) == ["G"]
    # SATB voices share the 35-spelling list
    b = reps["bass"]
    assert b.num_classes == 35
    t = b.reindex_table("M2")
    assert b.decode(np.array([t[b.encode_value("C")]])) == ["D"]


def test_latest_pcset_transposition():
    reps = available_representations_latest()
    pc = reps["pcset"]
    cid = pc.encode_value((0, 4, 7))
    shifted = pc.reindex_table("M2")[cid]
    assert tuple(pc.decode(np.array([shifted]))[0]) == (2, 6, 9)


def test_coalesce_dedupes_and_sorts():
    import jax.numpy as jnp

    from analysisgnn_tpu.kernels.segment_ops import coalesce

    ei = jnp.asarray([[2, 0, 2, 1, 0], [1, 3, 1, 0, 3]])
    out, count = coalesce(ei, 4)
    assert int(count) == 3
    got = np.asarray(out)[:, :3]
    np.testing.assert_array_equal(got, [[0, 1, 2], [3, 0, 1]])
    # padding slots use the sentinel
    assert (np.asarray(out)[:, 3:] == 4).all()


def test_onset_edge_pooling_keeps_one_per_clique():
    import jax
    import jax.numpy as jnp

    from analysisgnn_tpu.models.chord import OnsetEdgePooling

    # two onset cliques: {0,1,2} and {3,4}; node 5 isolated
    edges = []
    for grp in ((0, 1, 2), (3, 4)):
        for i in grp:
            for j in grp:
                if i != j:
                    edges.append((i, j))
    ei = jnp.asarray(np.array(edges).T)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(6, 8)).astype(np.float32))
    mod = OnsetEdgePooling(hidden=8)
    params = mod.init(jax.random.PRNGKey(0), x, ei)
    h, keep = mod.apply(params, x, ei)
    np.testing.assert_array_equal(
        np.asarray(keep), [True, False, False, True, False, True]
    )
    assert h.shape == (6, 8)
    # pooled row equals mean of trans(x) over the clique incl. self
    kernel = params["params"]["trans"]["kernel"]
    bias = params["params"]["trans"]["bias"]
    t = np.asarray(x) @ np.asarray(kernel) + np.asarray(bias)
    np.testing.assert_allclose(
        np.asarray(h)[0], t[[0, 1, 2]].mean(0), rtol=1e-5
    )


def test_spelling_aware_chord_encoder_shapes():
    import jax
    import jax.numpy as jnp

    from analysisgnn_tpu.data.corpus import samples_from_note_array
    from analysisgnn_tpu.data.note_array import synthetic_score
    from analysisgnn_tpu.data.sampler import SamplerConfig, SubgraphSampler
    from analysisgnn_tpu.models.chord import (
        HybridChordEncoder,
        SpellingAwareChordEncoder,
    )

    na = synthetic_score(40, seed=0)
    labels = {"valid_label": np.ones(len(na), np.int64)}
    samples = samples_from_note_array(
        na, name="s", labels=labels, add_beats=False, add_measures=False
    )
    sampler = SubgraphSampler(
        samples, SamplerConfig(subgraph_size=32, batch_size=1)
    )
    batch = sampler.sample_batch([0])
    nodes, edges = metadata(False, False)
    attrs = batch.node_attrs[NOTE]
    n = batch.node_features[NOTE].shape[0]
    pitch = jnp.asarray(np.arange(n) % 128)
    onset_ei = batch.edges((NOTE, "onset", NOTE))

    enc = SpellingAwareChordEncoder(hidden=16, num_layers=1, edge_types=edges)
    params = enc.init(
        jax.random.PRNGKey(0),
        batch.x_dict(), batch.edge_index_dict(), batch.batch,
        pitch, attrs["pitch_spelling"], onset_ei,
    )
    seq, keep = enc.apply(
        params,
        batch.x_dict(), batch.edge_index_dict(), batch.batch,
        pitch, attrs["pitch_spelling"], onset_ei,
    )
    assert seq.shape == (n, 16)
    assert keep.dtype == bool and bool(keep.any())

    hyb = HybridChordEncoder(hidden=16, num_layers=1, edge_types=edges)
    p2 = hyb.init(
        jax.random.PRNGKey(0),
        attrs["pitch_spelling"], batch.x_dict(),
        batch.edge_index_dict(), batch.batch,
    )
    out = hyb.apply(
        p2, attrs["pitch_spelling"], batch.x_dict(),
        batch.edge_index_dict(), batch.batch,
    )
    assert out.shape == (n, 16)


def test_predict_chords_cli_end_to_end(tmp_path):
    from tests.test_inference_cli import SCORE_XML

    from analysisgnn_tpu.inference import predict_chords

    score = tmp_path / "mini.musicxml"
    score.write_text(SCORE_XML)
    out_dir = tmp_path / "out"
    predict_chords.main(
        [
            "--input_score", str(score),
            "--output_dir", str(out_dir),
            "--hidden", "16",
            "--num_layers", "1",
            "--romantext",
        ]
    )
    assert (out_dir / "mini_rna.musicxml").exists()
    assert (out_dir / "mini.rntxt").exists()
    txt = (out_dir / "mini.rntxt").read_text()
    assert "m1" in txt


def test_resolve_annotations_logic():
    from analysisgnn_tpu.inference.predict_chords import resolve_annotations

    decoded = {
        "hrhythm": [0, 0, 1, 0],
        "localkey": ["C", "C", "C", "G"],
        "tonkey": ["C", "C", "C", "G"],
        "pcset": [(0, 4, 7), (2, 5, 7, 11), (0, 4, 7), (2, 7, 11)],
        "romanNumeral": ["I", "V7", "I", "I"],
        "bass": ["C", "G", "C", "G"],
        "tenor": ["E", "B", "E", "B"],
        "alto": ["G", "D", "G", "D"],
        "soprano": ["C", "F", "C", "G"],
    }
    out = resolve_annotations(decoded, np.array([0, 4, 8, 12]))
    # row 2 dropped (hrhythm != 0); key prefixes on changes
    assert out[0][0] == "C:I"
    assert out[1][0] == "V7"
    assert out[2][0] == "G:I"
