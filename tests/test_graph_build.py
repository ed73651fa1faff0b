"""Vectorized graph builder vs the O(N²) reference-spec brute force."""

import numpy as np

from analysisgnn_tpu.core.graph import BEAT, MEASURE, NOTE
from analysisgnn_tpu.data.graph_build import (
    build_score_graph,
    multi_arange,
    reference_edges_bruteforce,
)
from analysisgnn_tpu.data.note_array import make_note_array, synthetic_score
from analysisgnn_tpu.data.features import select_features, voice_features


def edge_set(a):
    return set(map(tuple, np.asarray(a).T.tolist()))


def test_multi_arange():
    got = multi_arange(np.array([3, 10, 0]), np.array([2, 0, 3]))
    assert got.tolist() == [3, 4, 0, 1, 2]
    assert multi_arange(np.array([], np.int64), np.array([], np.int64)).size == 0


def test_builder_matches_bruteforce_small():
    na = make_note_array(
        onset_div=[0, 0, 4, 4, 8, 16, 16, 20],
        duration_div=[4, 8, 4, 4, 4, 4, 2, 4],
        pitch=[60, 64, 67, 72, 65, 60, 64, 62],
    )
    g = build_score_graph(na, add_beats=False, add_measures=False)
    ref = reference_edges_bruteforce(na)
    for rel in ("onset", "consecutive", "during", "rest"):
        assert edge_set(g.edges[(NOTE, rel, NOTE)]) == edge_set(ref[rel]), rel


def test_builder_matches_bruteforce_random():
    for seed in range(4):
        na = synthetic_score(num_notes=80, seed=seed)
        g = build_score_graph(na, add_beats=False, add_measures=False)
        ref = reference_edges_bruteforce(na)
        for rel in ("onset", "consecutive", "during", "rest"):
            assert edge_set(g.edges[(NOTE, rel, NOTE)]) == edge_set(ref[rel]), (
                seed,
                rel,
            )


def test_reverse_edges():
    na = synthetic_score(num_notes=40, seed=1)
    g = build_score_graph(na, add_beats=False, add_measures=False)
    cons = g.edges[(NOTE, "consecutive", NOTE)]
    rev = g.edges[(NOTE, "consecutive_rev", NOTE)]
    assert edge_set(rev) == {(b, a) for a, b in edge_set(cons)}


def test_beat_and_measure_nodes():
    na = make_note_array(
        onset_div=[0, 4, 8, 12, 16, 20, 24, 28],
        duration_div=[4] * 8,
        pitch=[60, 62, 64, 65, 67, 69, 71, 72],
        divs_per_beat=4,
        ts_beats=4,
    )
    g = build_score_graph(na, add_beats=True, add_measures=True)
    # onset beats are 0..7 → beats 0..6 (reference: arange(int(max)))
    assert g.num_beats == 7
    nb = g.edges[(NOTE, "connects", BEAT)]
    # note at beat 7 has no beat node
    assert 7 not in nb[0][nb[1] == 7] if g.num_beats <= 7 else True
    assert edge_set(g.edges[(BEAT, "connects", NOTE)]) == {
        (b, n) for n, b in edge_set(nb)
    }
    bb = g.edges[(BEAT, "next", BEAT)]
    assert (bb[1] - bb[0] == 1).all()
    # measures: 4 beats each → notes 0-3 in measure 0, 4-7 in measure 1
    nm = g.edges[(NOTE, "connects", MEASURE)]
    assert g.num_measures == 2
    assert nm[1][:4].tolist() == [0] * 4 and nm[1][4:].tolist() == [1] * 4


def test_measures_from_spans():
    na = make_note_array(
        onset_div=[0, 4, 8, 12], duration_div=[4] * 4, pitch=[60, 62, 64, 65]
    )
    spans = np.array([[0, 8], [8, 16]])
    g = build_score_graph(na, measures=spans, add_beats=False, add_measures=True)
    nm = g.edges[(NOTE, "connects", MEASURE)]
    assert nm[1].tolist() == [0, 0, 1, 1]


def test_voice_features_shape_and_semantics():
    na = make_note_array(
        onset_div=[0, 2, 4], duration_div=[4, 2, 8], pitch=[60, 64, 67],
        divs_per_beat=4, ts_beats=4,
    )
    f = voice_features(na)
    assert f.shape == (3, 25)
    # duration feature: 1 - tanh(dur_beat / ts)
    np.testing.assert_allclose(f[0, 0], 1 - np.tanh(1 / 4), rtol=1e-6)
    # onset bar-normalized position
    np.testing.assert_allclose(f[1, 1], 0.5 / 4, rtol=1e-6)
    # downbeat flag: onset_beat 0 and 1 are integer; 0.5 is not
    assert f[0, 2] == 1.0 and f[1, 2] == 0.0 and f[2, 2] == 1.0
    # pitch-class one-hot
    assert f[0, 3 + 0] == 1.0 and f[1, 3 + 4] == 1.0
    # octave one-hot
    assert f[0, 15 + 5] == 1.0


def test_select_features_dispatch():
    na = synthetic_score(num_notes=24, seed=2)
    assert select_features(na, "voice").shape[1] == 25
    assert select_features(na, "simple").shape[1] == 25
    cad = select_features(na, "cadence")
    assert cad.shape[1] == 25 + 31
    assert np.isfinite(cad).all()


def test_cadence_descriptors_semantics():
    import numpy as np
    from analysisgnn_tpu.data.features import (
        CADENCE_DESCRIPTOR_NAMES,
        cadence_descriptors,
    )

    # two-voice cadence: V (G2,B4,D4,F4) → I (C3,C5,E4,G4)
    na = make_note_array(
        onset_div=[0, 0, 0, 0, 4, 4, 4, 4],
        duration_div=[4] * 8,
        pitch=[43, 71, 62, 65, 48, 72, 64, 67],
        voice=[2, 1, 1, 1, 2, 1, 1, 1],
    )
    f = cadence_descriptors(na)
    assert f.shape == (8, 31)
    col = {n: i for i, n in enumerate(CADENCE_DESCRIPTOR_NAMES)}
    # the I chord is a perfect major triad
    i_chord_rows = np.flatnonzero(na["onset_div"] == 4)
    assert f[i_chord_rows, col["perfect_triad"]].all()
    assert f[i_chord_rows, col["perfect_major_triad"]].all()
    # the V7-less dominant still spots has_7=False
    assert not f[:, col["has_7"]].any()
    # bass voice flags: voice 2 has lower mean pitch
    bass_rows = np.flatnonzero(na["voice"] == 2)
    assert f[bass_rows, col["bass_voice"]].all()
    # bass motion G2→C3 is a V-I fifth: +5 semitones = compatible_v-i? diff = 43-48 = -5
    c3 = np.flatnonzero((na["pitch"] == 48))
    assert f[c3, col["bass_compatible_v-i"]].all()
    # last-onset notes have no next voice notes → voice_ends
    assert f[i_chord_rows, col["voice_ends"]].all()
    assert np.isfinite(f).all()


def test_homogeneous_graph_view():
    from analysisgnn_tpu.data.graph_build import (
        ETYPE_IDS,
        build_score_graph,
        homogeneous_graph_from_note_array,
    )
    from analysisgnn_tpu.data.note_array import synthetic_score

    na = synthetic_score(num_notes=60, seed=0)
    ei, et = homogeneous_graph_from_note_array(na)
    g = build_score_graph(na, add_beats=False, add_measures=False)
    base = {rel: 0 for rel in ETYPE_IDS}
    for k, v in g.edges.items():
        if k[1] in base:
            base[k[1]] += v.shape[1]
    assert ei.shape[1] == et.shape[0] == sum(base.values())
    for rel, tid in ETYPE_IDS.items():
        assert int((et == tid).sum()) == base[rel]
