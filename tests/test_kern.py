"""Humdrum **kern parser: durations, chords, ties, spines, key/time sigs."""

import numpy as np
import pytest

from analysisgnn_tpu.data.kern import _parse_pitch, _recip_duration, parse_kern

KERN = """**kern\t**kern
*clefF4\t*clefG2
*k[f#]\t*k[f#]
*M4/4\t*M4/4
=1\t=1
2GG\t4g 4b 4dd
.\t4g 4b 4dd
4G\t8a
.\t8b
4G\t4g
=2\t=2
[2D\t2f# 2a
2D]\t2g 2b
==\t==
*-\t*-
"""


def test_recip_durations():
    from fractions import Fraction

    assert _recip_duration("4c") == 1
    assert _recip_duration("8a") == Fraction(1, 2)
    assert _recip_duration("2.G") == 3  # dotted half = 3 quarters
    assert _recip_duration("12e") == Fraction(1, 3)
    assert _recip_duration("0A") == 8
    assert _recip_duration("16dd") == Fraction(1, 4)


def test_kern_pitches():
    assert _parse_pitch("4c") == ("C", 0, 4)
    assert _parse_pitch("8cc#") == ("C", 1, 5)
    assert _parse_pitch("2C") == ("C", 0, 3)
    assert _parse_pitch("4BB-") == ("B", -1, 2)
    assert _parse_pitch("4g") == ("G", 0, 4)


def test_parse_kern_score():
    ps = parse_kern(KERN)
    na = ps.note_array
    # measure spans from barlines
    assert ps.measures.shape[0] >= 2
    # key signature: one sharp
    assert np.all(na["ks_fifths"] == 1)
    assert np.all(na["ts_beats"] == 4)
    # first simultaneity: GG (half, G2=43) + g/b/dd chord
    first = na[na["onset_div"] == 0]
    assert len(first) == 4
    assert sorted(first["pitch"].tolist()) == [43, 67, 71, 74]
    # the half-note GG sustains through the second quarter slice
    gg = first[first["pitch"] == 43][0]
    assert gg["duration_beat"] == pytest.approx(2.0)
    # tie: [2D ... 2D] merges into ONE note (D3=50) of whole-note duration
    d_notes = na[na["pitch"] == 50]
    assert len(d_notes) == 1
    assert d_notes[0]["duration_beat"] == pytest.approx(4.0)
    # two staves assigned
    assert set(na["staff"].tolist()) == {1, 2}


def test_load_score_dispatches_krn(tmp_path):
    from analysisgnn_tpu.data.musicxml import load_score

    p = tmp_path / "piece.krn"
    p.write_text(KERN)
    ps = load_score(str(p))
    assert len(ps.note_array) > 0


def test_kern_through_graph_pipeline():
    from analysisgnn_tpu.data.features import select_features
    from analysisgnn_tpu.data.graph_build import build_score_graph

    ps = parse_kern(KERN)
    feats = select_features(ps.note_array, "voice")
    assert feats.shape == (len(ps.note_array), 25)
    g = build_score_graph(ps.note_array, add_beats=True, add_measures=True)
    assert g.edges[("note", "onset", "note")].shape[1] > 0
