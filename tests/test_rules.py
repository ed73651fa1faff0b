"""Rule-based cadence detectors + panalysis feature set."""

import numpy as np

from analysisgnn_tpu.data.note_array import make_note_array
from analysisgnn_tpu.theory.rules import (
    chord_to_interval_vector,
    detect_authentic_cadences,
    detect_cadences_intvec,
)


def test_interval_vector_known_chords():
    # major triad C-E-G → (0,0,1,1,1,0)
    assert chord_to_interval_vector([60, 64, 67]) == [0, 0, 1, 1, 1, 0]
    # dominant seventh G-B-D-F → (0,1,2,1,1,1)
    assert chord_to_interval_vector([55, 59, 62, 65]) == [0, 1, 2, 1, 1, 1]
    # single note / empty → zeros
    assert chord_to_interval_vector([60]) == [0] * 6
    assert chord_to_interval_vector([]) == [0] * 6
    # octave duplicates collapse
    assert chord_to_interval_vector([60, 72, 64, 67]) == [0, 0, 1, 1, 1, 0]


def _cadence_score():
    """Two bars: G7 (V7 in C) for a bar, then C major arrival downbeat,
    soprano 2->1, bass 5->1."""
    onsets = [0, 0, 0, 0, 4, 4, 4]
    durs = [4, 4, 4, 4, 4, 4, 4]
    # G2 B3 F4 D5(=74) -> C3 E4 C5(=72)
    pitches = [43, 59, 65, 74, 48, 64, 72]
    return make_note_array(onsets, durs, pitches, divs_per_beat=1, ts_beats=4)


def test_detect_authentic_cadence_on_v_i():
    na = _cadence_score()
    hits = detect_authentic_cadences(na, bar_in_beats=4.0)
    assert 4.0 in hits


def test_detect_authentic_cadence_negative():
    # same rhythm but static harmony (no V-I) → no hit
    onsets = [0, 0, 0, 4, 4, 4]
    durs = [4, 4, 4, 4, 4, 4]
    pitches = [48, 64, 72, 48, 64, 72]
    na = make_note_array(onsets, durs, pitches, divs_per_beat=1, ts_beats=4)
    assert detect_authentic_cadences(na, bar_in_beats=4.0) == []


def test_intvec_scan_flags_dominant_window():
    na = _cadence_score()
    hits = detect_cadences_intvec(na, window_beats=4.0, step=1.0)
    # the windows over the pure-G7 sonority match the V7 template with P4/P5
    # between the two lowest pitch classes
    assert len(hits) >= 1 and min(hits) < 4.0


def test_panalysis_feature_block():
    from analysisgnn_tpu.data.features import select_features

    na = _cadence_score()
    f = select_features(na, "panalysis")
    assert f.shape == (len(na), 25)
    # column 0 is 1 - tanh(dur/ts)
    np.testing.assert_allclose(
        f[:, 0], 1 - np.tanh(na["duration_beat"] / na["ts_beats"]), rtol=1e-6
    )
    # last column is the downbeat flag
    assert set(f[:, -1]) <= {0.0, 1.0}
