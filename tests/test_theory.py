"""Tonal arithmetic, encoders, and vocabulary parity tests."""

import os
import importlib.util

import numpy as np
import pytest

from analysisgnn_tpu.theory.tonal import (
    Interval,
    KS_FIFTHS_SHIFT,
    chord_to_interval_vector,
    transpose_key_name,
    transpose_pitch_name,
    transpose_step_alter,
)
from analysisgnn_tpu.theory.encoders import (
    CadenceEncoder,
    KeySignatureEncoder,
    PitchEncoder,
)
from analysisgnn_tpu.theory.vocab import (
    TASK_DICT,
    admissible_transpositions,
    available_representations,
)


# ---------------------------------------------------------------------------
# interval arithmetic
# ---------------------------------------------------------------------------

def test_interval_semitones():
    expected = {
        "P1": 0, "m2": 1, "M2": 2, "m3": 3, "M3": 4, "P4": 5, "A4": 6,
        "d5": 6, "P5": 7, "m6": 8, "M6": 9, "m7": 10, "M7": 11, "P8": 12,
    }
    for name, semis in expected.items():
        assert Interval.parse(name).semitones == semis, name


def test_ks_fifths_shift_line_of_fifths():
    # Derived line-of-fifths shifts.  The reference hardcodes a similar map at
    # utils/music.py:141-155 but with two enharmonic/buggy entries we
    # deliberately diverge from: reference m2→+7 spells the m2 target on the
    # sharp side (C→C#; true m2 is C→D-, LoF -5), and reference A4→+8 is out
    # of LoF range entirely (correct A4 shift is +6).
    want = {"P1": 0, "m2": -5, "M2": 2, "m3": -3, "M3": 4, "P4": -1, "A4": 6,
            "d5": -6, "P5": 1, "m6": -4, "M6": 3, "m7": -2, "M7": 5}
    for k, v in want.items():
        assert KS_FIFTHS_SHIFT[k] == v, k


def test_transpose_step_alter():
    assert transpose_step_alter("C", 0, "m3") == ("E", -1)
    assert transpose_step_alter("C", 1, "m3") == ("E", 0)
    assert transpose_step_alter("A", 0, "M3") == ("C", 1)
    assert transpose_step_alter("B", 0, "m2") == ("C", 0)
    assert transpose_step_alter("F", 1, "A4") == ("B", 1)
    assert transpose_step_alter("G", -1, "P5") == ("D", -1)


def test_transpose_pitch_and_key_names():
    assert transpose_pitch_name("C#", "m3") == "E"
    assert transpose_pitch_name("B-", "M2") == "C"
    assert transpose_key_name("c#", "m3") == "e"
    assert transpose_key_name("F", "P5") == "C"
    assert transpose_key_name("a-", "M7") == "g"


def test_interval_vector():
    # C major triad: C E G
    assert chord_to_interval_vector([60, 64, 67]) == [0, 0, 1, 1, 1, 0]
    iv, pcs = chord_to_interval_vector([60, 72, 64], return_pc_class=True)
    assert sorted(pcs) == [0, 4]
    assert iv == [0, 0, 0, 1, 0, 0]


# ---------------------------------------------------------------------------
# encoders
# ---------------------------------------------------------------------------

def test_pitch_encoder_roundtrip():
    enc = PitchEncoder()
    assert enc.num_classes == 35
    na = np.array(
        [("C", 0), ("C", 1), ("E", -1), ("B", 0)],
        dtype=[("step", "U2"), ("alter", "i4")],
    )
    ids = enc.encode(na)
    assert list(enc.decode(ids)) == ["C", "C#", "E-", "B"]
    sa = enc.decode_to_step_alter(ids)
    assert sa["step"].tolist() == ["C", "C", "E", "B"]
    assert sa["alter"].tolist() == [0, 1, -1, 0]


def test_pitch_encoder_transposition():
    enc = PitchEncoder()
    na = np.array([("C", 0), ("G", 0)], dtype=[("step", "U2"), ("alter", "i4")])
    ids = enc.encode(na)
    up_m3 = enc.transpose(ids, "m3")
    assert list(enc.decode(up_m3)) == ["E-", "B-"]
    # F-- transposed by A4 would be B--- → out of vocab → must raise
    na2 = np.array([("F", -2)], dtype=[("step", "U2"), ("alter", "i4")])
    ids2 = enc.encode(na2)
    assert list(enc.decode(ids2)) == ["F--"]
    with pytest.raises(ValueError):
        enc.transpose(ids2, "d5")


def test_key_signature_encoder():
    enc = KeySignatureEncoder()
    assert enc.encode_dim == 15
    ids = enc.encode(np.array([-7, 0, 7]))
    assert ids.tolist() == [0, 7, 14]
    up = enc.transpose(enc.encode(np.array([0])), "P5")
    assert enc.decode(up).tolist() == [1]
    with pytest.raises(ValueError):
        enc.transpose(enc.encode(np.array([7])), "P5")


def test_cadence_encoder():
    enc = CadenceEncoder()
    assert enc.encode_from_text("PAC") == 1
    assert enc.encode_from_text("EC") == 4 == enc.encode_from_text("DC")
    labels = enc.encode_onsets(
        np.array([0, 4, 4, 8]), np.array([4]), ["HC"]
    )
    assert labels.tolist() == [0, 3, 3, 0]


# ---------------------------------------------------------------------------
# vocabularies
# ---------------------------------------------------------------------------

def test_vocab_sizes():
    reps = available_representations()
    assert reps["localkey"].num_classes == 50
    assert reps["tonkey"].num_classes == 50
    assert reps["root"].num_classes == 38
    assert reps["bass"].num_classes == 38
    assert reps["degree1"].num_classes == 22
    assert reps["pcset"].num_classes == 94
    assert reps["note_degree"].num_classes == 49
    assert reps["romanNumeral76"].num_classes == 76
    assert len(TASK_DICT) == 21


def test_key_representation_transposition():
    reps = available_representations()
    lk = reps["localkey"]
    c = lk.encode(["C"])[0]
    assert lk.decode(lk.transpose_ids(np.array([c]), "M2")) == ["D"]
    a_min = lk.encode(["a"])[0]
    assert lk.decode(lk.transpose_ids(np.array([a_min]), "m3")) == ["c"]


def test_pcset_representation():
    reps = available_representations()
    pc = reps["pcset"]
    cmaj = pc.encode([(0, 4, 7)])[0]
    assert pc.decode([cmaj]) == [(0, 4, 7)]
    up = pc.transpose_ids(np.array([cmaj]), "M2")
    assert pc.decode(up) == [(2, 6, 9)]
    # unknown set → last class
    assert pc.encode_value((0, 1, 2)) == pc.num_classes - 1


def test_quality_and_inversion():
    reps = available_representations()
    q = reps["quality"]
    assert q.encode_value("major triad") == 0
    assert q.encode_value("garbage") == q.num_classes - 1
    inv = reps["inversion"]
    assert inv.encode_value(2) == 2
    assert inv.encode_value(7) == 0
    assert inv.encode_value(None) == 0


def test_admissible_transpositions():
    # C major alone admits nearly everything.
    admissible = admissible_transpositions(["C"])
    assert "M2" in admissible and "P5" in admissible
    # extreme keys restrict the set
    tight = admissible_transpositions(["C", "g#", "d#", "a#"])
    assert "A4" not in tight


# ---------------------------------------------------------------------------
# parity vs the reference vocabulary source (when mounted)
# ---------------------------------------------------------------------------

REF_GLOBALS = "/root/reference/analysisgnn/utils/globals.py"


@pytest.mark.skipif(not os.path.exists(REF_GLOBALS), reason="reference not mounted")
def test_vocab_parity_with_reference():
    spec = importlib.util.spec_from_file_location("ref_globals", REF_GLOBALS)
    ref = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref)
    reps = available_representations()
    assert reps["localkey"].class_list == list(ref.EMPIRICAL_KEYS.values())
    assert reps["root"].class_list == list(ref.EMPIRICAL_TONE_FUNCTIONS.values())
    assert reps["quality"].class_list == ref.CHORD_QUALITIES
    assert reps["degree1"].class_list == list(ref.M21_DEGREES)
    assert reps["note_degree"].class_list == ref.NOTE_DEGREES
    assert reps["romanNumeral76"].class_list == ref.COMMON_ROMAN_NUMERALS
    assert reps["romanNumeral"].class_list == ref.SIMPLE_NUMERAL_VOCABULARY
    want_pcsets = [tuple(p) if isinstance(p, tuple) else p for p in ref.PCSETS]
    assert reps["pcset"].class_list == want_pcsets
