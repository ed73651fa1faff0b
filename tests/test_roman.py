"""Roman-numeral engine: exact parity of the generated ``frompcset`` with the
reference constant table, plus resolution-chain behavior."""

import ast
import os

import numpy as np
import pytest

from analysisgnn_tpu.theory import roman

_REF = "/root/reference/analysisgnn/utils/globals.py"


def _load_reference_frompcset():
    tree = ast.parse(open(_REF).read())
    for node in tree.body:
        if (
            isinstance(node, ast.Assign)
            and getattr(node.targets[0], "id", "") == "frompcset"
        ):
            return ast.literal_eval(node.value)
    raise AssertionError("frompcset not found")


@pytest.mark.skipif(not os.path.exists(_REF), reason="reference not mounted")
def test_frompcset_exact_parity_with_reference():
    ref = _load_reference_frompcset()
    gen = roman.build_frompcset()
    assert set(gen) == set(ref), (
        sorted(set(ref) - set(gen))[:5],
        sorted(set(gen) - set(ref))[:5],
    )
    for pcs in ref:
        assert set(gen[pcs]) == set(ref[pcs]), (pcs, gen[pcs].keys(), ref[pcs].keys())
        for key in ref[pcs]:
            g, r = gen[pcs][key], ref[pcs][key]
            assert g["chord"] == r["chord"], (pcs, key, g, r)
            assert g["quality"] == r["quality"], (pcs, key, g, r)
            assert g["rn"] == r["rn"], (pcs, key, g, r)
    # iteration order matches the sorted literal order (tie-break parity)
    assert list(gen) == sorted(gen)


def test_latest_vocab_sizes():
    v = roman.latest_vocab()
    assert len(v["KEYS"]) == 38
    assert len(v["CHORD_QUALITIES"]) == 11
    assert len(v["COMMON_ROMAN_NUMERALS"]) == 31
    assert len(v["PCSETS"]) == 121
    assert len(roman.SPELLINGS) == 35


def test_weber_distance_basics():
    assert roman.weber_euclidean("C", "C") == 0.0
    # closely-related keys are nearer than remote ones
    assert roman.weber_euclidean("C", "G") < roman.weber_euclidean("C", "F#")
    assert roman.weber_euclidean("C", "a") < roman.weber_euclidean("C", "e-")


def test_tonicization_scale_degree():
    assert roman.get_tonicization_scale_degree("C", "G") == "V"
    assert roman.get_tonicization_scale_degree("C", "a") == "vi"
    assert roman.get_tonicization_scale_degree("C", "C") == "I"
    assert roman.get_tonicization_scale_degree("c", "E-") == "III"
    assert roman.get_tonicization_scale_degree("c", "A-") == "VI"  # hack path
    assert roman.get_tonicization_scale_degree("c", "B-") == "bVII"
    assert roman.get_tonicization_scale_degree("C", "d") == "ii"
    assert roman.get_tonicization_scale_degree("a", "e") == "v"


def test_resolve_roman_numeral_dominant_seventh():
    # G7 in C major, root position: B-T-A-S = G B D F
    rn, label = roman.resolve_roman_numeral_cosine(
        "G", "B", "D", "F", (2, 5, 7, 11), "C", "V7", "C"
    )
    assert rn == "V7"
    assert label == "G7"


def test_resolve_roman_numeral_inversion():
    # first-inversion C major triad (bass E)
    rn, label = roman.resolve_roman_numeral_cosine(
        "E", "G", "C", "E", (0, 4, 7), "C", "I", "C"
    )
    assert rn == "I6"
    assert label == "Cmaj/E"


def test_resolve_roman_numeral_tonicization():
    # D major triad in C major context, tonicized G → V/V
    rn, label = roman.resolve_roman_numeral_cosine(
        "D", "F#", "A", "D", (2, 6, 9), "C", "V", "G"
    )
    assert rn == "V/V"
    assert label.startswith("Dmaj")


def test_resolve_forces_tonicization_when_key_absent():
    # E major triad with predicted tonicized key C (E maj not in C's entry)
    rn, label = roman.resolve_roman_numeral_cosine(
        "E", "G#", "B", "E", (4, 8, 11), "C", "V", "C"
    )
    assert "/" in rn  # resolved as secondary
    assert label.startswith("Emaj")


def test_cadential_six_four():
    # Cad with bass G (2nd inversion tonic triad) → Cad64
    rn, _ = roman.resolve_roman_numeral_cosine(
        "G", "C", "E", "G", (0, 4, 7), "C", "Cad", "C"
    )
    assert rn == "Cad64"


def test_format_helpers():
    assert roman.format_chord_label("Cmaj") == "C"
    # the maj-strip only applies to labels ENDING in "maj" (reference
    # formatChordLabel, chord_representations.py:638-643)
    assert roman.format_chord_label("D-maj/F") == "Dbmaj/F"
    assert roman.format_chord_label("E-min7") == "Ebmin7"
    assert roman.format_roman_numeral("I/I", "C") == "I"


def test_solve_chord_segmentation():
    import pandas as pd

    df = pd.DataFrame(
        {"hrhythm": [0, 1, 0, np.nan], "x": ["a", "b", "c", "d"]}
    )
    out = roman.solve_chord_segmentation(df)
    assert list(out["x"]) == ["a", "c"]


def test_generate_romantext():
    txt = roman.generate_romantext(
        [("C:I", 1, 1), ("V7", 1, 3), ("I", 2, 1)],
        time_signatures={(1, 1): "4/4"},
        composer="W. A. Mozart",
        title="K. 158",
    )
    assert "Composer: W. A. Mozart" in txt
    assert "m1 C: I" in txt
    assert "b3 V7" in txt
    assert "m2 I" in txt


def test_closest_pcset():
    assert roman.closest_pcset((0, 4, 7)) == (0, 4, 7)
    # a non-vocabulary set resolves to a nearby one
    out = roman.closest_pcset((0, 1, 2))
    assert out in roman.build_frompcset()
