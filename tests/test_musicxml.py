"""MusicXML parser tests on a handwritten two-part score."""

import io
import zipfile

import numpy as np
import pytest

from analysisgnn_tpu.data.musicxml import parse_musicxml, load_score

SCORE = """<?xml version="1.0"?>
<score-partwise version="3.1">
  <part-list><score-part id="P1"/><score-part id="P2"/></part-list>
  <part id="P1">
    <measure number="1">
      <attributes>
        <divisions>2</divisions>
        <key><fifths>1</fifths><mode>major</mode></key>
        <time><beats>4</beats><beat-type>4</beat-type></time>
      </attributes>
      <note><pitch><step>G</step><octave>4</octave></pitch><duration>4</duration><voice>1</voice></note>
      <note><chord/><pitch><step>B</step><octave>4</octave></pitch><duration>4</duration><voice>1</voice></note>
      <note><pitch><step>A</step><octave>4</octave></pitch><duration>2</duration><voice>1</voice></note>
      <note><pitch><step>F</step><alter>1</alter><octave>4</octave></pitch><duration>2</duration><voice>1</voice>
        <tie type="start"/></note>
    </measure>
    <measure number="2">
      <note><pitch><step>F</step><alter>1</alter><octave>4</octave></pitch><duration>8</duration><voice>1</voice>
        <tie type="stop"/></note>
    </measure>
  </part>
  <part id="P2">
    <measure number="1">
      <attributes><divisions>1</divisions></attributes>
      <note><pitch><step>G</step><octave>2</octave></pitch><duration>4</duration><voice>5</voice><staff>2</staff></note>
    </measure>
    <measure number="2">
      <note><pitch><step>D</step><octave>3</octave></pitch><duration>4</duration><voice>5</voice><staff>2</staff></note>
    </measure>
  </part>
</score-partwise>
"""


@pytest.fixture(scope="module")
def parsed(tmp_path_factory):
    p = tmp_path_factory.mktemp("mxml") / "t.xml"
    p.write_text(SCORE)
    return load_score(str(p))


def test_note_count_after_tie_merge(parsed):
    # 4 P1 events (tie merged) + 2 P2 notes = 6
    assert len(parsed.note_array) == 6


def test_onsets_and_divs(parsed):
    # onsets normalized to the minimal global grid (1 div = 1 quarter here)
    na = parsed.note_array
    assert parsed.divs_per_quarter == 1
    g4 = na[na["pitch"] == 67][0]
    assert g4["onset_div"] == 0 and g4["duration_div"] == 2
    b4 = na[na["pitch"] == 71][0]  # chord note shares onset
    assert b4["onset_div"] == 0 and b4["duration_div"] == 2
    a4 = na[na["pitch"] == 69][0]
    assert a4["onset_div"] == 2
    fs4 = na[na["pitch"] == 66][0]  # tied across barline: 1 + 4 quarters
    assert fs4["onset_div"] == 3 and fs4["duration_div"] == 5


def test_key_and_time(parsed):
    na = parsed.note_array
    assert (na["ks_fifths"] == 1).all()
    assert (na["ts_beats"] == 4).all() and (na["ts_beat_type"] == 4).all()


def test_second_part_aligned(parsed):
    na = parsed.note_array
    g2 = na[na["pitch"] == 43][0]
    assert g2["onset_div"] == 0 and g2["duration_div"] == 4
    d3 = na[na["pitch"] == 50][0]
    assert d3["onset_div"] == 4
    assert d3["staff"] == 2 and d3["voice"] == 5


def test_measures(parsed):
    assert parsed.measures.tolist() == [[0, 4], [4, 8]]


def test_mxl_container(tmp_path):
    p = tmp_path / "t.mxl"
    with zipfile.ZipFile(p, "w") as z:
        z.writestr(
            "META-INF/container.xml",
            '<container><rootfiles><rootfile full-path="score.xml"/></rootfiles></container>',
        )
        z.writestr("score.xml", SCORE)
    parsed = load_score(str(p))
    assert len(parsed.note_array) == 6


def test_pipeline_from_musicxml(parsed):
    from analysisgnn_tpu.data.features import select_features
    from analysisgnn_tpu.data.graph_build import build_score_graph

    feats = select_features(parsed.note_array, "voice")
    assert feats.shape == (6, 25)
    g = build_score_graph(parsed.note_array, measures=parsed.measures)
    assert g.num_measures == 2
