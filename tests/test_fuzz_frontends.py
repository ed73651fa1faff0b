"""Fuzz/mutation hardening of the three data front-ends.

Real corpora are unreachable in this environment (zero egress), so this
suite substitutes the next-best evidence: hostile mutations of MusicXML
(`data/musicxml.py`), **kern (`data/kern.py`) and DLC TSV (`data/tsv.py`)
inputs — truncations, mixed/invalid encodings, missing divisions, tuplet
and tie edge cases, the reference's documented ``prob_pieces`` failure
modes (reference data/datasets/dlc.py:71-88: unparseable or label-broken
pieces skipped by name).

Contract asserted for every mutation: **parse-or-clean-skip** —
the parser either returns a structurally sane result (invariants below)
or raises a normal Python exception that the corpus layer's
skip-on-error loop (`data/corpus.py:221-225`) converts into a recorded
skip. Never a crash of the process, never a hang (parsers are wrapped in
the ``exit_after`` watchdog — `utils/general.py::parse_budget_s`), and
never silently corrupt output (pitch out of [0,128), negative
onsets/durations, label rows misaligned with note rows).
"""

import os
import zlib

import numpy as np
import pandas as pd
import pytest

from analysisgnn_tpu.data.kern import parse_kern
from analysisgnn_tpu.data.musicxml import load_score, parse_musicxml
from analysisgnn_tpu.data.tsv import (
    create_labels_dlc,
    load_pitch_array,
    note_array_from_df,
)
from tests.test_corpus_datamodule import make_dlc_df
from tests.test_kern import KERN
from tests.test_musicxml import SCORE


def check_note_array(ps) -> None:
    """Structural sanity of any successfully parsed score."""
    na = ps.note_array
    assert len(na) > 0
    assert np.all(na["pitch"] >= 0) and np.all(na["pitch"] < 128)
    assert np.all(na["onset_div"] >= 0)
    assert np.all(na["duration_div"] >= 0)
    assert np.all(np.isfinite(na["onset_beat"]))
    assert np.all(np.isfinite(na["duration_beat"]))
    assert np.all(na["ts_beats"] >= 1) and np.all(na["ts_beat_type"] >= 1)
    # onsets sorted (pipeline contract for graph building)
    assert np.all(np.diff(na["onset_div"].astype(np.int64)) >= 0)
    if ps.measures is not None and len(ps.measures):
        m = np.asarray(ps.measures)
        assert m.ndim == 2 and m.shape[1] == 2
        assert np.all(m[:, 1] >= m[:, 0])


def parse_or_skip(fn, *args):
    """The corpus-layer contract: a sane parse, or a clean exception."""
    try:
        out = fn(*args)
    except Exception:
        return None  # clean skip — corpus.load records and continues
    return out


# --------------------------------------------------------------------------
# MusicXML mutations
# --------------------------------------------------------------------------

MXL_MUTATIONS = {
    # truncations at structural boundaries
    "truncate-half": lambda s: s[: len(s) // 2],
    "truncate-mid-tag": lambda s: s[: s.index("<duration>4</duration>") + 7],
    "truncate-after-header": lambda s: s[: s.index("<part id=")],
    "empty-file": lambda s: "",
    "only-xml-decl": lambda s: '<?xml version="1.0"?>',
    # encoding hostility
    "binary-garbage": lambda s: "\x00\x01\xff\xfe not xml at all",
    "latin1-bytes": lambda s: s.replace(
        "<score-partwise", "<!-- caf\xe9 \xff -->\n<score-partwise", 1
    ),
    "bom-prefix": lambda s: "﻿" + s,
    # structure hostility
    "wrong-root": lambda s: s.replace("score-partwise", "score-timewise"),
    "no-parts": lambda s: s[: s.index("<part id=")] + "</score-partwise>",
    "duplicate-part-ids": lambda s: s.replace('id="P2"', 'id="P1"'),
    "nested-junk-tags": lambda s: s.replace(
        "<voice>1</voice>", "<voice>1</voice><junk><deep><deeper/></deep></junk>"
    ),
    # missing / degenerate divisions (beats fall back to a sane default)
    "no-divisions": lambda s: s.replace("<divisions>2</divisions>", "").replace(
        "<divisions>1</divisions>", ""
    ),
    "zero-divisions": lambda s: s.replace(
        "<divisions>2</divisions>", "<divisions>0</divisions>"
    ),
    "negative-divisions": lambda s: s.replace(
        "<divisions>2</divisions>", "<divisions>-3</divisions>"
    ),
    "huge-divisions": lambda s: s.replace(
        "<divisions>2</divisions>", "<divisions>960000</divisions>"
    ),
    # note-level hostility
    "missing-duration": lambda s: s.replace("<duration>2</duration>", "", 1),
    "negative-duration": lambda s: s.replace(
        "<duration>2</duration>", "<duration>-2</duration>", 1
    ),
    "non-numeric-duration": lambda s: s.replace(
        "<duration>2</duration>", "<duration>abc</duration>", 1
    ),
    "absurd-octave": lambda s: s.replace("<octave>4</octave>", "<octave>99</octave>", 1),
    "negative-octave": lambda s: s.replace("<octave>4</octave>", "<octave>-7</octave>", 1),
    "bad-step": lambda s: s.replace("<step>A</step>", "<step>H</step>", 1),
    "missing-pitch-children": lambda s: s.replace(
        "<pitch><step>A</step><octave>4</octave></pitch>", "<pitch></pitch>", 1
    ),
    "alter-float": lambda s: s.replace(
        "<alter>1</alter>", "<alter>0.5</alter>", 1
    ),  # quarter-tone alter: must coerce or skip, not crash
    # tie edge cases
    "tie-start-never-stopped": lambda s: s.replace('<tie type="stop"/>', ""),
    "tie-stop-without-start": lambda s: s.replace('<tie type="start"/>', ""),
    "tie-both-on-one-note": lambda s: s.replace(
        '<tie type="start"/>', '<tie type="start"/><tie type="stop"/>'
    ),
    # rests-only / chord-first pathologies
    "all-rests": lambda s: s.replace("<pitch>", "<rest/><wrong-pitch>").replace(
        "</pitch>", "</wrong-pitch>"
    ),
    "chord-flag-on-first-note": lambda s: s.replace(
        "<note><pitch><step>G</step><octave>4</octave></pitch><duration>4</duration>",
        "<note><chord/><pitch><step>G</step><octave>4</octave></pitch><duration>4</duration>",
        1,
    ),
    # backup/forward abuse (common in hostile exports)
    "backup-past-zero": lambda s: s.replace(
        "<measure number=\"2\">",
        "<measure number=\"2\"><backup><duration>99999</duration></backup>",
        1,
    ),
}


@pytest.mark.parametrize("name", sorted(MXL_MUTATIONS))
def test_musicxml_mutation(name, tmp_path):
    text = MXL_MUTATIONS[name](SCORE)
    p = tmp_path / f"{name}.xml"
    p.write_bytes(text.encode("latin-1", errors="ignore"))
    ps = parse_or_skip(load_score, str(p))
    if ps is not None:
        check_note_array(ps)


def test_musicxml_valid_still_parses(tmp_path):
    """Mutation harness sanity: the unmutated score parses clean."""
    p = tmp_path / "ok.xml"
    p.write_text(SCORE)
    ps = load_score(str(p))
    check_note_array(ps)
    assert len(ps.note_array) == 6


def test_mxl_corrupt_zip(tmp_path):
    p = tmp_path / "broken.mxl"
    p.write_bytes(b"PK\x03\x04" + b"\x00" * 64)  # zip magic, garbage body
    assert parse_or_skip(load_score, str(p)) is None


def test_mxl_zip_without_rootfile(tmp_path):
    import zipfile

    p = tmp_path / "norook.mxl"
    with zipfile.ZipFile(p, "w") as z:
        z.writestr("META-INF/container.xml", "<container></container>")
        z.writestr("something.txt", "hello")
    ps = parse_or_skip(load_score, str(p))
    if ps is not None:
        check_note_array(ps)


def test_musicxml_tuplet_time_modification(tmp_path):
    """Triplets via <time-modification> must keep the div grid consistent."""
    triplet = SCORE.replace(
        "<note><pitch><step>A</step><octave>4</octave></pitch><duration>2</duration><voice>1</voice></note>",
        "".join(
            "<note><pitch><step>A</step><octave>4</octave></pitch>"
            "<duration>1</duration><voice>1</voice>"
            "<time-modification><actual-notes>3</actual-notes>"
            "<normal-notes>2</normal-notes></time-modification></note>"
            for _ in range(2)
        ),
    )
    p = tmp_path / "trip.xml"
    p.write_text(triplet)
    ps = parse_or_skip(load_score, str(p))
    if ps is not None:
        check_note_array(ps)


# --------------------------------------------------------------------------
# **kern mutations
# --------------------------------------------------------------------------

KERN_MUTATIONS = {
    "truncate-half": lambda s: s[: len(s) // 2],
    "truncate-mid-token": lambda s: s[: s.index("4G")],
    "empty": lambda s: "",
    "header-only": lambda s: "**kern\t**kern\n",
    "no-terminator": lambda s: s.replace("*-\t*-\n", ""),
    "ragged-columns": lambda s: s.replace("4G\t8a", "4G\t8a\t4c\t4e", 1),
    "missing-column": lambda s: s.replace("4G\t8a", "4G", 1),
    "binary-garbage": lambda s: "\x00\xffnot kern\x01",
    "comments-everywhere": lambda s: "\n".join(
        line if i % 2 else "!! fuzz comment %d" % i
        for i, line in enumerate(s.splitlines())
    ),
    # spine operations the simple path may not model
    "spine-split": lambda s: s.replace("=1\t=1", "=1\t=1\n*^\t*", 1),
    "spine-merge-unopened": lambda s: s.replace("=2\t=2", "*v\t*v\n=2\t=2", 1),
    "spine-add": lambda s: s.replace("=2\t=2", "*+\t*\n=2\t=2", 1),
    # duration / pitch hostility
    "zero-recip": lambda s: s.replace("4G", "0G", 1),  # breve: valid
    "huge-recip": lambda s: s.replace("4G", "4096G", 1),
    "no-recip": lambda s: s.replace("4G", "G", 1),
    "bad-pitch-letter": lambda s: s.replace("4G", "4Q", 1),
    "multi-accidental": lambda s: s.replace("2f#", "2f###", 1),
    "tuplet-recips": lambda s: s.replace("8a", "12a", 1).replace("8b", "24b", 1),
    # tie hostility
    "unclosed-tie": lambda s: s.replace("2D]", "2D", 1),
    "unopened-tie-close": lambda s: s.replace("[2D", "2D", 1),
    "tie-across-wrong-pitch": lambda s: s.replace("2D]", "2E]", 1),
    # structure
    "duplicate-barlines": lambda s: s.replace("=1\t=1", "=1\t=1\n=1\t=1", 1),
    "no-barlines": lambda s: s.replace("=1\t=1\n", "").replace("=2\t=2\n", ""),
    "measure-number-garbage": lambda s: s.replace("=1\t=1", "=abc\t=abc", 1),
    "key-sig-garbage": lambda s: s.replace("*k[f#]\t*k[f#]", "*k[zz]\t*k[??]", 1),
    "timesig-garbage": lambda s: s.replace("*M4/4\t*M4/4", "*M0/0\t*Mx/y", 1),
    "mixed-exclusive-spines": lambda s: s.replace("**kern\t**kern", "**kern\t**dynam"),
    "null-tokens-everywhere": lambda s: s.replace("4g 4b 4dd", ".", 1),
    "crlf-line-endings": lambda s: s.replace("\n", "\r\n"),
    "grace-note-q": lambda s: s.replace("8a", "qa", 1),
}


@pytest.mark.parametrize("name", sorted(KERN_MUTATIONS))
def test_kern_mutation(name):
    text = KERN_MUTATIONS[name](KERN)
    ps = parse_or_skip(parse_kern, text)
    if ps is not None:
        check_note_array(ps)


def test_kern_valid_still_parses():
    ps = parse_kern(KERN)
    check_note_array(ps)


# --------------------------------------------------------------------------
# DLC TSV mutations
# --------------------------------------------------------------------------


def _tsv_roundtrip(df, tmp_path, name):
    p = tmp_path / f"{name}.tsv"
    df.to_csv(p, sep="\t", index=False)
    return str(p)


def _mut_drop_random_bytes(raw: bytes) -> bytes:
    rng = np.random.RandomState(zlib.crc32(raw) & 0xFFFF)
    keep = rng.rand(len(raw)) > 0.02
    return bytes(b for b, k in zip(raw, keep) if k)


TSV_MUTATIONS = {
    "truncate-half": lambda raw: raw[: len(raw) // 2],
    "truncate-mid-row": lambda raw: raw[: raw.index(b"\n", len(raw) // 2) - 3],
    "empty": lambda raw: b"",
    "header-only": lambda raw: raw.split(b"\n", 1)[0] + b"\n",
    "binary-garbage": lambda raw: b"\x00\x01\x02\xfe\xff" * 40,
    "random-byte-drop": _mut_drop_random_bytes,
    "mixed-encoding": lambda raw: raw.replace(b"C", b"C\xe9", 3),
    "comma-separated": lambda raw: raw.replace(b"\t", b","),
    "quoted-cells-with-tabs": lambda raw: raw.replace(b"\nC", b'\n"C\tx"', 2),
    "dos-line-endings": lambda raw: raw.replace(b"\n", b"\r\n"),
}


@pytest.mark.parametrize("name", sorted(TSV_MUTATIONS))
def test_tsv_byte_mutation(name, tmp_path):
    raw = make_dlc_df(32).to_csv(sep="\t", index=False).encode()
    p = tmp_path / f"{name}.tsv"
    p.write_bytes(TSV_MUTATIONS[name](raw))
    df = parse_or_skip(load_pitch_array, str(p))
    if df is None or len(df) == 0:
        return
    out = parse_or_skip(note_array_from_df, df)
    if out is not None and out[0] is not None and len(out[0]):
        na = out[0]
        assert np.all(na["pitch"] >= 0) and np.all(na["pitch"] < 128)
        assert np.all(na["duration_div"] >= 0)


TSV_FRAME_MUTATIONS = {
    "onset-divs-descending": lambda df: df.assign(
        onset_div=df["onset_div"].iloc[::-1].to_numpy()
    ),
    "all-same-onset": lambda df: df.assign(onset_div=0, onset_beat=0.0),
    "pitch-out-of-range": lambda df: df.assign(
        pitch=np.where(np.arange(len(df)) % 7 == 0, 300, df["pitch"])
    ),
    "pitch-negative": lambda df: df.assign(
        pitch=np.where(np.arange(len(df)) % 9 == 0, -5, df["pitch"])
    ),
    "duration-negative": lambda df: df.assign(
        duration_div=np.where(np.arange(len(df)) % 5 == 0, -4, df["duration_div"])
    ),
    "infinite-beats": lambda df: df.assign(
        onset_beat=np.where(np.arange(len(df)) % 11 == 0, np.inf, df["onset_beat"])
    ),
    "string-pitch-column": lambda df: df.assign(pitch=df["pitch"].astype(str) + "x"),
    "label-cells-nan": lambda df: df.assign(
        a_localKey=np.where(np.arange(len(df)) % 3 == 0, np.nan, df["a_localKey"])
    ),
    "label-cells-unknown-vocab": lambda df: df.assign(a_localKey="Z##"),
    "duplicate-columns": lambda df: pd.concat([df, df[["pitch"]]], axis=1),
}


@pytest.mark.parametrize("name", sorted(TSV_FRAME_MUTATIONS))
def test_tsv_frame_mutation(name, tmp_path):
    df = TSV_FRAME_MUTATIONS[name](make_dlc_df(32))
    p = _tsv_roundtrip(df, tmp_path, name)
    loaded = parse_or_skip(load_pitch_array, p)
    if loaded is None:
        return
    out = parse_or_skip(note_array_from_df, loaded)
    if out is None or out[0] is None or len(out[0]) == 0:
        return
    na = out[0]
    assert np.all(na["pitch"] >= 0) and np.all(na["pitch"] < 128)
    assert np.all(na["duration_div"] >= 0)
    assert np.all(np.isfinite(na["onset_beat"]))
    # labels built from the same cleaned frame must stay row-aligned
    labels = parse_or_skip(create_labels_dlc, loaded)
    if labels is not None:
        for k, v in labels.items():
            assert v.shape[0] == len(loaded), (name, k)


# --------------------------------------------------------------------------
# Corpus layer: a directory of hostile files never crashes the build
# --------------------------------------------------------------------------


def test_corpus_skips_hostile_directory(tmp_path):
    """The reference skips known-bad pieces by NAME (prob_pieces,
    dlc.py:71-88); this corpus must skip them by BEHAVIOR: any file the
    front-end rejects is recorded in ``corpus.errors`` and the build
    continues with whatever parses."""
    from analysisgnn_tpu.data.corpus import CorpusConfig, DLCTsvCorpus

    d = tmp_path / "all"
    d.mkdir()
    # two good files
    for i in range(2):
        make_dlc_df(24).to_csv(d / f"good{i}.tsv", sep="\t", index=False)
    # hostile files spanning the byte-mutation families
    (d / "empty.tsv").write_bytes(b"")
    (d / "garbage.tsv").write_bytes(b"\x00\xff\x01" * 50)
    (d / "headeronly.tsv").write_text("pitch\tonset_div\n")
    raw = make_dlc_df(24).to_csv(sep="\t", index=False).encode()
    (d / "truncated.tsv").write_bytes(raw[: len(raw) // 3])
    corpus = DLCTsvCorpus(
        CorpusConfig(cache_dir=str(tmp_path / ".cache"), transpose=False),
        source_dir=str(tmp_path),
    )
    corpus.load()
    assert len(corpus.samples) >= 2  # the good pieces made it
    bad = {os.path.basename(p) for p, _ in corpus.errors}
    # every recorded error names a hostile file, never a good one
    assert not any(b.startswith("good") for b in bad)


def test_watchdog_wired_on_parsers():
    """All three front-ends run under the exit_after watchdog so a
    pathological file can stall a build for at most the parse budget
    (reference bounds per-score work the same way — hgraph.py:111,303)."""
    import analysisgnn_tpu.data.kern as K
    import analysisgnn_tpu.data.musicxml as M
    import analysisgnn_tpu.data.tsv as T

    for fn in (K.parse_kern, M.parse_musicxml, T.load_pitch_array):
        assert getattr(fn, "__wrapped__", None) is not None, fn


def test_parse_budget_env_override(monkeypatch):
    from analysisgnn_tpu.utils.general import parse_budget_s

    monkeypatch.setenv("AGT_PARSE_BUDGET_S", "7.5")
    assert parse_budget_s() == 7.5
