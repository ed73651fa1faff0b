"""Native C++ graph builder: parity with the numpy builder + speed sanity."""

import time

import numpy as np
import pytest

from analysisgnn_tpu.core.graph import NOTE
from analysisgnn_tpu.data.graph_build import build_score_graph
from analysisgnn_tpu.data.native import build_note_edges_native, native_available
from analysisgnn_tpu.data.note_array import synthetic_score


def edge_set(a):
    return set(map(tuple, np.asarray(a).T.tolist()))


@pytest.mark.skipif(not native_available(), reason="no C++ toolchain")
def test_native_matches_numpy():
    for seed in range(3):
        na = synthetic_score(num_notes=150, seed=seed)
        native = build_note_edges_native(na["onset_div"], na["duration_div"])
        g = build_score_graph(na, add_beats=False, add_measures=False, use_native=False)
        for rel in ("onset", "consecutive", "during", "rest"):
            assert edge_set(native[rel]) == edge_set(g.edges[(NOTE, rel, NOTE)]), (
                seed,
                rel,
            )


@pytest.mark.skipif(not native_available(), reason="no C++ toolchain")
def test_native_used_by_default():
    na = synthetic_score(num_notes=100, seed=0)
    g_native = build_score_graph(na, add_beats=False, add_measures=False)
    g_numpy = build_score_graph(na, add_beats=False, add_measures=False, use_native=False)
    for rel in ("onset", "consecutive", "during", "rest"):
        assert edge_set(g_native.edges[(NOTE, rel, NOTE)]) == edge_set(
            g_numpy.edges[(NOTE, rel, NOTE)]
        )


@pytest.mark.skipif(not native_available(), reason="no C++ toolchain")
def test_native_faster_on_large_scores():
    na = synthetic_score(num_notes=4000, seed=0)
    t0 = time.perf_counter()
    build_note_edges_native(na["onset_div"], na["duration_div"])
    t_native = time.perf_counter() - t0
    t0 = time.perf_counter()
    build_score_graph(na, add_beats=False, add_measures=False, use_native=False)
    t_numpy = time.perf_counter() - t0
    # native should never be dramatically slower; typically much faster
    assert t_native < t_numpy * 2.0, (t_native, t_numpy)
