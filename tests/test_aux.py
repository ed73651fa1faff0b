"""Aux subsystems: download framework, samplers, metrics, explain, viz."""

import json
import os
import zipfile

import numpy as np
import jax.numpy as jnp
import pytest

from analysisgnn_tpu.data.download import (
    check_sha1,
    extract_archive,
    get_download_dir,
    sha1_of_file,
)
from analysisgnn_tpu.data.note_array import synthetic_score
from analysisgnn_tpu.data.samplers import BySequenceLengthSampler, SubgraphCreationSampler
from analysisgnn_tpu.train.metrics import linear_assignment_score, roc_auc
from analysisgnn_tpu.utils.graph_utils import degree, laplacian_positional_encoding
from analysisgnn_tpu.utils.visualization import graph_to_json, pianoroll_svg


def test_sha1_and_extract(tmp_path):
    p = tmp_path / "x.txt"
    p.write_text("hello")
    h = sha1_of_file(str(p))
    assert check_sha1(str(p), h)
    assert not check_sha1(str(p), "0" * 40)
    z = tmp_path / "a.zip"
    with zipfile.ZipFile(z, "w") as zf:
        zf.writestr("inner/data.txt", "content")
    out = extract_archive(str(z), str(tmp_path / "out"))
    assert (tmp_path / "out" / "inner" / "data.txt").read_text() == "content"


def test_download_dir_env(tmp_path, monkeypatch):
    monkeypatch.setenv("ANALYSISGNN_TPU_DATA_DIR", str(tmp_path / "dd"))
    assert get_download_dir() == str(tmp_path / "dd")
    assert os.path.isdir(str(tmp_path / "dd"))


def test_by_sequence_length_sampler():
    lengths = [10, 12, 100, 110, 1000, 1050, 11]
    s = BySequenceLengthSampler(lengths, [50, 500], batch_size=2, seed=0)
    batches = list(iter(s))
    for b in batches:
        ls = [lengths[i] for i in b]
        # all members of a batch share a bucket
        assert max(ls) < 50 or (50 <= min(ls) and max(ls) < 500) or min(ls) >= 500
    covered = sorted(i for b in batches for i in b)
    assert covered == list(range(7))


def test_subgraph_creation_sampler():
    sizes = [500, 8000, 40000]
    s = SubgraphCreationSampler(sizes, batch_size=4, seed=0)
    pool = s.index_pool
    # bigger graphs appear more often
    c = np.bincount(pool, minlength=3)
    assert c[0] < c[1] < c[2]
    assert len(list(iter(s))) == len(s)


def test_roc_auc():
    scores = jnp.asarray([0.9, 0.8, 0.3, 0.1])
    labels = jnp.asarray([1, 1, 0, 0])
    w = jnp.ones(4, bool)
    assert float(roc_auc(scores, labels, w)) == 1.0
    flipped = float(roc_auc(-scores, labels, w))
    assert flipped == 0.0
    # degenerate: single class → 0.5
    assert float(roc_auc(scores, jnp.ones(4, int), w)) == 0.5


def test_linear_assignment_score_perfect_matching():
    # 4 nodes, predicted edges forming perfect matching 0→1, 2→3
    ei = jnp.asarray([[0, 2], [1, 3]])
    scores = jnp.asarray([0.9, 0.9])
    mask = jnp.ones(4, bool)
    s = float(linear_assignment_score(ei, scores, mask, 4))
    # rows 0,2 have degree 1; rows 1,3 zero; cols mirrored → nonzero deviation
    assert s >= 0


def test_degree_and_lap_pe():
    na = synthetic_score(30, seed=0)
    from analysisgnn_tpu.data.graph_build import build_score_graph
    from analysisgnn_tpu.core.graph import NOTE

    g = build_score_graph(na, add_beats=False, add_measures=False)
    ei = g.edges[(NOTE, "consecutive", NOTE)]
    d = degree(np.asarray(ei), len(na))
    assert d.shape == (30,) and d.sum() == ei.shape[1]
    pe = laplacian_positional_encoding(np.asarray(ei), len(na), k=4)
    assert pe.shape == (30, 4)
    assert np.isfinite(pe).all()


def test_visualization_exports():
    na = synthetic_score(20, seed=0)
    svg = pianoroll_svg(na)
    assert svg.startswith("<svg") and "rect" in svg
    from analysisgnn_tpu.data.graph_build import build_score_graph

    g = build_score_graph(na, add_beats=False, add_measures=False)
    j = json.loads(graph_to_json(na, g.edges))
    assert len(j["nodes"]) == 20
    assert {l["type"] for l in j["links"]} >= {"onset", "consecutive"}


def test_explain_fidelity():
    import jax

    from analysisgnn_tpu.utils.explain import hetero_fidelity

    et = ("note", "onset", "note")
    ei = {et: jnp.asarray([[0, 1, 2], [1, 2, 3]])}
    labels = {"t": jnp.asarray([0, 0, 1, 1])}
    w = jnp.ones(4, bool)

    def logits_fn(edge_dict):
        # predictions flip for nodes that lose their incoming edge
        src = edge_dict[et][0]
        has_edge = jnp.zeros(4).at[jnp.minimum(edge_dict[et][1], 3)].add(
            jnp.where(src < 4, 1.0, 0.0)
        )
        return {"t": jnp.stack([has_edge, 1 - has_edge], -1)}

    mask = {et: jnp.asarray([True, False, False])}
    fid_p, fid_m = hetero_fidelity(
        logits_fn, ei, mask, labels, w, {"note": 4}
    )
    assert np.isfinite(float(fid_p["t"])) and np.isfinite(float(fid_m["t"]))


def test_prefetch_iterator():
    from analysisgnn_tpu.data.prefetch import prefetch, prefetch_calls

    out = list(prefetch(iter(range(10)), buffer_size=3))
    assert out == list(range(10))
    counter = {"n": 0}

    def make():
        counter["n"] += 1
        return counter["n"]

    assert list(prefetch_calls(make, 5)) == [1, 2, 3, 4, 5]

    def boom():
        raise ValueError("x")

    with pytest.raises(ValueError):
        list(prefetch_calls(boom, 3))


def test_voice_from_edges_components():
    from analysisgnn_tpu.utils.graph_utils import voice_from_edges

    # two chains {0,1,2} and {3,4}, isolated node 5 → 3 voices
    edges = np.array([[0, 1, 3], [1, 2, 4]])
    voices, n = voice_from_edges(edges, 6)
    assert n == 3
    assert voices.min() == 1
    assert voices[0] == voices[1] == voices[2]
    assert voices[3] == voices[4]
    assert len({voices[0], voices[3], voices[5]}) == 3


def test_adj_matrix_from_edges_drops_out_of_range():
    from analysisgnn_tpu.utils.graph_utils import adj_matrix_from_edges

    edges = np.array([[0, 1, 7], [1, 2, 0]])  # the (7, 0) edge is padding
    a = adj_matrix_from_edges(edges, 3)
    assert a.shape == (3, 3)
    assert a.nnz == 2


def test_node_subgraph_induced_and_relabeled():
    from analysisgnn_tpu.utils.graph_utils import node_subgraph

    nn = ("note", "consecutive", "note")
    nb = ("note", "onset_in", "beat")
    bn = ("beat", "contains", "note")
    edges = {
        nn: np.array([[0, 1, 2, 4], [1, 2, 3, 5]]),
        nb: np.array([[0, 1, 2, 3, 4, 5], [0, 0, 1, 1, 2, 2]]),
        bn: np.array([[0, 0, 1, 1, 2, 2], [0, 1, 2, 3, 4, 5]]),
    }
    # keep a NON-contiguous note set (the reference helper cannot do this)
    sub, keep = node_subgraph(edges, {"note": 6, "beat": 3}, np.array([1, 2, 4]))
    assert list(keep["note"]) == [1, 2, 4]
    assert list(keep["beat"]) == [0, 1, 2]  # all beats touch a kept note
    # only the 1→2 note edge survives; relabeled to 0→1
    assert sub[nn].tolist() == [[0], [1]]
    # note→beat edges for kept notes, beat ids unchanged (all kept)
    assert sub[nb].tolist() == [[0, 1, 2], [0, 1, 2]]
    # dropping note 4 also drops beat 2
    sub2, keep2 = node_subgraph(edges, {"note": 6, "beat": 3}, np.array([1, 2]))
    assert list(keep2["beat"]) == [0, 1]
    assert sub2[bn].shape[1] == 2


def test_batch_graphs_disjoint_union():
    from analysisgnn_tpu.utils.graph_utils import batch_graphs

    nn = ("note", "consecutive", "note")
    nb = ("note", "onset_in", "beat")
    g0 = {nn: np.array([[0, 1], [1, 2]]), nb: np.array([[0, 1, 2], [0, 0, 1]])}
    g1 = {nn: np.array([[0], [1]])}
    edges, offsets = batch_graphs(
        [g0, g1], [{"note": 3, "beat": 2}, {"note": 2, "beat": 0}]
    )
    assert offsets["note"].tolist() == [0, 3]
    assert offsets["beat"].tolist() == [0, 2]
    assert edges[nn].tolist() == [[0, 1, 3], [1, 2, 4]]
    assert edges[nb].tolist() == [[0, 1, 2], [0, 0, 1]]
