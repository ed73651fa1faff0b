"""Subgraph sampler: shapes static, targets-first, edges valid."""

import numpy as np
import pytest

from analysisgnn_tpu.core.graph import NOTE
from analysisgnn_tpu.data.features import select_features
from analysisgnn_tpu.data.graph_build import build_score_graph
from analysisgnn_tpu.data.note_array import synthetic_score
from analysisgnn_tpu.data.sampler import SamplerConfig, ScoreSample, SubgraphSampler
from analysisgnn_tpu.theory.encoders import KeySignatureEncoder, PitchEncoder


def make_samples(n_scores=3, notes=120):
    samples = []
    for s in range(n_scores):
        na = synthetic_score(num_notes=notes, seed=s)
        feats = select_features(na, "voice")
        g = build_score_graph(na, add_beats=True, add_measures=True)
        features = {
            NOTE: feats,
            "beat": np.zeros((max(g.num_beats, 1), feats.shape[1]), np.float32),
            "measure": np.zeros((max(g.num_measures, 1), feats.shape[1]), np.float32),
        }
        attrs = {
            "pitch_spelling": PitchEncoder().encode(na),
            "key_signature": KeySignatureEncoder().encode(na),
            "cadence": np.random.default_rng(s).integers(0, 4, size=len(na)),
            "onset_div": na["onset_div"].astype(np.int64),
        }
        samples.append(ScoreSample(features=features, edges=g.edges, note_attrs=attrs, name=f"s{s}"))
    return samples


@pytest.fixture(scope="module")
def sampler():
    cfg = SamplerConfig(subgraph_size=40, batch_size=2, num_neighbors=(5, 5), seed=0)
    return SubgraphSampler(make_samples(), cfg)


def test_static_shapes_across_batches(sampler):
    b1 = sampler.sample_batch()
    b2 = sampler.sample_batch()
    assert b1.node_features[NOTE].shape == b2.node_features[NOTE].shape
    for k in b1.edge_index:
        assert b1.edge_index[k].shape == b2.edge_index[k].shape


def test_targets_first_and_batch_vector(sampler):
    b = sampler.sample_batch([0, 1])
    nt = int(b.num_target_nodes)
    assert nt == 80  # 2 graphs × 40 targets
    batch = np.asarray(b.batch[NOTE])[:nt]
    # targets blocked per graph: first 40 are graph 0, next 40 graph 1
    assert (batch[:40] == 0).all() and (batch[40:80] == 1).all()


def test_edges_reference_valid_nodes(sampler):
    b = sampler.sample_batch([0, 1])
    for et in b.edge_types:
        key_src, _, key_dst = et
        ei = np.asarray(b.edges(et))
        ne = int(b.num_edges["__".join(et)])
        n_src = int(b.num_nodes[key_src])
        n_dst = int(b.num_nodes[key_dst])
        assert (ei[0, :ne] < n_src).all(), et
        assert (ei[1, :ne] < n_dst).all(), et
        # padding points one past the end (capacity-filled values >= n)
        if ne < ei.shape[1]:
            assert (ei[0, ne:] >= n_src).all(), et


def test_attrs_follow_nodes(sampler):
    b = sampler.sample_batch([0, 0])
    nt = int(b.num_target_nodes)
    ps = np.asarray(b.node_attrs[NOTE]["pitch_spelling"])[:nt]
    assert (ps >= 0).all() and (ps < 35).all()


def test_onset_edges_consistent(sampler):
    """Sampled onset edges must connect notes with equal onset_div of the
    same graph."""
    b = sampler.sample_batch([0, 1])
    ei = np.asarray(b.edges((NOTE, "onset", NOTE)))
    ne = int(b.num_edges["note__onset__note"])
    onset = np.asarray(b.node_attrs[NOTE]["onset_div"])
    batch = np.asarray(b.batch[NOTE])
    src, dst = ei[0, :ne], ei[1, :ne]
    assert (onset[src] == onset[dst]).all()
    assert (batch[src] == batch[dst]).all()


def test_iteration_covers_dataset(sampler):
    batches = list(iter(sampler))
    assert len(batches) == 2  # 3 scores / batch_size 2 → 2 batches
