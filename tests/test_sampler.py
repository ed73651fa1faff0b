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


def test_host_batch_matches_device_batch(sampler):
    """to_device=False yields a numpy-leaf pytree with identical contents —
    the prefetch-worker path ships it with one jax.device_put."""
    import jax

    cfg = SamplerConfig(subgraph_size=40, batch_size=2, num_neighbors=(5, 5), seed=5)
    samples = make_samples()
    b_dev = SubgraphSampler(samples, cfg).sample_batch([0, 1])
    b_host = SubgraphSampler(samples, cfg).sample_batch([0, 1], to_device=False)
    assert isinstance(b_host.node_features[NOTE], np.ndarray)
    assert isinstance(b_dev.node_features[NOTE], jax.Array)
    leaves_d = jax.tree.leaves(b_dev)
    leaves_h = jax.tree.leaves(b_host)
    assert len(leaves_d) == len(leaves_h)
    for ld, lh in zip(leaves_d, leaves_h):
        np.testing.assert_array_equal(np.asarray(ld), np.asarray(lh))


def test_spawned_workers_and_prefetch_pool(sampler):
    """spawn() clones draw from independent RNG streams (parent untouched);
    prefetch_workers yields exactly `steps` structurally valid batches."""
    from analysisgnn_tpu.data.prefetch import prefetch_workers

    before = sampler.rng.bit_generator.state
    workers = sampler.spawn(3)
    assert sampler.rng.bit_generator.state == before  # parent stream intact
    batches = list(
        prefetch_workers([w.sample_batch for w in workers], steps=7)
    )
    assert len(batches) == 7
    ref = sampler.sample_batch([0, 1])
    for b in batches:
        # same static shapes as the parent's batches (no recompiles)
        assert b.node_features[NOTE].shape == ref.node_features[NOTE].shape
        nt = int(b.num_target_nodes)
        assert 0 < nt <= b.node_features[NOTE].shape[0]


def test_prefetch_workers_propagates_errors():
    from analysisgnn_tpu.data.prefetch import prefetch_workers

    def boom():
        raise RuntimeError("worker failed")

    with pytest.raises(RuntimeError, match="worker failed"):
        list(prefetch_workers([boom, boom], steps=4))
