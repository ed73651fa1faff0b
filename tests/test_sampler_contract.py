"""Receptive-field contract: measure (not assume) how this sampler's per-hop
sampled-node distribution compares with the graphmuse loader's neighbor-
sampling contract, and pin the ``subgraph_sample_ratio`` epoch semantics
(VERDICT round-2 item 8).

The graphmuse C sampler (reference loader, analysisgnn/data/datamodules/
analysis.py:267-324) is uninstallable here (zero egress), so ``spec_sample``
below is a pure-python re-implementation of its documented contract:

  * hop 0 = a contiguous window of ``subgraph_size`` target notes;
  * per hop, per edge type, each frontier node draws up to ``k`` DISTINCT
    neighbors uniformly WITHOUT replacement (C reservoir sampling);
  * no node budgets; per-hop new-node counts are recorded
    (``num_sampled_nodes_dict``).

Since round 3 this repo's ``SubgraphSampler`` implements the same
uniform-WITHOUT-replacement per-node draws (sampler.py:251-275); the one
remaining documented difference is the static per-batch node budget (nodes
beyond the padded capacity are dropped).  The test quantifies the resulting
per-hop distribution delta and asserts it stays small, so the train-time
receptive-field difference is a measured number rather than an assumption.
"""

import numpy as np
import pytest

from analysisgnn_tpu.core.graph import NOTE
from analysisgnn_tpu.data.graph_build import build_score_graph
from analysisgnn_tpu.data.note_array import synthetic_score
from analysisgnn_tpu.data.features import select_features
from analysisgnn_tpu.data.sampler import SamplerConfig, ScoreSample, SubgraphSampler


def _score_sample(num_notes=1200, seed=0):
    na = synthetic_score(num_notes=num_notes, seed=seed)
    feats = select_features(na, "voice").astype(np.float32)
    g = build_score_graph(na, add_beats=False, add_measures=False)
    return ScoreSample(
        features={NOTE: feats},
        edges={et: np.asarray(ei) for et, ei in g.edges.items()},
        note_attrs={"valid_label": np.ones(len(na), np.int64)},
    )


def spec_sample(sample, subgraph_size, num_neighbors, rng):
    """Graphmuse-contract reference sampler (see module docstring).

    Returns per-hop new-node counts, hop 0 = targets.
    """
    n = sample.num_notes
    w = min(subgraph_size, n)
    start = int(rng.integers(0, n - w + 1)) if n > w else 0
    targets = np.arange(start, start + w)
    seen = np.zeros(n, bool)
    seen[targets] = True
    # adjacency per edge type, CSR by src
    adj = {}
    for et, ei in sample.edges.items():
        order = np.argsort(ei[0], kind="stable")
        src_s, dst_s = ei[0][order], ei[1][order]
        indptr = np.searchsorted(src_s, np.arange(n + 1))
        adj[et] = (indptr, dst_s)
    frontier = targets
    counts = [int(w)]
    for k in num_neighbors:
        new = []
        for et, (indptr, dst_s) in adj.items():
            for u in frontier:
                nbrs = dst_s[indptr[u] : indptr[u + 1]]
                if len(nbrs) == 0:
                    continue
                if len(nbrs) > k:
                    nbrs = rng.choice(nbrs, size=k, replace=False)
                fresh = nbrs[~seen[nbrs]]
                if len(fresh):
                    fresh = np.unique(fresh)
                    seen[fresh] = True
                    new.append(fresh)
        frontier = np.concatenate(new) if new else np.zeros(0, np.int64)
        counts.append(int(len(frontier)))
    return counts


@pytest.mark.parametrize("subgraph_size", [150])
def test_per_hop_distribution_matches_spec_within_tolerance(subgraph_size):
    """Mean per-hop sampled-node counts of SubgraphSampler vs the spec
    re-implementation: relative delta must stay under 10% per hop."""
    sample = _score_sample()
    trials = 600  # window-position noise dominates below ~400 trials
    num_neighbors = (5, 5)

    cfg = SamplerConfig(
        subgraph_size=subgraph_size, batch_size=1,
        num_neighbors=num_neighbors, seed=0, calibrate_batches=0,
        node_capacity_factor=4.0,  # budgets must not bind for this measure
    )
    sampler = SubgraphSampler([sample], cfg)
    ours = np.zeros((trials, len(num_neighbors) + 1))
    for t in range(trials):
        sampler._sample_one(0)
        ours[t] = [hc.get(NOTE, 0) for hc in sampler.last_hop_counts]

    rng = np.random.default_rng(1)
    spec = np.zeros_like(ours)
    for t in range(trials):
        spec[t] = spec_sample(sample, subgraph_size, num_neighbors, rng)

    ours_mean, spec_mean = ours.mean(0), spec.mean(0)
    # hop 0 (targets) must be exactly the window size in both
    assert ours_mean[0] == spec_mean[0] == subgraph_size
    rel = np.abs(ours_mean[1:] - spec_mean[1:]) / spec_mean[1:]
    # measured on this corpus at 2000 trials: 2.3% (hop 1) / 5.0% (hop 2)
    # mean per-hop delta (MIGRATION.md "sampler" section) — the bound below
    # leaves room for trial noise at 600
    assert (rel < 0.10).all(), (
        f"per-hop receptive field diverged from the graphmuse contract: "
        f"ours={ours_mean.tolist()} spec={spec_mean.tolist()} rel={rel.tolist()}"
    )


def test_subgraph_sample_ratio_epoch_semantics():
    """ratio r => one epoch yields ceil(r * num_graphs / batch_size) random
    batches (reference train loaders pass r=0.5)."""
    samples = [_score_sample(300, seed=s) for s in range(6)]
    cfg = SamplerConfig(
        subgraph_size=64, batch_size=2, num_neighbors=(3,),
        seed=0, calibrate_batches=0, subgraph_sample_ratio=0.5,
    )
    sampler = SubgraphSampler(samples, cfg)
    assert sampler.num_epoch_batches() == 2  # ceil(0.5 * 6 / 2)
    batches = list(sampler)
    assert len(batches) == 2

    cfg_full = SamplerConfig(
        subgraph_size=64, batch_size=2, num_neighbors=(3,),
        seed=0, calibrate_batches=0, subgraph_sample_ratio=1.0,
    )
    full = SubgraphSampler(samples, cfg_full)
    assert full.num_epoch_batches() == 3
    assert len(list(full)) == 3


def test_datamodule_applies_ratio_to_train_only():
    from analysisgnn_tpu.data.datamodule import AnalysisDataModule, DataModuleConfig

    samples = [_score_sample(300, seed=s) for s in range(8)]
    dm = AnalysisDataModule(
        {"all": samples},
        DataModuleConfig(
            subgraph_size=64, batch_size=2, random_split=True, augment=False,
            subgraph_sample_ratio=0.5,
        ),
    ).setup()
    tr = dm._train_samplers["all"]
    assert tr.cfg.subgraph_sample_ratio == 0.5
    assert dm.steps_per_epoch("all") == tr.num_epoch_batches()
    # val/test keep full deterministic passes
    for s in list(dm._val_samplers.values()) + list(dm._test_samplers.values()):
        assert s.cfg.subgraph_sample_ratio == 1.0
