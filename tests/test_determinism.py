"""Determinism: same seeds → identical samples, params, and training."""

import numpy as np
import jax

from analysisgnn_tpu.core.graph import NOTE, metadata
from analysisgnn_tpu.data.sampler import SamplerConfig, SubgraphSampler
from analysisgnn_tpu.models.analysis import AnalysisGNN

from tests.test_sampler import make_samples
from tests.test_train_step import TASKS, make_sampler


def test_sampler_deterministic():
    cfg = SamplerConfig(subgraph_size=32, batch_size=2, num_neighbors=(4,), seed=7)
    a = SubgraphSampler(make_samples(), cfg).sample_batch()
    b = SubgraphSampler(make_samples(), cfg).sample_batch()
    np.testing.assert_array_equal(
        np.asarray(a.node_features[NOTE]), np.asarray(b.node_features[NOTE])
    )
    for k in a.edge_index:
        np.testing.assert_array_equal(
            np.asarray(a.edge_index[k]), np.asarray(b.edge_index[k])
        )


def test_model_init_deterministic():
    sampler = make_sampler()
    batch = sampler.sample_batch([0, 1])
    nodes, edges = metadata(False, False)
    model = AnalysisGNN(
        metadata=(nodes, edges), in_channels=25, hidden_channels=16,
        out_channels=8, task_dict=TASKS, num_layers=1, dropout=0.0,
    )
    attrs = batch.node_attrs[NOTE]
    args = (
        batch.x_dict(), batch.edge_index_dict(), batch.batch,
        attrs["pitch_spelling"], attrs["key_signature"], batch.num_target_nodes,
    )
    p1 = model.init(jax.random.PRNGKey(3), *args)
    p2 = model.init(jax.random.PRNGKey(3), *args)
    same = jax.tree_util.tree_map(
        lambda a, b: np.array_equal(np.asarray(a), np.asarray(b)), p1, p2
    )
    assert all(jax.tree_util.tree_leaves(same))
    out1 = np.asarray(model.apply(p1, *args)["cadence"])
    out2 = np.asarray(model.apply(p2, *args)["cadence"])
    np.testing.assert_array_equal(out1, out2)
