"""Mesh sharding: DP+TP train step on the virtual 8-device CPU mesh."""

import numpy as np
import jax
import pytest

from analysisgnn_tpu.distributed.mesh import make_mesh


def test_mesh_axes():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = make_mesh(8)
    assert mesh.shape["data"] * mesh.shape["model"] == 8
    assert mesh.shape["model"] == 2


@pytest.mark.slow
def test_dryrun_multichip_runs():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_entry_compiles():
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert all(np.isfinite(np.asarray(v)).all() for v in out.values())


def test_sharded_train_step_matches_unsharded_values():
    """A DP+TP-sharded train step must produce the SAME loss and the SAME
    updated parameters as the identical step run unsharded on one device —
    numerical certification of the mesh path (VERDICT round-2 item 4),
    small-scale companion of the reference-scale check inside
    ``__graft_entry__.dryrun_multichip``."""
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import dataclasses

    import __graft_entry__ as ge
    from analysisgnn_tpu.core.graph import NOTE
    from analysisgnn_tpu.distributed.mesh import (
        make_sharded_train_step,
        replicate,
        shard_params_tp,
        shard_stacked_batch,
        stack_batches,
    )
    from analysisgnn_tpu.train.schedules import warmup_cosine_schedule
    from analysisgnn_tpu.train.state import create_train_state, make_optimizer
    from analysisgnn_tpu.train.step import StepConfig

    tasks = ge.TASKS[:4]
    mesh = make_mesh(4)  # data=2 x model=2 on 4 devices
    sampler = ge._build_batch(num_notes=300, subgraph=64, batch_graphs=2, tasks=tasks)
    per_dev = [sampler.sample_batch() for _ in range(mesh.shape["data"])]
    stacked = stack_batches(per_dev)
    stacked_host = jax.tree_util.tree_map(np.asarray, stacked)

    model = ge._make_model(hidden=32, out=16, layers=2, tasks=tasks)
    b0 = per_dev[0]
    attrs = b0.node_attrs[NOTE]
    params = model.init(
        jax.random.PRNGKey(0), b0.x_dict(), b0.edge_index_dict(), b0.batch,
        attrs["pitch_spelling"], attrs["key_signature"], b0.num_target_nodes,
    )
    params_host = jax.tree_util.tree_map(np.asarray, params)
    opt = make_optimizer(warmup_cosine_schedule(5e-3, total_steps=100))
    cfg = StepConfig(
        task_dict=tasks, active_tasks=tuple(t for t, _ in tasks),
        mt_strategy="wloss",
    )
    step = make_sharded_train_step(model, opt, cfg, mesh)

    with mesh:
        state = create_train_state(params, len(tasks), opt, jax.random.PRNGKey(1))
        state = replicate(state, mesh)
        state = dataclasses.replace(state, params=shard_params_tp(state.params, mesh))
        state, loss_s = step(state, shard_stacked_batch(stacked, mesh))

    dev0 = jax.devices()[0]
    state_u = create_train_state(
        jax.device_put(params_host, dev0), len(tasks), opt, jax.random.PRNGKey(1)
    )
    state_u, loss_u = step(state_u, jax.device_put(stacked_host, dev0))

    np.testing.assert_allclose(float(loss_s), float(loss_u), rtol=1e-5)
    for ps, pu in zip(
        jax.tree_util.tree_leaves(state.params),
        jax.tree_util.tree_leaves(state_u.params),
    ):
        np.testing.assert_allclose(
            np.asarray(ps), np.asarray(pu), rtol=2e-4, atol=2e-5
        )
