"""Mesh-based scaling: data-parallel batches + tensor-parallel params.

The reference scales with Lightning DDP over NCCL (commented-out strategy,
reference train/train_analysisgnn.py:239); here distribution is the
single-controller JAX model: one ``Mesh`` with axes

  * ``data``  — each slot owns a full padded sampled-subgraph batch
                (the batch pytree gains a leading device axis); gradients are
                mean-reduced across the axis by XLA-inserted psums over ICI,
  * ``model`` — the wide Dense kernels (hidden×hidden projections, encoder
                convs, task heads) are sharded on their last dim; XLA inserts
                all-gathers/reduce-scatters as needed.

Graph-partition parallelism (boundary halo exchange — this project's CP
analog per SURVEY §2.4) builds on the same mesh and lands in a later round.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from analysisgnn_tpu.core.graph import HeteroGraph


def make_mesh(
    n_devices: Optional[int] = None,
    devices: Optional[Sequence] = None,
    model_size: Optional[int] = None,
) -> Mesh:
    """Factorize available devices into a (data, model) mesh.

    By default uses a model axis of 2 when the device count is even (>=4),
    else pure DP; pass ``model_size`` to force the factorization (e.g.
    ``model_size=1`` for pure DP scaling runs).
    """
    if devices is None:
        devices = jax.devices()[: n_devices or len(jax.devices())]
    n = len(devices)
    if model_size is None:
        model = 2 if n >= 4 and n % 2 == 0 else 1
    else:
        assert n % model_size == 0, (n, model_size)
        model = model_size
    data = n // model
    dev_array = np.asarray(devices).reshape(data, model)
    return Mesh(dev_array, ("data", "model"))


def _tp_spec_for(path_leaf_shape: Tuple[int, ...], model_size: int) -> P:
    """Last-dim sharding for big 2D kernels; replicate everything else."""
    if (
        len(path_leaf_shape) >= 2
        and path_leaf_shape[-1] % model_size == 0
        and path_leaf_shape[-1] >= 2 * model_size
    ):
        return P(*([None] * (len(path_leaf_shape) - 1) + ["model"]))
    return P()


def shard_params_tp(params: Any, mesh: Mesh) -> Any:
    """Place a parameter pytree on the mesh with last-dim TP sharding."""
    model_size = mesh.shape["model"]

    def place(leaf):
        leaf = jnp.asarray(leaf)
        spec = _tp_spec_for(leaf.shape, model_size)
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(place, params)


def replicate(tree: Any, mesh: Mesh) -> Any:
    return jax.tree_util.tree_map(
        lambda leaf: jax.device_put(jnp.asarray(leaf), NamedSharding(mesh, P())), tree
    )


def stack_batches(batches: Sequence[HeteroGraph]) -> HeteroGraph:
    """Stack per-device batches into one pytree with a leading device axis."""
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs, axis=0), *batches)


def shard_stacked_batch(stacked: HeteroGraph, mesh: Mesh) -> HeteroGraph:
    """Shard the leading (device) axis of a stacked batch over ``data``."""

    def place(leaf):
        spec = P("data", *([None] * (leaf.ndim - 1)))
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(place, stacked)


def make_sharded_train_step(model, optimizer, cfg, mesh: Mesh):
    """Data-parallel version of train.step.make_train_step: the batch carries
    a leading device axis vmapped inside the loss; the mean over that axis
    makes XLA psum the gradients across ``data``."""
    import optax

    from analysisgnn_tpu.train.step import compute_losses
    from analysisgnn_tpu.train.state import TrainState

    def loss_fn(trainables, state, stacked_batch, rng):
        params, mt_params = trainables

        def one(batch):
            total, feature_loss, memory_loss, _, _ = compute_losses(
                model, params, mt_params, state.teacher_params, batch, cfg,
                {"dropout": rng}, False,
            )
            return total + memory_loss + cfg.lambda_featl * feature_loss

        losses = jax.vmap(one)(stacked_batch)
        return losses.mean()

    @jax.jit
    def train_step(state: TrainState, stacked_batch):
        rng, new_rng = jax.random.split(state.rng)
        loss, grads = jax.value_and_grad(loss_fn)(
            (state.params, state.mt_params), state, stacked_batch, rng
        )
        updates, new_opt_state = optimizer.update(
            grads, state.opt_state, (state.params, state.mt_params)
        )
        new_params, new_mt = optax.apply_updates(
            (state.params, state.mt_params), updates
        )
        new_state = dataclasses.replace(
            state,
            step=state.step + 1,
            params=new_params,
            mt_params=new_mt,
            opt_state=new_opt_state,
            rng=new_rng,
        )
        return new_state, loss

    return train_step
