"""Training state: params, optimizer, multi-task weights, CL memories.

One pytree carries everything the continual-learning machinery needs
(reference ``ContinualAnalysisGNN`` attributes, analysisgnn/models/
analysis.py:839-932): model params, the learnable uncertainty weights, the
frozen teacher copy for distillation (:918-932), and the EWC fisher/means
(:1440-1495) — so the whole update is one pure jitted function.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from analysisgnn_tpu.train.losses import init_mt_params


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TrainState:
    step: jax.Array
    params: Any
    mt_params: jax.Array
    opt_state: Any
    teacher_params: Any  # frozen distillation teacher (copy of params)
    fisher: Any  # EWC fisher diagonal (zeros when unused)
    means: Any  # EWC anchor params
    rng: jax.Array
    famo: Any = None  # FAMOState when mt_strategy == "famo"


def create_train_state(
    params: Any,
    num_tasks: int,
    optimizer: optax.GradientTransformation,
    rng: jax.Array,
    mt_strategy: str = "wloss",
) -> TrainState:
    from analysisgnn_tpu.train.losses import famo_init

    mt = init_mt_params(num_tasks)
    opt_state = optimizer.init((params, mt))
    zeros = jax.tree_util.tree_map(jnp.zeros_like, params)
    famo = famo_init(num_tasks)[0] if mt_strategy == "famo" else None
    # Every params-derived field gets DISTINCT buffers: the train step
    # donates its input state, so (a) duplicate buffers in one donated
    # pytree are rejected by the runtime, and (b) the caller's ``params``
    # must stay valid after the first step.
    copy = lambda t: jax.tree_util.tree_map(jnp.copy, t)
    return TrainState(
        step=jnp.asarray(0, jnp.int32),
        params=copy(params),
        mt_params=mt,
        opt_state=opt_state,
        teacher_params=copy(params),
        fisher=zeros,
        means=copy(params),
        rng=rng,
        famo=famo,
    )


def torch_style_reinit(params: Any, seed: int = 0, fused: bool = True) -> Any:
    """Redraw Dense kernels/biases from torch ``nn.Linear``'s default
    distribution: U(-1/sqrt(fan_in), +1/sqrt(fan_in)) for kernels, and a
    uniform of the same form for biases (flax defaults: lecun_normal
    kernels, ZERO biases).

    The reference trains with torch defaults, and the init scale measurably
    matters at its recipe: at lr=5e-3 / dropout=0.3 the torch-style draw
    reaches root_acc 0.773 vs 0.747 for the flax default over the same 650
    steps (bench_queue/dropout_bisect.json arm "torch-init").

    Scope — what torch ``nn.Linear`` covers in the reference model:

    * modules holding a *plain Dense* kernel (ndim==2); both kernel and
      its sibling bias use fan_in = kernel.shape[0] (torch's in_features).
    * with ``fused=True`` (the default since round 5), the relation/task-
      BATCHED linears that this framework fuses into single einsum params
      but that the reference implements as per-relation / per-task torch
      ``nn.Linear`` modules: ``FusedHeteroSage``'s ``w_neigh/w_self/w_agg``
      (the reference SageConv's ``Linear(f,f)`` + the two halves of its
      ``Linear(2f,g)`` — torch_geometric SAGEConv semantics, and the torch
      anchor ``scripts/bench_torch_reference.py::SageConv``), and
      ``FusedTaskHeads``'s ``w1/w2`` (the reference's per-task 2-layer
      heads, analysisgnn/models/analysis.py:486-496).  Each task/relation
      slice is an independent torch Linear, so the whole stacked param is
      drawn from the same U(±1/sqrt(fan_in)) with fan_in = the slice's
      in_features.  Round 4 and earlier skipped these (ndim==3), leaving
      the HEADS — exactly the module family where the key-region/large-
      vocab metric gap lives (RESULTS.md §Crossover) — at lecun-normal
      kernels with ZERO biases while the anchor's heads carried the torch
      draw; ``fused=False`` reproduces that round-4 behavior for bisects
      (CLI ``--no_fused_torch_init``).

    DenseGeneral/attention kernels (ndim>=3 outside the table below),
    LayerNorm scales/biases, and embeddings keep their flax defaults —
    matching torch, which zeros norm biases and uses per-module init
    elsewhere."""
    import numpy as np

    rng = np.random.default_rng(seed)

    def draw(bound, shape):
        return jnp.asarray(rng.uniform(-bound, bound, shape).astype(np.float32))

    from collections.abc import Mapping

    def _fused_fan_in(node):
        """{param_name: torch fan_in} for the known batched-linear layouts."""
        fans = {}
        w = node.get("w_neigh")
        if getattr(w, "ndim", 0) == 3:
            f = w.shape[-2]
            # w_self/w_agg/b_out are the split halves of SageConv's
            # Linear(2f, g): torch draws that matrix with fan_in = 2f
            fans.update({"w_neigh": f, "b_neigh": f,
                         "w_self": 2 * f, "w_agg": 2 * f, "b_out": 2 * f})
        w = node.get("w1")
        if getattr(w, "ndim", 0) == 3 and getattr(node.get("w2"), "ndim", 0) == 3:
            f, h = w.shape[-2], node["w2"].shape[-2]
            fans.update({"w1": f, "b1": f, "w2": h, "b2": h})
        return fans

    def walk(node):
        if not isinstance(node, Mapping):
            return node
        kernel = node.get("kernel")
        is_dense = getattr(kernel, "ndim", 0) == 2
        fan_in = kernel.shape[0] if is_dense else None
        fused_fan = _fused_fan_in(node) if fused else {}
        out = {}
        for key in sorted(node):  # sorted: rng draw order independent of
            leaf = node[key]  # dict insertion order
            if isinstance(leaf, Mapping):
                out[key] = walk(leaf)
            elif is_dense and key == "kernel":
                out[key] = draw(1.0 / np.sqrt(fan_in), leaf.shape)
            elif is_dense and key == "bias" and leaf.ndim == 1:
                out[key] = draw(1.0 / np.sqrt(fan_in), leaf.shape)
            elif key in fused_fan:
                out[key] = draw(1.0 / np.sqrt(fused_fan[key]), leaf.shape)
            else:
                out[key] = leaf
        return out

    result = walk(params)
    return result if type(params) is dict else type(params)(result)


def make_optimizer(
    lr_schedule, weight_decay: float = 5e-3, clip_norm: float = 1.0,
    flatten: bool = True,
) -> optax.GradientTransformation:
    """AdamW + global-norm clipping 1.0 (reference Trainer
    ``gradient_clip_val=1.0`` + ``configure_optimizers``,
    train_analysisgnn.py:254, models/analysis.py:1380-1410).

    ``flatten`` runs the update over one concatenated vector instead of
    ~180 per-leaf kernels — identical math, far fewer ops per step.
    """
    opt = optax.chain(
        optax.clip_by_global_norm(clip_norm),
        optax.adamw(lr_schedule, weight_decay=weight_decay),
    )
    return optax.flatten(opt) if flatten else opt


def update_teacher(state: TrainState) -> TrainState:
    """Freeze the current params as the distillation teacher
    (reference ``update_memory_model``, :1370-1378)."""
    teacher = jax.tree_util.tree_map(jnp.copy, state.params)
    return dataclasses.replace(state, teacher_params=teacher)


def snapshot_ewc_anchor(state: TrainState) -> TrainState:
    """Store current params as EWC means and reset fisher
    (reference ``get_optimal_params`` + ``_init_fisher``, :1457-1476)."""
    zeros = jax.tree_util.tree_map(jnp.zeros_like, state.params)
    means = jax.tree_util.tree_map(jnp.copy, state.params)
    return dataclasses.replace(state, means=means, fisher=zeros)


def accumulate_fisher(state: TrainState, grads: Any, scale: float) -> TrainState:
    """fisher += grad² / scale (reference ``compute_fisher``, :1440-1455)."""
    fisher = jax.tree_util.tree_map(
        lambda f, g: f + (g**2) / scale, state.fisher, grads
    )
    return dataclasses.replace(state, fisher=fisher)
