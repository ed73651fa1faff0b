"""Golden numerical parity vs torch implementations of the reference math.

graphmuse/torch_scatter are not installable here, so the reference layer
semantics (SURVEY §6 parity protocol) are reproduced in plain torch
(index_add-based scatter with the exact ``out=``/mean semantics of
torch_scatter) and compared against this framework's JAX implementations
under shared weights.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from analysisgnn_tpu.models.conv import SageConv
from analysisgnn_tpu.train.losses import masked_cross_entropy, multi_task_loss
from analysisgnn_tpu.train.schedules import warmup_cosine_schedule


def scatter_mean_with_out(src, index, out):
    """torch_scatter.scatter(..., out=out, reduce='mean') semantics:
    (out + Σ src) / max(count, 1) per row (see kernels/segment_ops.py)."""
    acc = out.clone()
    acc.index_add_(0, index, src)
    count = torch.zeros(out.shape[0])
    count.index_add_(0, index, torch.ones(len(index)))
    return acc / count.clamp(min=1.0).unsqueeze(-1)


def torch_sage_conv(x, edge_index, w_neigh, b_neigh, w_out, b_out):
    """Reference SageConvScatter forward (analysisgnn/models/core/
    gnn.py:62-76) in plain torch."""
    h = x @ w_neigh.T + b_neigh
    he = h[edge_index[1]]
    s = scatter_mean_with_out(he, edge_index[0], x.clone())
    z = torch.cat([x, s], dim=-1) @ w_out.T + b_out
    return z


def test_sage_conv_matches_torch_reference():
    rng = np.random.default_rng(0)
    n, f, g = 30, 8, 12
    x = rng.normal(size=(n, f)).astype(np.float32)
    ei = rng.integers(0, n, size=(2, 60)).astype(np.int32)

    conv = SageConv(g)
    params = conv.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(ei))
    p = params["params"]
    got = np.asarray(conv.apply(params, jnp.asarray(x), jnp.asarray(ei)))

    want = torch_sage_conv(
        torch.from_numpy(x),
        torch.from_numpy(ei.astype(np.int64)),
        torch.from_numpy(np.asarray(p["neigh"]["kernel"]).T),
        torch.from_numpy(np.asarray(p["neigh"]["bias"])),
        torch.from_numpy(np.asarray(p["out"]["kernel"]).T),
        torch.from_numpy(np.asarray(p["out"]["bias"])),
    ).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_cross_entropy_matches_torch():
    rng = np.random.default_rng(1)
    logits = rng.normal(size=(40, 7)).astype(np.float32)
    labels = rng.integers(0, 7, size=40).astype(np.int64)
    labels[::5] = -1  # ignore_index rows
    t_loss = torch.nn.CrossEntropyLoss(ignore_index=-1, label_smoothing=0.1)(
        torch.from_numpy(logits), torch.from_numpy(labels)
    ).item()
    weight = jnp.asarray(labels != -1)
    j_loss = float(
        masked_cross_entropy(
            jnp.asarray(logits), jnp.asarray(np.maximum(labels, 0)), weight, 0.1
        )
    )
    np.testing.assert_allclose(j_loss, t_loss, rtol=1e-5)


def test_multitask_wloss_matches_reference_formula():
    # reference MultiTaskLoss (models/chord.py:39-49):
    # Σ 0.5/p² L + log(1 + p²)
    losses = {"a": jnp.asarray(2.0), "b": jnp.asarray(0.5)}
    p = jnp.asarray([1.5, 0.8])
    got = float(multi_task_loss(losses, p, ("a", "b"), "wloss"))
    want = (0.5 / 1.5**2) * 2.0 + np.log1p(1.5**2) + (0.5 / 0.8**2) * 0.5 + np.log1p(0.8**2)
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_warmup_cosine_schedule_shape():
    sched = warmup_cosine_schedule(1e-2, total_steps=100, warmup_steps=10)
    lrs = [float(sched(s)) for s in range(100)]
    # linear warmup up to base lr
    assert lrs[0] < lrs[5] < lrs[9]
    np.testing.assert_allclose(lrs[10], 1e-2, rtol=1e-2)
    # cosine decay to eta_min = 1% of base
    assert lrs[-1] < 2e-4 + 1e-4
    assert all(b <= a + 1e-9 for a, b in zip(lrs[10:], lrs[11:]))


def test_anchor_optimizer_trajectory_matches(tmp_path):
    """De-self-grading the parity anchor (VERDICT r2 ask #7): the torch
    anchor's FULL update rule (AdamW defaults + decoupled weight decay +
    global-norm clip 1.0 + warmup-cosine schedule, exactly as
    scripts/parity_experiment.py::stage_torch applies it) must produce the
    SAME parameter trajectory as this repo's optax pipeline
    (train/state.py::make_optimizer) on a fixed batch from shared init —
    checked elementwise at steps 0, 1 and 2."""
    import optax

    from analysisgnn_tpu.train.state import make_optimizer

    rng = np.random.default_rng(3)
    n, f, c = 48, 12, 5
    x = rng.normal(size=(n, f)).astype(np.float32)
    y = rng.integers(0, c, size=n).astype(np.int64)
    w0 = rng.normal(size=(f, c)).astype(np.float32) * 0.3
    b0 = np.zeros(c, np.float32)
    mask = np.ones(n, bool)
    mask[::7] = False

    sched = warmup_cosine_schedule(5e-3, total_steps=50, warmup_steps=5)

    # --- torch side: the anchor's exact update sequence -------------------
    lin = torch.nn.Linear(f, c)
    with torch.no_grad():
        lin.weight.copy_(torch.from_numpy(w0.T))
        lin.bias.copy_(torch.from_numpy(b0))
    optim = torch.optim.AdamW(lin.parameters(), lr=5e-3, weight_decay=5e-3)
    t_losses = []
    for step in range(3):
        for g in optim.param_groups:
            g["lr"] = float(sched(step))
        optim.zero_grad()
        logits = lin(torch.from_numpy(x))
        lw = torch.from_numpy(mask.astype(np.float32))
        ls = torch.nn.functional.cross_entropy(
            logits, torch.from_numpy(y), label_smoothing=0.1, reduction="none"
        )
        loss = (ls * lw).sum() / lw.sum()
        loss.backward()
        torch.nn.utils.clip_grad_norm_(lin.parameters(), 1.0)
        optim.step()
        t_losses.append(float(loss))

    # --- jax side: this repo's optax pipeline ------------------------------
    params = {"kernel": jnp.asarray(w0), "bias": jnp.asarray(b0)}
    tx = make_optimizer(sched, weight_decay=5e-3, clip_norm=1.0, flatten=False)
    opt_state = tx.init(params)

    def loss_fn(p):
        logits = jnp.asarray(x) @ p["kernel"] + p["bias"]
        return masked_cross_entropy(
            logits, jnp.asarray(y), jnp.asarray(mask), 0.1
        )

    j_losses = []
    for step in range(3):
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        j_losses.append(float(loss))

    # identical losses at every step (same forward math on same params)...
    np.testing.assert_allclose(j_losses, t_losses, rtol=1e-5)
    # ...and identical post-update parameters (same optimizer semantics)
    np.testing.assert_allclose(
        np.asarray(params["kernel"]), lin.weight.detach().numpy().T,
        rtol=1e-4, atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(params["bias"]), lin.bias.detach().numpy(),
        rtol=1e-4, atol=1e-6,
    )
