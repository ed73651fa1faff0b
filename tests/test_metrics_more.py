"""Deeper metric tests: macro F1, onset-wise RNA accuracy, distillation."""

import numpy as np
import jax.numpy as jnp

from analysisgnn_tpu.train.losses import distillation_loss, ewc_penalty
from analysisgnn_tpu.train.metrics import (
    cantor_pair,
    masked_accuracy,
    masked_macro_f1,
    onsetwise_rna_accuracy,
)
from analysisgnn_tpu.train.schedules import warmup_exponential_schedule


def test_masked_accuracy_ignores_masked_rows():
    logits = jnp.asarray([[1.0, 0.0], [1.0, 0.0], [0.0, 1.0]])
    labels = jnp.asarray([0, 1, 1])
    w = jnp.asarray([1.0, 0.0, 1.0])
    assert float(masked_accuracy(logits, labels, w)) == 1.0


def test_masked_macro_f1_binary():
    # perfect predictions → macro F1 == 1 over present classes
    logits = jnp.asarray([[2.0, 0.0], [0.0, 2.0], [2.0, 0.0], [0.0, 2.0]])
    labels = jnp.asarray([0, 1, 0, 1])
    w = jnp.ones(4)
    np.testing.assert_allclose(float(masked_macro_f1(logits, labels, w, 2)), 1.0)
    # one class absent from labels is excluded from the macro mean
    labels2 = jnp.asarray([0, 0, 0, 0])
    logits2 = jnp.asarray([[2.0, 0.0]] * 4)
    np.testing.assert_allclose(float(masked_macro_f1(logits2, labels2, w, 2)), 1.0)


def test_cantor_pair_unique():
    a = jnp.asarray([0, 1, 2, 0, 1])
    b = jnp.asarray([0, 0, 0, 1, 1])
    keys = np.asarray(cantor_pair(a, b))
    assert len(set(keys.tolist())) == 5


def test_onsetwise_rna_accuracy_perfect():
    # 4 notes, 2 onsets, 2 tasks; predictions equal labels → accuracy 1
    n = 4
    logits = {
        k: jnp.eye(3)[jnp.asarray([0, 0, 1, 1])] * 10
        for k in ("quality", "inversion", "degree1", "degree2")
    }
    labels = {k: jnp.asarray([0, 0, 1, 1]) for k in logits}
    onset_edges = jnp.asarray([[0, 1, 2, 3], [1, 0, 3, 2]])
    onset_div = jnp.asarray([0, 0, 4, 4])
    batch_ids = jnp.zeros(n, jnp.int32)
    w = jnp.ones(n, bool)
    acc = onsetwise_rna_accuracy(logits, labels, onset_edges, onset_div, batch_ids, w)
    np.testing.assert_allclose(float(acc), 1.0)


def test_distillation_zero_when_equal():
    logits = {"a": jnp.asarray([[1.0, 2.0], [0.5, 0.1]])}
    w = jnp.ones(2)
    kl = float(distillation_loss(logits, logits, w, ("a",)))
    assert abs(kl) < 1e-5
    # different teacher → positive
    teacher = {"a": jnp.asarray([[2.0, 1.0], [0.1, 0.5]])}
    assert float(distillation_loss(logits, teacher, w, ("a",))) > 0


def test_ewc_penalty_quadratic():
    params = {"w": jnp.asarray([1.0, 2.0])}
    means = {"w": jnp.asarray([0.0, 0.0])}
    fisher = {"w": jnp.asarray([1.0, 0.5])}
    np.testing.assert_allclose(float(ewc_penalty(params, means, fisher)), 1.0 + 2.0)


def test_warmup_exponential_schedule():
    s = warmup_exponential_schedule(1e-2, decay_steps=100, warmup_steps=10, gamma=0.5)
    assert float(s(0)) == 0.0
    np.testing.assert_allclose(float(s(10)), 1e-2, rtol=1e-5)
    np.testing.assert_allclose(float(s(110)), 5e-3, rtol=1e-4)
