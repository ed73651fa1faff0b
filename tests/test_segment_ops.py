"""Unit tests for segment ops vs dense numpy references."""

import numpy as np
import jax.numpy as jnp

from analysisgnn_tpu.kernels import (
    segment_sum,
    segment_mean,
    segment_softmax,
    gather_scatter_sum,
    gather_scatter_mean,
    sddmm_dot,
)
from analysisgnn_tpu.kernels.segment_ops import segment_mean_or


def dense_segment_sum(data, ids, n):
    out = np.zeros((n,) + data.shape[1:], dtype=np.float64)
    for row, i in zip(data, ids):
        if 0 <= i < n:
            out[i] += row
    return out


def test_segment_sum_matches_dense(rng):
    data = rng.normal(size=(50, 8)).astype(np.float32)
    ids = rng.integers(0, 12, size=50).astype(np.int32)
    got = segment_sum(jnp.asarray(data), jnp.asarray(ids), 10)
    want = dense_segment_sum(data, ids, 10)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_segment_sum_drops_out_of_range(rng):
    data = np.ones((4, 3), np.float32)
    ids = np.array([0, 5, 1, 5], np.int32)  # 5 == num_segments → padding
    got = segment_sum(jnp.asarray(data), jnp.asarray(ids), 5)
    assert np.allclose(got[0], 1.0) and np.allclose(got[1], 1.0)
    assert np.allclose(got[2:], 0.0)


def test_segment_mean(rng):
    data = rng.normal(size=(30, 4)).astype(np.float32)
    ids = rng.integers(0, 6, size=30).astype(np.int32)
    got = segment_mean(jnp.asarray(data), jnp.asarray(ids), 6)
    s = dense_segment_sum(data, ids, 6)
    c = np.maximum(np.bincount(ids, minlength=6), 1)[:, None]
    np.testing.assert_allclose(got, s / c, rtol=1e-5, atol=1e-5)


def test_segment_mean_or_empty_segments_keep_default(rng):
    default = rng.normal(size=(5, 3)).astype(np.float32)
    data = rng.normal(size=(4, 3)).astype(np.float32)
    ids = np.array([0, 0, 2, 2], np.int32)  # segments 1,3,4 empty
    got = np.asarray(segment_mean_or(jnp.asarray(data), jnp.asarray(ids), jnp.asarray(default)))
    np.testing.assert_allclose(got[1], default[1], rtol=1e-6)
    np.testing.assert_allclose(got[3], default[3], rtol=1e-6)
    np.testing.assert_allclose(got[0], data[:2].mean(0), rtol=1e-5, atol=1e-6)


def test_segment_softmax_normalizes(rng):
    logits = rng.normal(size=(40,)).astype(np.float32) * 5
    ids = np.sort(rng.integers(0, 7, size=40)).astype(np.int32)
    w = np.asarray(segment_softmax(jnp.asarray(logits), jnp.asarray(ids), 7))
    for s in range(7):
        m = ids == s
        if m.sum():
            np.testing.assert_allclose(w[m].sum(), 1.0, rtol=1e-4)


def test_segment_softmax_stability():
    logits = jnp.asarray([1e4, 1e4 + 1.0, -1e4], jnp.float32)
    ids = jnp.asarray([0, 0, 1], jnp.int32)
    w = np.asarray(segment_softmax(logits, ids, 2))
    assert np.all(np.isfinite(w))
    np.testing.assert_allclose(w[:2].sum(), 1.0, rtol=1e-4)


def test_gather_scatter_roundtrip(rng):
    x = rng.normal(size=(9, 5)).astype(np.float32)
    # simple graph: edges (0→1),(2→1),(1→0) plus one padding edge (9→9)
    ei = np.array([[0, 2, 1, 9], [1, 1, 0, 9]], np.int32)
    got = np.asarray(gather_scatter_sum(jnp.asarray(x), jnp.asarray(ei), 9))
    want = np.zeros_like(x)
    want[1] = x[0] + x[2]
    want[0] = x[1]
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
    got_mean = np.asarray(gather_scatter_mean(jnp.asarray(x), jnp.asarray(ei), 9))
    want_mean = want.copy()
    want_mean[1] = (x[0] + x[2]) / 2
    np.testing.assert_allclose(got_mean, want_mean, rtol=1e-5, atol=1e-6)


def test_sddmm_dot(rng):
    q = rng.normal(size=(6, 4)).astype(np.float32)
    k = rng.normal(size=(6, 4)).astype(np.float32)
    ei = np.array([[0, 3], [2, 5]], np.int32)
    got = np.asarray(sddmm_dot(jnp.asarray(q), jnp.asarray(k), jnp.asarray(ei)))
    want = np.array([q[2] @ k[0], q[5] @ k[3]])
    np.testing.assert_allclose(got, want, rtol=1e-5)
