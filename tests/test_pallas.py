"""Pallas kernels vs jnp references (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from analysisgnn_tpu.kernels.pallas_segment import (
    segment_softmax_sorted,
    segment_sum_sorted,
    tile_edge_offsets,
)
from analysisgnn_tpu.kernels.segment_ops import segment_softmax, segment_sum

INTERPRET = jax.default_backend() != "tpu"


def make_sorted(n_nodes=300, n_edges=2000, h=4, seed=0):
    rng = np.random.default_rng(seed)
    dst = np.sort(rng.integers(0, n_nodes, n_edges)).astype(np.int32)
    offs = tile_edge_offsets(dst, n_nodes)
    return dst, offs


def test_segment_sum_sorted_matches_reference():
    n_nodes, n_edges, f = 300, 2000, 64
    rng = np.random.default_rng(0)
    msgs = jnp.asarray(rng.normal(size=(n_edges, f)), jnp.float32)
    dst, offs = make_sorted(n_nodes, n_edges)
    got = segment_sum_sorted(
        msgs, jnp.asarray(dst), jnp.asarray(offs), n_nodes, interpret=INTERPRET
    )
    want = segment_sum(msgs, jnp.asarray(dst), n_nodes)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4)


def test_segment_sum_sorted_empty_nodes():
    n_nodes, f = 128, 32
    msgs = jnp.ones((10, f), jnp.float32)
    dst = np.array([0] * 5 + [100] * 5, np.int32)
    offs = tile_edge_offsets(dst, n_nodes)
    got = np.asarray(
        segment_sum_sorted(msgs, jnp.asarray(dst), jnp.asarray(offs), n_nodes, interpret=INTERPRET)
    )
    assert np.allclose(got[0], 5.0)
    assert np.allclose(got[100], 5.0)
    assert np.allclose(got[1:100], 0.0)


def test_segment_softmax_sorted_matches_reference():
    n_nodes, n_edges, h = 300, 2000, 4
    rng = np.random.default_rng(1)
    logits = jnp.asarray(rng.normal(size=(n_edges, h)) * 3, jnp.float32)
    dst, offs = make_sorted(n_nodes, n_edges, seed=1)
    got = segment_softmax_sorted(
        logits, jnp.asarray(dst), jnp.asarray(offs), n_nodes, interpret=INTERPRET
    )
    want = segment_softmax(logits, jnp.asarray(dst), n_nodes)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-3, atol=1e-4)


def test_segment_softmax_sorted_stability():
    n_nodes = 128
    logits = jnp.asarray([[1e4], [1e4 + 1], [-1e4], [0.0]], jnp.float32)
    dst = np.array([0, 0, 1, 1], np.int32)
    offs = tile_edge_offsets(dst, n_nodes)
    got = np.asarray(
        segment_softmax_sorted(
            logits, jnp.asarray(dst), jnp.asarray(offs), n_nodes, interpret=INTERPRET
        )
    )
    assert np.isfinite(got).all()
    np.testing.assert_allclose(got[:2].sum(), 1.0, rtol=1e-3)
