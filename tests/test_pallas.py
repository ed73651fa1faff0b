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


def test_segment_softmax_agg_sorted_matches_reference():
    """Fused HGT attention reduction (max + exp-weighted sum + denom in one
    kernel) vs the plain-jnp segment softmax math, values AND gradients."""
    import jax
    import jax.numpy as jnp

    from analysisgnn_tpu.kernels.pallas_segment import (
        TILE_N,
        segment_softmax_agg_sorted,
    )

    rng = np.random.default_rng(0)
    n_real, h, d, r_blocks = 300, 4, 8, 3
    m = ((n_real + 1) // TILE_N + 1) * TILE_N
    per_block = [257, 1100, 64]  # straddles chunk boundaries
    segs, logits, msgs = [], [], []
    for r, e in enumerate(per_block):
        nodes = np.sort(rng.integers(0, n_real, e))
        segs.append(r * m + nodes)
        logits.append(rng.normal(size=(e, h)).astype(np.float32))
        msgs.append(rng.normal(size=(e, h * d)).astype(np.float32))
    seg = jnp.asarray(np.concatenate(segs))
    logits = jnp.asarray(np.concatenate(logits))
    msgs = jnp.asarray(np.concatenate(msgs))
    offsets = jnp.searchsorted(
        seg, jnp.arange(0, r_blocks * m + 1, TILE_N, dtype=seg.dtype)
    ).astype(jnp.int32)

    def reference(logits, msgs):
        node = seg % m
        mx = jax.ops.segment_max(logits, node, num_segments=m)
        mx = jnp.where(jnp.isfinite(mx), mx, 0.0)
        ex = jnp.exp(logits - mx[node])
        den = jnp.maximum(
            jax.ops.segment_sum(ex, node, num_segments=m), 1e-16
        )
        w = ex / den[node]
        wm = msgs.reshape(-1, h, d) * w[..., None]
        return jax.ops.segment_sum(
            wm.reshape(-1, h * d), node, num_segments=m
        )

    fused = lambda lo, ms: segment_softmax_agg_sorted(
        lo, ms, seg, offsets, m, r_blocks, True  # interpret on CPU
    )
    out_ref = reference(logits, msgs)
    out_fused = fused(logits, msgs)
    np.testing.assert_allclose(
        np.asarray(out_fused), np.asarray(out_ref), rtol=1e-5, atol=1e-5
    )

    # gradients: scalar loss weighting only REAL node rows
    key_w = jnp.asarray(rng.normal(size=(n_real, h * d)).astype(np.float32))
    loss_ref = lambda lo, ms: (reference(lo, ms)[:n_real] * key_w).sum()
    loss_fused = lambda lo, ms: (fused(lo, ms)[:n_real] * key_w).sum()
    gr_l, gr_m = jax.grad(loss_ref, argnums=(0, 1))(logits, msgs)
    gf_l, gf_m = jax.grad(loss_fused, argnums=(0, 1))(logits, msgs)
    np.testing.assert_allclose(np.asarray(gf_l), np.asarray(gr_l), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gf_m), np.asarray(gr_m), rtol=1e-4, atol=1e-5)
