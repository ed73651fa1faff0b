"""Segment (scatter/gather) primitives — the message-passing substrate.

The reference's message passing is built on ``torch_scatter`` segment
reductions (reference: analysisgnn/models/core/gnn.py:74,104,208,256 and
models/analysis.py:586,1239).  On TPU the idiomatic equivalent is
``jax.ops.segment_*`` which XLA lowers to sorted-scatter; these wrappers fix
the padding convention used across this framework:

    padded edges carry ``dst == num_segments`` (one past the end), so they are
    dropped by construction — no boolean masking on the hot path.

All functions are shape-polymorphic in the feature dimension and jit-stable
(static ``num_segments``).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def segment_sum(data: jax.Array, segment_ids: jax.Array, num_segments: int) -> jax.Array:
    """Sum ``data`` rows into ``num_segments`` buckets; out-of-range ids drop."""
    return jax.ops.segment_sum(data, segment_ids, num_segments=num_segments)


def segment_count(segment_ids: jax.Array, num_segments: int) -> jax.Array:
    ones = jnp.ones(segment_ids.shape[0], dtype=jnp.float32)
    return jax.ops.segment_sum(ones, segment_ids, num_segments=num_segments)


def segment_mean(
    data: jax.Array, segment_ids: jax.Array, num_segments: int
) -> jax.Array:
    """Mean-reduce rows per segment (empty segments → 0).

    Matches ``torch_scatter.scatter(..., reduce='mean')`` semantics for
    non-empty segments; empty segments yield zeros (the reference writes the
    ``out=`` tensor's previous value there — call sites that rely on that use
    :func:`segment_mean_or` below).
    """
    total = segment_sum(data, segment_ids, num_segments)
    count = segment_count(segment_ids, num_segments)
    return total / jnp.maximum(count, 1.0)[(...,) + (None,) * (data.ndim - 1)]


def segment_mean_or(
    data: jax.Array,
    segment_ids: jax.Array,
    default: jax.Array,
) -> jax.Array:
    """Per-segment mean, falling back to ``default`` rows for empty segments.

    Replicates the reference pattern
    ``scatter(h_e, dst, out=features.clone(), reduce='mean')``
    (analysisgnn/models/core/gnn.py:74): segments that receive no messages
    keep their previous (self) value.
    """
    num_segments = default.shape[0]
    mean = segment_mean(data, segment_ids, num_segments)
    count = segment_count(segment_ids, num_segments)
    has = (count > 0)[(...,) + (None,) * (default.ndim - 1)]
    return jnp.where(has, mean, default)


def segment_mean_with_base(
    data: jax.Array,
    segment_ids: jax.Array,
    base: jax.Array,
) -> jax.Array:
    """(base + Σ messages) / max(count, 1) per segment.

    Exact semantics of ``torch_scatter.scatter(..., out=base, reduce='mean')``
    as used by the reference's SAGE aggregation and onset pooling
    (analysisgnn/models/core/gnn.py:74, models/analysis.py:586): the base row
    is *added* to the message sum but not counted in the denominator, and
    empty segments keep their base value.
    """
    num_segments = base.shape[0]
    total = segment_sum(data, segment_ids, num_segments) + base
    count = segment_count(segment_ids, num_segments)
    return total / jnp.maximum(count, 1.0)[(...,) + (None,) * (base.ndim - 1)]


def segment_max(
    data: jax.Array,
    segment_ids: jax.Array,
    num_segments: int,
    initial: float = -jnp.inf,
) -> jax.Array:
    out = jax.ops.segment_max(data, segment_ids, num_segments=num_segments)
    # segment_max yields -inf for empty segments already with float data
    return jnp.where(jnp.isfinite(out), out, initial) if initial != -jnp.inf else out


def segment_softmax(
    logits: jax.Array, segment_ids: jax.Array, num_segments: int
) -> jax.Array:
    """Numerically-stable softmax within segments (HGT attention normalizer).

    The per-edge attention logits are normalized over all edges sharing a
    destination node — the sparse analog of row softmax (the SDDMM→softmax→
    SpMM pipeline of the reference's HybridHGT encoder, SURVEY §2.3).
    Out-of-range (padding) ids return 0 weight.
    """
    seg_max = jax.ops.segment_max(logits, segment_ids, num_segments=num_segments)
    seg_max = jnp.where(jnp.isfinite(seg_max), seg_max, 0.0)
    # gather per-edge max; padding ids (== num_segments) clamp to last row,
    # harmless because their weight is discarded by downstream scatter.
    shifted = logits - seg_max[jnp.minimum(segment_ids, num_segments - 1)]
    exp = jnp.exp(shifted)
    denom = jax.ops.segment_sum(exp, segment_ids, num_segments=num_segments)
    denom = jnp.maximum(denom, 1e-16)
    return exp / denom[jnp.minimum(segment_ids, num_segments - 1)]


def gather_scatter_sum(
    x_src: jax.Array,
    edge_index: jax.Array,
    num_dst: int,
    edge_weight: Optional[jax.Array] = None,
) -> jax.Array:
    """out[d] = Σ_{(s,d) ∈ E} w_e · x_src[s]  — one SpMM.

    ``edge_index`` is ``[2, E]`` (row 0 src, row 1 dst) with the padding
    convention above.  Source gathers clamp in-bounds (padding rows read
    arbitrary data but are dropped at scatter).
    """
    src, dst = edge_index[0], edge_index[1]
    msgs = x_src[jnp.minimum(src, x_src.shape[0] - 1)]
    if edge_weight is not None:
        msgs = msgs * edge_weight[:, None]
    return segment_sum(msgs, dst, num_dst)


def gather_scatter_mean(
    x_src: jax.Array,
    edge_index: jax.Array,
    num_dst: int,
) -> jax.Array:
    src, dst = edge_index[0], edge_index[1]
    msgs = x_src[jnp.minimum(src, x_src.shape[0] - 1)]
    return segment_mean(msgs, dst, num_dst)


def coalesce(edge_index: jax.Array, num_nodes: int):
    """Sort edges lexicographically and drop duplicates — the static-shape
    equivalent of ``torch_sparse.coalesce`` (reference usage at
    analysisgnn/models/chord.py:150).

    Returns ``(edges [2, E], count)``: unique edges sorted by (src, dst)
    first, duplicate slots moved to the tail as ``(num_nodes, num_nodes)``
    padding (dropped by every downstream segment op per the framework's
    padding convention).
    """
    src, dst = edge_index[0], edge_index[1]
    order = jnp.lexsort((dst, src))
    s, d = src[order], dst[order]
    dup = (s == jnp.roll(s, 1)) & (d == jnp.roll(d, 1))
    dup = dup.at[0].set(False)
    # also push pre-existing padding (src/dst out of range) to the tail
    invalid = dup | (s >= num_nodes) | (d >= num_nodes)
    s = jnp.where(invalid, num_nodes, s)
    d = jnp.where(invalid, num_nodes, d)
    keep_first = jnp.argsort(invalid, stable=True)
    out = jnp.stack([s[keep_first], d[keep_first]])
    return out, edge_index.shape[1] - invalid.sum()


def segment_min(data: jax.Array, segment_ids: jax.Array, num_segments: int) -> jax.Array:
    return jax.ops.segment_min(data, segment_ids, num_segments=num_segments)


def sddmm_dot(
    q_dst: jax.Array,
    k_src: jax.Array,
    edge_index: jax.Array,
) -> jax.Array:
    """Per-edge dot products ⟨q[dst], k[src]⟩ — the SDDMM of sparse attention.

    Returns ``[E]`` (or ``[E, H]`` when q/k are ``[N, H, D]`` multi-head).
    """
    src, dst = edge_index[0], edge_index[1]
    k = k_src[jnp.minimum(src, k_src.shape[0] - 1)]
    q = q_dst[jnp.minimum(dst, q_dst.shape[0] - 1)]
    return jnp.sum(q * k, axis=-1)
