"""Pallas TPU kernels for the hot message-passing reductions.

Design: edges arrive sorted by destination (the sampler can guarantee this),
so a **node-tile grid** owns disjoint edge ranges — each program accumulates
its tile's messages in VMEM and writes once, race-free.  Per-tile edge
offsets are tiny host-computed arrays delivered via scalar prefetch
(``PrefetchScalarGridSpec``), the canonical Pallas pattern for CSR-ish
layouts.  Edge data lives in HBM and is streamed chunk-by-chunk into VMEM
scratch with ``make_async_copy`` (HBM refs cannot be indexed directly).

Kernels:
  * ``segment_sum_sorted`` — Σ msgs per destination node (SpMM reduction)
  * ``segment_softmax_sorted`` — numerically-stable per-destination softmax
    of attention logits (the HGT SDDMM→softmax normalizer)

Both have jnp reference implementations in kernels/segment_ops.py and are
validated against them (tests/test_pallas.py, interpret mode on CPU;
compiled + verified on the real chip as well).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# node rows per program / edge rows per inner chunk
TILE_N = 256
CHUNK_E = 512


def tile_edge_offsets(dst_sorted: np.ndarray, num_nodes: int, tile_n: int = TILE_N) -> np.ndarray:
    """Host-side: edge offsets of each node tile (searchsorted row pointers)."""
    bounds = np.arange(0, num_nodes + tile_n, tile_n)
    return np.searchsorted(dst_sorted, bounds).astype(np.int32)


def _pad_edges(arrs, e, fill_vals):
    """Pad the edge axis so a chunk slice starting anywhere < e stays in
    bounds (a clamped dynamic-slice start would misalign validity masks)."""
    pad_e = CHUNK_E + ((-e) % CHUNK_E)
    return [
        jnp.pad(
            a,
            ((0, pad_e),) + ((0, 0),) * (a.ndim - 1),
            constant_values=fv,
        )
        for a, fv in zip(arrs, fill_vals)
    ]


def _segment_sum_kernel(
    offs_ref,  # scalar-prefetch: [num_tiles + 1] int32 edge offsets
    msgs_ref,  # [E, F] messages in HBM
    dst_ref,  # [E, 1] int32 sorted destination ids in HBM
    out_ref,  # [TILE_N, F] output tile (VMEM)
    acc_ref,  # VMEM scratch [TILE_N, F]
    msgs_buf,  # VMEM scratch [CHUNK_E, F]
    dst_buf,  # VMEM scratch [CHUNK_E, 1]
    sems,  # DMA semaphores (2,)
):
    t = pl.program_id(0)
    start = offs_ref[t]
    end = offs_ref[t + 1]
    base = t * TILE_N
    acc_ref[...] = jnp.zeros_like(acc_ref)

    num_chunks = pl.cdiv(end - start, CHUNK_E)

    def body(c, _):
        e0 = start + c * CHUNK_E
        cp_m = pltpu.make_async_copy(
            msgs_ref.at[pl.ds(e0, CHUNK_E), :], msgs_buf, sems.at[0]
        )
        cp_d = pltpu.make_async_copy(
            dst_ref.at[pl.ds(e0, CHUNK_E), :], dst_buf, sems.at[1]
        )
        cp_m.start()
        cp_d.start()
        cp_m.wait()
        cp_d.wait()
        msgs = msgs_buf[...]
        dst = dst_buf[...][:, 0]
        valid = (jax.lax.broadcasted_iota(jnp.int32, (CHUNK_E, 1), 0)[:, 0] + e0) < end
        local = jnp.where(valid, dst - base, TILE_N)  # out-of-tile → dropped
        onehot = (
            jax.lax.broadcasted_iota(jnp.int32, (CHUNK_E, TILE_N), 1)
            == local[:, None]
        ).astype(msgs.dtype)
        acc_ref[...] += jax.lax.dot_general(
            onehot,
            msgs,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return 0

    jax.lax.fori_loop(0, num_chunks, body, 0)
    out_ref[...] = acc_ref[...]


def segment_sum_sorted(
    msgs: jax.Array,
    dst_sorted: jax.Array,
    tile_offsets: jax.Array,
    num_nodes: int,
    interpret: bool = False,
) -> jax.Array:
    """Σ msgs per destination (destinations sorted ascending).

    ``tile_offsets`` comes from :func:`tile_edge_offsets` (host side).
    """
    e, f = msgs.shape
    dst2d = dst_sorted.reshape(-1, 1).astype(jnp.int32)
    msgs, dst2d = _pad_edges([msgs, dst2d], e, [0, num_nodes])
    num_tiles = pl.cdiv(num_nodes, TILE_N)
    padded_nodes = num_tiles * TILE_N
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),
        ],
        out_specs=pl.BlockSpec(
            (TILE_N, f), lambda t, offs: (t, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((TILE_N, f), jnp.float32),
            pltpu.VMEM((CHUNK_E, f), jnp.float32),
            pltpu.VMEM((CHUNK_E, 1), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        _segment_sum_kernel,
        out_shape=jax.ShapeDtypeStruct((padded_nodes, f), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(tile_offsets, msgs, dst2d)
    return out[:num_nodes]


def _segment_softmax_kernel(
    offs_ref,
    logits_ref,  # [E, H] in HBM
    dst_ref,  # [E, 1] in HBM
    out_ref,  # [E, H] in HBM
    max_ref,  # scratch [TILE_N, H]
    sum_ref,  # scratch [TILE_N, H]
    logit_buf,  # scratch [CHUNK_E, H]
    dst_buf,  # scratch [CHUNK_E, 1]
    out_buf,  # scratch [CHUNK_E, H]
    sems,  # DMA semaphores (3,)
):
    t = pl.program_id(0)
    start = offs_ref[t]
    end = offs_ref[t + 1]
    base = t * TILE_N
    max_ref[...] = jnp.full_like(max_ref, -jnp.inf)
    sum_ref[...] = jnp.zeros_like(sum_ref)
    num_chunks = pl.cdiv(end - start, CHUNK_E)

    def onehot_of(local):
        return (
            jax.lax.broadcasted_iota(jnp.int32, (CHUNK_E, TILE_N), 1)
            == local[:, None]
        )

    def load_chunk(c):
        e0 = start + c * CHUNK_E
        cp_l = pltpu.make_async_copy(
            logits_ref.at[pl.ds(e0, CHUNK_E), :], logit_buf, sems.at[0]
        )
        cp_d = pltpu.make_async_copy(
            dst_ref.at[pl.ds(e0, CHUNK_E), :], dst_buf, sems.at[1]
        )
        cp_l.start()
        cp_d.start()
        cp_l.wait()
        cp_d.wait()
        logits = logit_buf[...]
        dst = dst_buf[...][:, 0]
        valid = (jax.lax.broadcasted_iota(jnp.int32, (CHUNK_E, 1), 0)[:, 0] + e0) < end
        local = jnp.where(valid, dst - base, TILE_N)
        return e0, logits, local, valid

    # pass 1: per-node max
    def pass1(c, _):
        _, logits, local, valid = load_chunk(c)
        oh = onehot_of(local)  # [CHUNK, TILE_N] bool
        masked = jnp.where(
            oh[:, :, None],
            jnp.where(valid[:, None, None], logits[:, None, :], -jnp.inf),
            -jnp.inf,
        )
        max_ref[...] = jnp.maximum(max_ref[...], masked.max(axis=0))
        return 0

    jax.lax.fori_loop(0, num_chunks, pass1, 0)
    node_max = jnp.where(jnp.isfinite(max_ref[...]), max_ref[...], 0.0)

    # pass 2: exp-sum
    def pass2(c, _):
        _, logits, local, valid = load_chunk(c)
        safe_local = jnp.minimum(local, TILE_N - 1)
        shifted = logits - node_max[safe_local]
        ex = jnp.where(valid[:, None] & (local < TILE_N)[:, None], jnp.exp(shifted), 0.0)
        oh = onehot_of(local).astype(jnp.float32)
        sum_ref[...] += jax.lax.dot_general(
            oh, ex, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return 0

    jax.lax.fori_loop(0, num_chunks, pass2, 0)
    denom = jnp.maximum(sum_ref[...], 1e-16)

    # pass 3: normalized weights written back per chunk
    def pass3(c, _):
        e0, logits, local, valid = load_chunk(c)
        safe_local = jnp.minimum(local, TILE_N - 1)
        ex = jnp.where(
            valid[:, None] & (local < TILE_N)[:, None],
            jnp.exp(logits - node_max[safe_local]),
            0.0,
        )
        out_buf[...] = ex / denom[safe_local]
        cp_o = pltpu.make_async_copy(
            out_buf, out_ref.at[pl.ds(e0, CHUNK_E), :], sems.at[2]
        )
        cp_o.start()
        cp_o.wait()
        return 0

    jax.lax.fori_loop(0, num_chunks, pass3, 0)


def segment_softmax_sorted(
    logits: jax.Array,
    dst_sorted: jax.Array,
    tile_offsets: jax.Array,
    num_nodes: int,
    interpret: bool = False,
) -> jax.Array:
    """Per-destination softmax of [E, H] logits (destinations sorted)."""
    e, h = logits.shape
    dst2d = dst_sorted.reshape(-1, 1).astype(jnp.int32)
    logits, dst2d = _pad_edges([logits, dst2d], e, [0, num_nodes])
    num_tiles = pl.cdiv(num_nodes, TILE_N)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),
        scratch_shapes=[
            pltpu.VMEM((TILE_N, h), jnp.float32),
            pltpu.VMEM((TILE_N, h), jnp.float32),
            pltpu.VMEM((CHUNK_E, h), jnp.float32),
            pltpu.VMEM((CHUNK_E, 1), jnp.int32),
            pltpu.VMEM((CHUNK_E, h), jnp.float32),
            pltpu.SemaphoreType.DMA((3,)),
        ],
    )
    out = pl.pallas_call(
        _segment_softmax_kernel,
        out_shape=jax.ShapeDtypeStruct((logits.shape[0], h), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(tile_offsets, logits, dst2d)
    return out[:e]
