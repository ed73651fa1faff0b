"""Pallas TPU kernels for the hot message-passing reductions.

Design: edges arrive sorted by destination (the sampler can guarantee this),
so a **node-tile grid** owns disjoint edge ranges — each program accumulates
its tile's messages in VMEM and writes once, race-free.  Per-tile edge
offsets are tiny host-computed arrays delivered via scalar prefetch
(``PrefetchScalarGridSpec``), the canonical Pallas pattern for CSR-ish
layouts.

Mosaic-hardware constraints shape the data layout (all verified by compiling
on a real v5e):
  * HBM refs cannot be indexed — edge data streams chunk-by-chunk into VMEM
    scratch via ``make_async_copy``; chunk starts are CHUNK_E-aligned (DMA
    slice offsets must respect the (8, 128) tiling), with validity masks
    covering the tile-boundary overlap,
  * destination ids are laid out ``[E/128, 128]`` (width-1 slices violate
    lane tiling) and consumed in 128-edge subrows,
  * there are no vector gathers in-kernel: per-edge node values (softmax max
    and denominator) are produced by one-hot matmuls on the MXU — the
    FusedMM-style dense-hardware formulation.

Kernels:
  * ``segment_sum_sorted`` — Σ msgs per destination node (SpMM reduction)
  * ``segment_softmax_sorted`` — numerically-stable per-destination softmax
    of attention logits (the HGT SDDMM→softmax normalizer)

Both match the jnp references in kernels/segment_ops.py
(tests/test_pallas.py runs interpret mode on CPU and compiled on TPU).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# node rows per program / edge rows per DMA chunk / edges per compute subrow
TILE_N = 256
CHUNK_E = 1024
SUBROW = 128


def tile_edge_offsets(dst_sorted: np.ndarray, num_nodes: int, tile_n: int = TILE_N) -> np.ndarray:
    """Host-side: edge offsets of each node tile (searchsorted row pointers)."""
    bounds = np.arange(0, num_nodes + tile_n, tile_n)
    return np.searchsorted(dst_sorted, bounds).astype(np.int32)


def _pad_len(e: int) -> int:
    return CHUNK_E + ((-e) % CHUNK_E)


def _prep_dst(dst_sorted: jax.Array, e: int, num_nodes: int) -> jax.Array:
    dst = jnp.pad(
        dst_sorted.astype(jnp.int32), (0, _pad_len(e)), constant_values=num_nodes
    )
    return dst.reshape(-1, SUBROW)


def _segment_sum_kernel(
    offs_ref,  # scalar-prefetch: [num_tiles + 1] int32 edge offsets
    msgs_ref,  # [E_pad, F] messages in HBM
    dst_ref,  # [E_pad/128, 128] int32 sorted destination ids in HBM
    out_ref,  # [TILE_N, F] output tile (VMEM)
    acc_ref,  # VMEM scratch [TILE_N, F]
    msgs_buf,  # VMEM scratch [CHUNK_E, F]
    dst_buf,  # VMEM scratch [CHUNK_E/128, 128]
    sems,  # DMA semaphores (2,)
):
    t = pl.program_id(0)
    start = offs_ref[t]
    end = offs_ref[t + 1]
    base = t * TILE_N
    acc_ref[...] = jnp.zeros_like(acc_ref)

    aligned = (start // CHUNK_E) * CHUNK_E
    num_chunks = pl.cdiv(end - aligned, CHUNK_E)

    def body(c, _):
        e0 = pl.multiple_of(aligned + c * CHUNK_E, CHUNK_E)
        r0 = e0 // SUBROW
        cp_m = pltpu.make_async_copy(
            msgs_ref.at[pl.ds(e0, CHUNK_E), :], msgs_buf, sems.at[0]
        )
        cp_d = pltpu.make_async_copy(
            dst_ref.at[pl.ds(r0, CHUNK_E // SUBROW), :], dst_buf, sems.at[1]
        )
        cp_m.start()
        cp_d.start()
        cp_m.wait()
        cp_d.wait()

        def subrow(r, _):
            dst = dst_buf[r, :]  # [128]
            pos = e0 + r * SUBROW + jax.lax.broadcasted_iota(
                jnp.int32, (SUBROW, 1), 0
            )[:, 0]
            valid = (pos >= start) & (pos < end)
            local = jnp.where(valid, dst - base, TILE_N)
            onehot = (
                jax.lax.broadcasted_iota(jnp.int32, (SUBROW, TILE_N), 1)
                == local[:, None]
            ).astype(jnp.float32)
            msgs = msgs_buf[pl.ds(r * SUBROW, SUBROW), :]
            acc_ref[...] += jax.lax.dot_general(
                onehot,
                msgs,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
            return 0

        jax.lax.fori_loop(0, CHUNK_E // SUBROW, subrow, 0)
        return 0

    jax.lax.fori_loop(0, num_chunks, body, 0)
    out_ref[...] = acc_ref[...]


def _mean_base_kernel(
    m_seg,  # static: segment rows per relation block (x tile wraps mod m)
    offs_ref,  # scalar-prefetch: [num_tiles + 1] int32 edge offsets
    msgs_ref,  # [E_pad, F] messages in HBM
    seg_ref,  # [E_pad/128, 128] int32 sorted segment ids in HBM
    x_ref,  # [TILE_N, F] base-value tile (VMEM, auto-pipelined)
    out_ref,  # [TILE_N, F] (x + Σ msgs) / max(count, 1)
    cnt_ref,  # [TILE_N, 128] edge counts (col 0; MXU ones-product)
    msgs_buf,  # VMEM scratch [CHUNK_E, F]
    seg_buf,  # VMEM scratch [CHUNK_E/128, 128]
    sems,  # DMA semaphores (2,)
):
    t = pl.program_id(0)
    start = offs_ref[t]
    end = offs_ref[t + 1]
    base = t * TILE_N
    aligned = (start // CHUNK_E) * CHUNK_E
    num_chunks = pl.cdiv(end - aligned, CHUNK_E)

    def body(c, carry):
        acc, cnt = carry
        e0 = pl.multiple_of(aligned + c * CHUNK_E, CHUNK_E)
        r0 = e0 // SUBROW
        cp_m = pltpu.make_async_copy(
            msgs_ref.at[pl.ds(e0, CHUNK_E), :], msgs_buf, sems.at[0]
        )
        cp_d = pltpu.make_async_copy(
            seg_ref.at[pl.ds(r0, CHUNK_E // SUBROW), :], seg_buf, sems.at[1]
        )
        cp_m.start()
        cp_d.start()
        cp_m.wait()
        cp_d.wait()
        # one [CHUNK_E, TILE_N] one-hot → ONE MXU contraction per chunk
        # (contraction dim 1024 — vs 8 skinny 128-deep dots per chunk in
        # segment_sum_sorted, which underfeeds the systolic array)
        blocks = []
        for r in range(CHUNK_E // SUBROW):  # static unroll
            seg = seg_buf[r, :]  # [128]
            pos = e0 + r * SUBROW + jax.lax.broadcasted_iota(
                jnp.int32, (SUBROW, 1), 0
            )[:, 0]
            valid = (pos >= start) & (pos < end)
            local = jnp.where(valid, seg - base, TILE_N)
            blocks.append(
                (
                    jax.lax.broadcasted_iota(jnp.int32, (SUBROW, TILE_N), 1)
                    == local[:, None]
                ).astype(jnp.float32)
            )
        oh = jnp.concatenate(blocks, axis=0)  # [CHUNK_E, TILE_N]
        acc = acc + jax.lax.dot_general(
            oh,
            msgs_buf[...],
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        cnt = cnt + jax.lax.dot_general(
            oh,
            jnp.ones((CHUNK_E, 128), jnp.float32),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,
        )
        return acc, cnt

    acc0 = jnp.zeros(out_ref.shape, jnp.float32)
    cnt0 = jnp.zeros(cnt_ref.shape, jnp.float32)
    acc, cnt = jax.lax.fori_loop(0, num_chunks, body, (acc0, cnt0))
    cnt_ref[...] = cnt
    out_ref[...] = (x_ref[...] + acc) / jnp.maximum(cnt[:, :1], 1.0)


def _mean_base_pallas(
    msgs: jax.Array,  # [E, F]
    seg_sorted: jax.Array,  # [E] ascending segment ids in [0, S)
    x_base: jax.Array,  # [m, F] per-segment base values, tiled mod m
    tile_offsets: jax.Array,  # [S/TILE_N + 1]
    num_segments: int,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    e, f = msgs.shape
    m = x_base.shape[0]
    f_pad = (-f) % 128
    fp = f + f_pad
    msgs = jnp.pad(msgs, ((0, _pad_len(e)), (0, f_pad)))
    x_base = jnp.pad(x_base, ((0, 0), (0, f_pad)))
    seg_mat = _prep_dst(seg_sorted, e, num_segments)
    assert num_segments % TILE_N == 0 and m % TILE_N == 0, (num_segments, m)
    num_tiles = num_segments // TILE_N
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),
            pl.BlockSpec(
                (TILE_N, fp),
                lambda t, offs: ((t * TILE_N % m) // TILE_N, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=[
            pl.BlockSpec((TILE_N, fp), lambda t, offs: (t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_N, 128), lambda t, offs: (t, 0), memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((CHUNK_E, fp), jnp.float32),
            pltpu.VMEM((CHUNK_E // SUBROW, SUBROW), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    import functools

    agg, cnt = pl.pallas_call(
        functools.partial(_mean_base_kernel, m),
        out_shape=[
            jax.ShapeDtypeStruct((num_segments, fp), jnp.float32),
            jax.ShapeDtypeStruct((num_segments, 128), jnp.float32),
        ],
        grid_spec=grid_spec,
        interpret=interpret,
    )(tile_offsets, msgs, seg_mat, x_base)
    return agg[:, :f], cnt[:, 0]


def _smb_impl(msgs, seg_sorted, x_base, tile_offsets, num_segments, interpret):
    return _mean_base_pallas(
        msgs, seg_sorted, x_base, tile_offsets, num_segments, interpret
    )


import functools as _functools


@_functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def segment_mean_base_sorted(
    msgs: jax.Array,
    seg_sorted: jax.Array,
    x_base: jax.Array,
    tile_offsets: jax.Array,
    num_segments: int,
    interpret: bool = False,
) -> jax.Array:
    """``out[s] = (x_base[s % m] + Σ_{seg==s} msgs) / max(count_s, 1)`` for
    SORTED segment ids — the fused-SAGE mean-with-base aggregation
    (models/fused.py) as ONE Pallas kernel (sum + counts + mean epilogue)
    instead of two XLA scatters + gather + divide.

    Differentiable: the backward pass is pure XLA (one gather + one reduce)
    — ``d msgs = (g/c)[seg]``, ``d x_base = Σ_rel (g/c)`` — so only the
    forward needs the kernel.
    """
    agg, _ = _smb_impl(msgs, seg_sorted, x_base, tile_offsets, num_segments, interpret)
    return agg


def _smb_fwd(msgs, seg_sorted, x_base, tile_offsets, num_segments, interpret):
    agg, cnt = _smb_impl(
        msgs, seg_sorted, x_base, tile_offsets, num_segments, interpret
    )
    return agg, (seg_sorted, cnt, x_base.shape[0])


def _smb_bwd(num_segments, interpret, res, g):
    seg_sorted, cnt, m = res
    gd = g / jnp.maximum(cnt, 1.0)[:, None]
    dmsgs = gd[jnp.minimum(seg_sorted, num_segments - 1)]
    dx = gd.reshape(-1, m, g.shape[-1]).sum(0)
    return dmsgs, None, dx, None


segment_mean_base_sorted.defvjp(_smb_fwd, _smb_bwd)


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
    msgs = jnp.pad(msgs, ((0, _pad_len(e)), (0, 0)))
    dst_mat = _prep_dst(dst_sorted, e, num_nodes)
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
            pltpu.VMEM((CHUNK_E // SUBROW, SUBROW), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        _segment_sum_kernel,
        out_shape=jax.ShapeDtypeStruct((padded_nodes, f), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(tile_offsets, msgs, dst_mat)
    return out[:num_nodes]


def _segment_softmax_kernel(
    true_h,
    offs_ref,
    logits_ref,  # [E_pad, H] in HBM
    dst_ref,  # [E_pad/128, 128] in HBM
    out_ref,  # [E_pad, H] in HBM
    max_ref,  # scratch [TILE_N, H]
    sum_ref,  # scratch [TILE_N, H]
    logit_buf,  # scratch [CHUNK_E, H]
    dst_buf,  # scratch [CHUNK_E/128, 128]
    out_buf,  # scratch [CHUNK_E, H]
    sems,  # DMA semaphores (3,)
):
    t = pl.program_id(0)
    start = offs_ref[t]
    end = offs_ref[t + 1]
    base = t * TILE_N
    max_ref[...] = jnp.full_like(max_ref, -jnp.inf)
    sum_ref[...] = jnp.zeros_like(sum_ref)
    aligned = (start // CHUNK_E) * CHUNK_E
    num_chunks = pl.cdiv(end - aligned, CHUNK_E)

    def load_chunk(c):
        e0 = pl.multiple_of(aligned + c * CHUNK_E, CHUNK_E)
        r0 = e0 // SUBROW
        cp_l = pltpu.make_async_copy(
            logits_ref.at[pl.ds(e0, CHUNK_E), :], logit_buf, sems.at[0]
        )
        cp_d = pltpu.make_async_copy(
            dst_ref.at[pl.ds(r0, CHUNK_E // SUBROW), :], dst_buf, sems.at[1]
        )
        cp_l.start()
        cp_d.start()
        cp_l.wait()
        cp_d.wait()
        return e0

    def subrow_parts(e0, r):
        dst = dst_buf[r, :]
        pos = e0 + r * SUBROW + jax.lax.broadcasted_iota(
            jnp.int32, (SUBROW, 1), 0
        )[:, 0]
        valid = (pos >= start) & (pos < end)
        local = jnp.where(valid, dst - base, TILE_N)
        onehot = (
            jax.lax.broadcasted_iota(jnp.int32, (SUBROW, TILE_N), 1)
            == local[:, None]
        )
        logits = logit_buf[pl.ds(r * SUBROW, SUBROW), :]
        return logits, onehot, valid

    # pass 1: per-node max
    def pass1(c, _):
        e0 = load_chunk(c)

        def subrow(r, _):
            logits, onehot, valid = subrow_parts(e0, r)
            keep = onehot & valid[:, None]  # [S, T]
            cols = []
            for hh in range(true_h):  # true head count, a small static int
                lh = jnp.broadcast_to(logits[:, hh][:, None], keep.shape)
                masked = jnp.where(keep, lh, -jnp.inf)
                cols.append(masked.max(axis=0)[:, None])  # [T, 1]
            pad = max_ref.shape[1] - true_h
            if pad:
                cols.append(jnp.zeros((keep.shape[1], pad), jnp.float32))
            max_ref[...] = jnp.maximum(max_ref[...], jnp.concatenate(cols, axis=1))
            return 0

        jax.lax.fori_loop(0, CHUNK_E // SUBROW, subrow, 0)
        return 0

    jax.lax.fori_loop(0, num_chunks, pass1, 0)
    node_max = jnp.where(jnp.isfinite(max_ref[...]), max_ref[...], 0.0)

    # pass 2: exp-sum (per-edge max via one-hot matmul, no gathers)
    def pass2(c, _):
        e0 = load_chunk(c)

        def subrow(r, _):
            logits, onehot, valid = subrow_parts(e0, r)
            oh = onehot.astype(jnp.float32)
            edge_max = jax.lax.dot_general(
                oh, node_max, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
            mine = valid & onehot.any(axis=1)
            ex = jnp.where(mine[:, None], jnp.exp(logits - edge_max), 0.0)
            sum_ref[...] += jax.lax.dot_general(
                oh, ex, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
            return 0

        jax.lax.fori_loop(0, CHUNK_E // SUBROW, subrow, 0)
        return 0

    jax.lax.fori_loop(0, num_chunks, pass2, 0)
    denom = jnp.maximum(sum_ref[...], 1e-16)

    # pass 3: normalized weights blended into the output (chunks overlap
    # neighbouring tiles; RMW is safe — the TPU grid runs sequentially)
    def pass3(c, _):
        e0 = load_chunk(c)
        cp_in = pltpu.make_async_copy(
            out_ref.at[pl.ds(e0, CHUNK_E), :], out_buf, sems.at[2]
        )
        cp_in.start()
        cp_in.wait()

        def subrow(r, _):
            logits, onehot, valid = subrow_parts(e0, r)
            oh = onehot.astype(jnp.float32)
            edge_max = jax.lax.dot_general(
                oh, node_max, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
            edge_denom = jax.lax.dot_general(
                oh, denom, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
            mine = valid & onehot.any(axis=1)
            w = jnp.exp(logits - edge_max) / jnp.maximum(edge_denom, 1e-16)
            sl = pl.ds(r * SUBROW, SUBROW)
            out_buf[sl, :] = jnp.where(mine[:, None], w, out_buf[sl, :])
            return 0

        jax.lax.fori_loop(0, CHUNK_E // SUBROW, subrow, 0)
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
    """Per-destination softmax of [E, H] logits (destinations sorted).

    The head axis is padded to the 128-lane tile on the host (HBM DMA slices
    must cover full lane tiles); padded columns are sliced off on return.
    """
    e, h = logits.shape
    h_pad = ((-h) % 128)
    logits = jnp.pad(logits, ((0, _pad_len(e)), (0, h_pad)))
    dst_mat = _prep_dst(dst_sorted, e, num_nodes)
    num_tiles = pl.cdiv(num_nodes, TILE_N)
    hp = h + h_pad
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),
        scratch_shapes=[
            pltpu.VMEM((TILE_N, hp), jnp.float32),
            pltpu.VMEM((TILE_N, hp), jnp.float32),
            pltpu.VMEM((CHUNK_E, hp), jnp.float32),
            pltpu.VMEM((CHUNK_E // SUBROW, SUBROW), jnp.int32),
            pltpu.VMEM((CHUNK_E, hp), jnp.float32),
            pltpu.SemaphoreType.DMA((3,)),
        ],
    )
    import functools

    out = pl.pallas_call(
        functools.partial(_segment_softmax_kernel, h),
        out_shape=jax.ShapeDtypeStruct((logits.shape[0], hp), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(tile_offsets, logits, dst_mat)
    return out[:e, :h]


# --------------------------------------------------------------------------- #
# Fused segment softmax + weighted aggregation (the HGT attention reduction)
# --------------------------------------------------------------------------- #


def _softmax_agg_kernel(
    true_h,  # static: real head count (H)
    d_dim,  # static: per-head feature width (D); msgs layout is head-major
    num_blocks,  # static: relation-block count (R)
    tiles_per_block,  # static: m / TILE_N
    offs_ref,  # scalar-prefetch: [R * tiles_per_block + 1] int32
    logits_ref,  # [E_pad, Hp] HBM
    msgs_ref,  # [E_pad, Fp] HBM
    seg_ref,  # [E_pad/128, 128] int32 block-major segment ids in HBM
    num_ref,  # out [TILE_N, Fp] Σ exp-weighted msgs
    den_ref,  # out [TILE_N, Hp] Σ exp weights
    max_ref,  # out [TILE_N, Hp] per-node max (saved for backward)
    logit_buf,  # scratch [CHUNK_E, Hp]
    msgs_buf,  # scratch [CHUNK_E, Fp]
    seg_buf,  # scratch [CHUNK_E/128, 128]
    sems,  # DMA semaphores (3,)
):
    t = pl.program_id(0)
    hp = logit_buf.shape[1]
    fp = msgs_buf.shape[1]

    max_ref[...] = jnp.full_like(max_ref, -jnp.inf)

    def block_ranges(r):
        start = offs_ref[r * tiles_per_block + t]
        end = offs_ref[r * tiles_per_block + t + 1]
        return start, end

    def load_chunk(e0, want_msgs):
        r0 = e0 // SUBROW
        cp_l = pltpu.make_async_copy(
            logits_ref.at[pl.ds(e0, CHUNK_E), :], logit_buf, sems.at[0]
        )
        cp_d = pltpu.make_async_copy(
            seg_ref.at[pl.ds(r0, CHUNK_E // SUBROW), :], seg_buf, sems.at[1]
        )
        cp_l.start()
        cp_d.start()
        if want_msgs:
            cp_m = pltpu.make_async_copy(
                msgs_ref.at[pl.ds(e0, CHUNK_E), :], msgs_buf, sems.at[2]
            )
            cp_m.start()
            cp_m.wait()
        cp_l.wait()
        cp_d.wait()

    def subrow_parts(r, e0, sub, start, end):
        seg = seg_buf[sub, :]
        pos = e0 + sub * SUBROW + jax.lax.broadcasted_iota(
            jnp.int32, (SUBROW, 1), 0
        )[:, 0]
        valid = (pos >= start) & (pos < end)
        base = r * (tiles_per_block * TILE_N) + t * TILE_N
        local = jnp.where(valid, seg - base, TILE_N)
        local = jnp.where((local >= 0) & (local <= TILE_N), local, TILE_N)
        onehot = (
            jax.lax.broadcasted_iota(jnp.int32, (SUBROW, TILE_N), 1)
            == local[:, None]
        )
        return onehot, valid

    # ---- pass 1: per-node max over ALL relation blocks ----
    def pass1_block(r, _):
        start, end = block_ranges(r)
        aligned = (start // CHUNK_E) * CHUNK_E
        num_chunks = pl.cdiv(end - aligned, CHUNK_E)

        def chunk(c, _):
            e0 = pl.multiple_of(aligned + c * CHUNK_E, CHUNK_E)
            load_chunk(e0, want_msgs=False)

            def subrow(sub, _):
                onehot, valid = subrow_parts(r, e0, sub, start, end)
                keep = onehot & valid[:, None]
                logits = logit_buf[pl.ds(sub * SUBROW, SUBROW), :]
                cols = []
                for hh in range(true_h):
                    lh = jnp.broadcast_to(logits[:, hh][:, None], keep.shape)
                    cols.append(
                        jnp.where(keep, lh, -jnp.inf).max(axis=0)[:, None]
                    )
                pad = hp - true_h
                if pad:
                    cols.append(
                        jnp.full((keep.shape[1], pad), -jnp.inf, jnp.float32)
                    )
                max_ref[...] = jnp.maximum(
                    max_ref[...], jnp.concatenate(cols, axis=1)
                )
                return 0

            jax.lax.fori_loop(0, CHUNK_E // SUBROW, subrow, 0)
            return 0

        jax.lax.fori_loop(0, num_chunks, chunk, 0)
        return 0

    jax.lax.fori_loop(0, num_blocks, pass1_block, 0)
    node_max = jnp.where(jnp.isfinite(max_ref[...]), max_ref[...], 0.0)
    max_ref[...] = node_max

    # H→F expander: ex_full[:, h*D:(h+1)*D] = ex[:, h] via ONE MXU matmul;
    # padded head rows (h ≥ true_h) and padded feature columns map to zero
    expander = (
        jax.lax.broadcasted_iota(jnp.int32, (hp, fp), 1) // d_dim
        == jax.lax.broadcasted_iota(jnp.int32, (hp, fp), 0)
    ).astype(jnp.float32)

    # ---- pass 2: exp-weighted sums + denominators ----
    def pass2_block(r, carry):
        num_acc, den_acc = carry
        start, end = block_ranges(r)
        aligned = (start // CHUNK_E) * CHUNK_E
        num_chunks = pl.cdiv(end - aligned, CHUNK_E)

        def chunk(c, carry2):
            num_acc, den_acc = carry2
            e0 = pl.multiple_of(aligned + c * CHUNK_E, CHUNK_E)
            load_chunk(e0, want_msgs=True)

            def subrow(sub, carry3):
                num_acc, den_acc = carry3
                onehot, valid = subrow_parts(r, e0, sub, start, end)
                oh = onehot.astype(jnp.float32)
                logits = logit_buf[pl.ds(sub * SUBROW, SUBROW), :]
                edge_max = jax.lax.dot_general(
                    oh, node_max,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                )
                mine = valid & onehot.any(axis=1)
                ex = jnp.where(mine[:, None], jnp.exp(logits - edge_max), 0.0)
                den_acc = den_acc + jax.lax.dot_general(
                    oh, ex, dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                )
                ex_full = jax.lax.dot_general(
                    ex, expander, dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                )
                weighted = msgs_buf[pl.ds(sub * SUBROW, SUBROW), :] * ex_full
                num_acc = num_acc + jax.lax.dot_general(
                    oh, weighted, dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                )
                return num_acc, den_acc

            return jax.lax.fori_loop(
                0, CHUNK_E // SUBROW, subrow, (num_acc, den_acc)
            )

        return jax.lax.fori_loop(0, num_chunks, chunk, (num_acc, den_acc))

    num0 = jnp.zeros(num_ref.shape, jnp.float32)
    den0 = jnp.zeros(den_ref.shape, jnp.float32)
    num_acc, den_acc = jax.lax.fori_loop(
        0, num_blocks, pass2_block, (num0, den0)
    )
    num_ref[...] = num_acc
    den_ref[...] = den_acc


def _ssa_impl(logits, msgs, seg_sorted, tile_offsets, m, num_blocks, interpret):
    e, h = logits.shape
    _, f = msgs.shape
    hp = h + ((-h) % 128)
    d_dim = f // h  # per-head feature width (msgs layout head-major [E, H·D])
    fp = f + ((-f) % 128)
    logits_p = jnp.pad(logits, ((0, _pad_len(e)), (0, hp - h)))
    msgs_p = jnp.pad(msgs, ((0, _pad_len(e)), (0, fp - f)))
    seg_mat = _prep_dst(seg_sorted, e, num_blocks * m)
    tiles_per_block = m // TILE_N
    num_tiles = tiles_per_block
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),
        ],
        out_specs=[
            pl.BlockSpec((TILE_N, fp), lambda t, offs: (t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_N, hp), lambda t, offs: (t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_N, hp), lambda t, offs: (t, 0), memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((CHUNK_E, hp), jnp.float32),
            pltpu.VMEM((CHUNK_E, fp), jnp.float32),
            pltpu.VMEM((CHUNK_E // SUBROW, SUBROW), jnp.int32),
            pltpu.SemaphoreType.DMA((3,)),
        ],
    )
    import functools

    num, den, mx = pl.pallas_call(
        functools.partial(
            _softmax_agg_kernel, h, d_dim, num_blocks, tiles_per_block
        ),
        out_shape=[
            jax.ShapeDtypeStruct((m, fp), jnp.float32),
            jax.ShapeDtypeStruct((m, hp), jnp.float32),
            jax.ShapeDtypeStruct((m, hp), jnp.float32),
        ],
        grid_spec=grid_spec,
        interpret=interpret,
    )(tile_offsets, logits_p, msgs_p, seg_mat)
    return num[:, :f], den[:, :h], mx[:, :h]


@_functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def segment_softmax_agg_sorted(
    logits: jax.Array,  # [E, H]
    msgs: jax.Array,  # [E, H*D], head-major feature layout
    seg_sorted: jax.Array,  # [E] block-major ids rel*m + node, ascending
    tile_offsets: jax.Array,  # [num_blocks * (m/TILE_N) + 1] int32
    m: int,  # padded node count (multiple of TILE_N, > max node id)
    num_blocks: int,  # relation-block count
    interpret: bool = False,
) -> jax.Array:
    """Fused segment softmax + weighted aggregation over sorted block-major
    edges: ``out[n] = Σ_e softmax_n(logits)_e · msgs_e`` where the softmax
    normalizes over ALL of node n's edges across every relation block — the
    HGT typed-attention reduction (models/encoders.py::HGTLayer) as ONE
    kernel instead of segment_max + exp + mul + packed segment_sum + divide.

    Edges must be sorted ascending by ``rel * m + node`` (the sampler's
    src-sorted relation-major layout, same precondition as
    ``segment_mean_base_sorted``).  Backward is pure XLA (gathers only, no
    scatters): per-edge weights are recomputed from the saved per-node max
    and denominator.
    """
    num, den, _mx = _ssa_impl(
        logits, msgs, seg_sorted, tile_offsets, m, num_blocks, interpret
    )
    d_dim = msgs.shape[1] // logits.shape[1]
    return num / jnp.repeat(jnp.maximum(den, 1e-16), d_dim, axis=1)


def _ssa_fwd(logits, msgs, seg_sorted, tile_offsets, m, num_blocks, interpret):
    num, den, mx = _ssa_impl(
        logits, msgs, seg_sorted, tile_offsets, m, num_blocks, interpret
    )
    h = logits.shape[1]
    d_dim = msgs.shape[1] // h
    den_c = jnp.maximum(den, 1e-16)
    out = num / jnp.repeat(den_c, d_dim, axis=1)
    return out, (logits, msgs, seg_sorted, mx, den_c, out)


def _ssa_bwd(m, num_blocks, interpret, res, g):
    logits, msgs, seg_sorted, mx, den, out = res
    e, h = logits.shape
    d_dim = msgs.shape[1] // h
    node = jnp.minimum(seg_sorted % m, m - 1)  # node id of each edge
    w = jnp.exp(logits - mx[node]) / den[node]  # [E, H] recomputed weights
    # zero the weights of padding edges (node row ≥ real count is harmless —
    # their gradient lands on sliced-off rows anyway)
    g_e = g[node]  # [E, H*D]
    dmsgs = jnp.repeat(w, d_dim, axis=1) * g_e
    # d logits[e,h] = w * (<msgs_e, g_n>_h - <out_n, g_n>_h)
    mg = (msgs * g_e).reshape(e, h, d_dim).sum(-1)
    og = (out * g).reshape(m, h, d_dim).sum(-1)  # [m, H]
    dlogits = w * (mg - og[node])
    return dlogits, dmsgs, None, None


segment_softmax_agg_sorted.defvjp(_ssa_fwd, _ssa_bwd)
