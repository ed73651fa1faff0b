"""Relation-weighted matmul: ``out[n] = Σ_t α[t,n] · (x[n] @ w[t])``.

This is the "base" term of the edge-impl fused SAGE (models/fused.py
layout 2): every relation contributes the aggregating node's own features
through its W_agg, scaled by that node's per-relation inverse edge count.
As an XLA einsum (``'tn,nf,tfg->ng'``) the contraction must materialize a
[T, N, F] or [T, N, G] intermediate in HBM (dots cannot fuse elementwise
producers), which at the large roofline shape is ~0.9 GB per layer per
direction.  Tiled over N with the [T, F, G] weights resident in VMEM, the
kernel reads x once, reads α once, and writes out once — the intermediate
never exists.

FLOPs are unchanged (T·N·F·G) — at 6.9% MXU utilization they are free;
bytes are the binding constraint (bench_queue/roofline.json).

Forward + both backward passes are Pallas (the dw/dα backward accumulates
into a constant output block across the sequential TPU grid).  Exactness
vs the einsum reference: tests/test_pallas_relmm.py (interpret mode on
CPU, compiled on TPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_N = 256


def _fwd_kernel(t_rel, x_ref, w_ref, a_ref, out_ref):
    acc = jnp.zeros(out_ref.shape, jnp.float32)
    for t in range(t_rel):  # static unroll over relations
        acc += a_ref[t, :][:, None] * jnp.dot(
            x_ref[...], w_ref[t],
            preferred_element_type=jnp.float32,
        )
    out_ref[...] = acc


def _dwa_kernel(t_rel, x_ref, g_ref, w_ref, a_ref, dw_ref, da_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        dw_ref[...] = jnp.zeros_like(dw_ref)

    for t in range(t_rel):
        xw = jnp.dot(x_ref[...], w_ref[t], preferred_element_type=jnp.float32)
        da_ref[t, :] = (xw * g_ref[...]).sum(axis=1)
        ax = a_ref[t, :][:, None] * x_ref[...]
        dw_ref[t] += jax.lax.dot_general(
            ax, g_ref[...],
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )


def _pad_n(x, n_pad):
    return jnp.pad(x, ((0, n_pad - x.shape[0]), (0, 0)))


def _fwd_impl(x, w, alpha, interpret):
    n, f = x.shape
    t, _, g = w.shape
    n_pad = pl.cdiv(n, TILE_N) * TILE_N
    xp = _pad_n(x, n_pad)
    ap = jnp.pad(alpha, ((0, 0), (0, n_pad - n)))
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, t),
        grid=(n_pad // TILE_N,),
        in_specs=[
            pl.BlockSpec((TILE_N, f), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((t, f, g), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((t, TILE_N), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE_N, g), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, g), jnp.float32),
        interpret=interpret,
    )(xp, w, ap)
    return out[:n]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def relation_weighted_matmul(
    x: jax.Array,  # [N, F]
    w: jax.Array,  # [T, F, G]
    alpha: jax.Array,  # [T, N]
    interpret: bool = False,
) -> jax.Array:
    """``Σ_t α[t, :, None] · (x @ w[t])`` without the [T, N, ·] intermediate."""
    return _fwd_impl(x, w, alpha, interpret)


def _rwm_fwd(x, w, alpha, interpret):
    return _fwd_impl(x, w, alpha, interpret), (x, w, alpha)


def _rwm_bwd(interpret, res, g_out):
    x, w, alpha = res
    n, f = x.shape
    t, _, g_dim = w.shape
    # backward math runs f32 throughout (mixed-dtype dots are the only
    # alternative under bf16 staging; accumulation is f32 regardless)
    xf, wf, af = (a.astype(jnp.float32) for a in (x, w, alpha))
    gf = g_out.astype(jnp.float32)
    # dx = Σ_t α_t ⊙ (g @ w[t]^T)  — the same kernel with w transposed
    dx = _fwd_impl(gf, jnp.swapaxes(wf, 1, 2), af, interpret)
    # dw[t] = (α_t ⊙ x)^T @ g ;  dα[t, n] = <x[n] @ w[t], g[n]>
    n_pad = pl.cdiv(n, TILE_N) * TILE_N
    xp = _pad_n(xf, n_pad)
    gp = _pad_n(gf, n_pad)
    ap = jnp.pad(af, ((0, 0), (0, n_pad - n)))
    dw, da = pl.pallas_call(
        functools.partial(_dwa_kernel, t),
        grid=(n_pad // TILE_N,),
        in_specs=[
            pl.BlockSpec((TILE_N, f), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_N, g_dim), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((t, f, g_dim), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((t, TILE_N), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((t, f, g_dim), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((t, TILE_N), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((t, f, g_dim), jnp.float32),
            jax.ShapeDtypeStruct((t, n_pad), jnp.float32),
        ],
        interpret=interpret,
    )(xp, gp, wf, ap)
    # custom_vjp cotangent dtypes must match the primals (bf16 staging
    # passes bf16 x/w/alpha; the kernels accumulate f32 regardless)
    return (dx.astype(x.dtype), dw.astype(w.dtype),
            da[:, :n].astype(alpha.dtype))


relation_weighted_matmul.defvjp(_rwm_fwd, _rwm_bwd)
