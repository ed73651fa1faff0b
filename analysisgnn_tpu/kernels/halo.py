"""Pallas async-remote-copy halo exchange for graph-partition parallelism.

The explicit-RDMA variant of distributed/partition_encoder.py::halo_pull:
each device pushes its boundary blocks directly into its onset-order
neighbors' receive buffers over ICI (``pltpu.make_async_remote_copy``,
pallas guide §Async Remote DMA) instead of routing through XLA's
collective-permute.  On a ring/line mesh this is a single hop each way and
the DMA engines run it concurrently with whatever compute XLA schedules
between ``start`` and the consuming kernel — the hand-scheduled version of
the interior/boundary overlap in ``_fused_sage_from_params``.

Multi-chip only (the build environment has ONE real chip, so this kernel is
validated structurally: single-device execution where the exchange is the
identity-with-zeros, plus the ppermute-path exactness tests; the ppermute
fallback is numerically identical on any topology).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _halo_push_kernel(x_ref, out_ref, send_sem, recv_sem, *, halo, axis):
    """Push my tail→right neighbor's left slot, my head→left neighbor's
    right slot; wait for my own two receives.

    out layout: ``[2H, F]`` = left halo (from left neighbor's tail) ‖ right
    halo (from right neighbor's head).
    """
    my = jax.lax.axis_index(axis)
    n = jax.lax.axis_size(axis)
    n_local = x_ref.shape[0]

    # zero-init: boundary devices keep zero halos (no neighbor)
    out_ref[:] = jnp.zeros_like(out_ref)

    # neighbors must have zero-initialized their buffers before we write
    # into them: barrier with both.
    barrier = pltpu.get_barrier_semaphore()
    for nb in (my - 1, my + 1):
        @pl.when(jnp.logical_and(nb >= 0, nb < n))
        def _():
            pltpu.semaphore_signal(
                barrier, inc=1, device_id=(nb,),
                device_id_type=pltpu.DeviceIdType.LOGICAL,
            )
    expected = (
        jnp.asarray(1, jnp.int32) * (my > 0) + jnp.asarray(1, jnp.int32) * (my < n - 1)
    )
    pltpu.semaphore_wait(barrier, expected)

    # tail → right neighbor's LEFT slot (rows [0, H))
    @pl.when(my < n - 1)
    def _():
        rdma = pltpu.make_async_remote_copy(
            src_ref=x_ref.at[pl.ds(n_local - halo, halo), :],
            dst_ref=out_ref.at[pl.ds(0, halo), :],
            send_sem=send_sem.at[0],
            recv_sem=recv_sem.at[0],
            device_id=(my + 1,),
            device_id_type=pltpu.DeviceIdType.LOGICAL,
        )
        rdma.start()
        rdma.wait_send()

    # head → left neighbor's RIGHT slot (rows [H, 2H))
    @pl.when(my > 0)
    def _():
        rdma = pltpu.make_async_remote_copy(
            src_ref=x_ref.at[pl.ds(0, halo), :],
            dst_ref=out_ref.at[pl.ds(halo, halo), :],
            send_sem=send_sem.at[1],
            recv_sem=recv_sem.at[1],
            device_id=(my - 1,),
            device_id_type=pltpu.DeviceIdType.LOGICAL,
        )
        rdma.start()
        rdma.wait_send()

    # wait for the two inbound writes (recv semaphores are signaled by the
    # senders' DMAs landing in OUR out_ref)
    @pl.when(my > 0)
    def _():
        pltpu.semaphore_wait(recv_sem.at[0], 1)

    @pl.when(my < n - 1)
    def _():
        pltpu.semaphore_wait(recv_sem.at[1], 1)


def halo_pull_pallas(x_local: jax.Array, halo: int, axis: str) -> jax.Array:
    """[N_local, F] → [2H, F] via inter-chip RDMA.  Call inside shard_map
    over a 1-D partition axis on real multi-chip hardware."""
    kernel = functools.partial(_halo_push_kernel, halo=halo, axis=axis)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((2 * halo, x_local.shape[1]), x_local.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True, collective_id=7
        ),
    )(x_local)
