"""Tracing / profiling helpers (greenfield vs the reference, SURVEY §5.1).

- :func:`trace` wraps a block in a ``jax.profiler`` trace (viewable in
  TensorBoard / Perfetto).
- :func:`conv_roofline` estimates FLOPs and bytes of one fused hetero-SAGE
  layer so measured step times can be compared against the machine's
  compute/bandwidth roofline.
"""

from __future__ import annotations

import contextlib
import dataclasses
import time
from typing import Dict, Iterator, Optional


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def timed(label: str, sink: Optional[Dict[str, float]] = None) -> Iterator[None]:
    t0 = time.perf_counter()
    yield
    dt = time.perf_counter() - t0
    if sink is not None:
        sink[label] = dt


@dataclasses.dataclass
class Roofline:
    flops: float
    bytes: float

    def seconds_at(self, flops_per_s: float, bytes_per_s: float) -> float:
        """Max of compute-bound and bandwidth-bound lower bounds."""
        return max(self.flops / flops_per_s, self.bytes / bytes_per_s)


def conv_roofline(
    num_nodes: int, num_edges: int, in_features: int, out_features: int,
    num_relations: int, dtype_bytes: int = 4,
) -> Roofline:
    """FLOPs/bytes of one fused multi-relation SAGE layer
    (models/fused.py): relation-batched neigh transform, gather/scatter,
    self+agg output einsums."""
    t, n, e, f, g = num_relations, num_nodes, num_edges, in_features, out_features
    flops = (
        2 * t * n * f * f  # neigh einsum
        + 2 * t * n * (f * g + f * g)  # self + agg output einsums
    )
    bytes_ = (
        n * f * dtype_bytes  # x read
        + t * n * f * dtype_bytes * 2  # h write + read
        + e * f * dtype_bytes * 2  # gather read + scatter write
        + t * n * g * dtype_bytes  # out write
        + t * (2 * f * f + 2 * f * g) * dtype_bytes  # weights
    )
    return Roofline(flops=float(flops), bytes=float(bytes_))


# published peak numbers for common TPU generations (per chip).
# ici_bw_oneway: bytes/s per direction per torus axis link (the figure a
# neighbor exchange such as distributed/partition_encoder.py::halo_pull
# rides); a ring all-reduce uses the same links both directions.
TPU_PEAKS = {
    "v4": {"bf16_flops": 275e12, "hbm_bw": 1.2e12, "ici_bw_oneway": 4.5e10},
    "v5e": {"bf16_flops": 197e12, "hbm_bw": 0.82e12, "ici_bw_oneway": 4.5e10},
    "v5p": {"bf16_flops": 459e12, "hbm_bw": 2.77e12, "ici_bw_oneway": 9.0e10},
}
