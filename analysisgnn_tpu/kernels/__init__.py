from analysisgnn_tpu.kernels.segment_ops import (
    segment_sum,
    segment_mean,
    segment_max,
    segment_softmax,
    segment_mean_with_base,
    gather_scatter_sum,
    gather_scatter_mean,
    sddmm_dot,
)

__all__ = [
    "segment_sum",
    "segment_mean",
    "segment_max",
    "segment_softmax",
    "segment_mean_with_base",
    "gather_scatter_sum",
    "gather_scatter_mean",
    "sddmm_dot",
]
