"""analysisgnn_tpu — a TPU-native heterogeneous score-graph analysis framework.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of the
AnalysisGNN reference system (multi-task symbolic music analysis over
heterogeneous note graphs): score → note array → typed score graph →
bounded static-shape subgraph sampling → heterogeneous GNN encoders
(HybridGNN / HGT / MetricalGNN) → ~21 note-level analysis tasks with
multi-task loss weighting and continual-learning task sequencing.

Design stance (TPU-first, not a port):
  * every device-side tensor has a static shape; raggedness is carried by
    padding + masks (padded edge endpoints point one past the last node so
    XLA segment ops drop them for free),
  * the compute path is pure functional JAX under ``jax.jit``; per-edge-type
    message passing is expressed as segment ops that lower to efficient TPU
    gather/scatter, with Pallas kernels for the hot fused aggregations,
  * scaling is mesh-based (``jax.sharding`` + collectives over ICI), not a
    translation of DDP/NCCL.
"""

__version__ = "0.1.0"

from analysisgnn_tpu.core.graph import HeteroGraph, EdgeType, NodeType

__all__ = ["HeteroGraph", "EdgeType", "NodeType", "__version__"]
