from analysisgnn_tpu.core.graph import HeteroGraph, EdgeType, NodeType

__all__ = ["HeteroGraph", "EdgeType", "NodeType"]
