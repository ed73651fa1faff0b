"""Graph utility ops: degrees and Laplacian positional encodings.

Reference: analysisgnn/models/core/graph_utils.py:7-53 (``degree`` and the
Laplacian-eigenvector ``positional_encoding``), re-expressed with masked
numpy/scipy host-side math (positional encodings are precomputed features,
not jit-path ops).
"""

from __future__ import annotations

import numpy as np


def degree(edge_index: np.ndarray, num_nodes: int, direction: str = "out") -> np.ndarray:
    idx = edge_index[0] if direction == "out" else edge_index[1]
    idx = idx[idx < num_nodes]
    return np.bincount(idx, minlength=num_nodes).astype(np.float32)


def laplacian_positional_encoding(
    edge_index: np.ndarray, num_nodes: int, k: int = 8
) -> np.ndarray:
    """First-k nontrivial eigenvectors of the symmetric-normalized Laplacian
    (sign-randomization left to the caller)."""
    from scipy.sparse import coo_matrix
    from scipy.sparse.linalg import eigsh

    src, dst = edge_index[0], edge_index[1]
    keep = (src < num_nodes) & (dst < num_nodes)
    src, dst = src[keep], dst[keep]
    data = np.ones(len(src))
    a = coo_matrix((data, (src, dst)), shape=(num_nodes, num_nodes))
    a = ((a + a.T) > 0).astype(np.float64)
    deg = np.asarray(a.sum(1)).ravel()
    d_inv_sqrt = 1.0 / np.sqrt(np.maximum(deg, 1.0))
    lap = coo_matrix(np.eye(num_nodes) - (a.multiply(d_inv_sqrt[:, None])).multiply(d_inv_sqrt[None, :]))
    k_eff = min(k + 1, num_nodes - 1)
    if k_eff < 1:
        return np.zeros((num_nodes, k), np.float32)
    vals, vecs = eigsh(lap.tocsc(), k=k_eff, which="SM")
    order = np.argsort(vals)
    vecs = vecs[:, order][:, 1 : k + 1]  # drop the trivial eigenvector
    out = np.zeros((num_nodes, k), np.float32)
    out[:, : vecs.shape[1]] = vecs
    return out
