"""Explainability: fidelity metrics for hetero-graph explanations.

Re-specification of reference ``hetero_fidelity`` (analysisgnn/utils/
explain.py:6-97): fid+ measures how much predictions change when the
explanation subgraph is REMOVED (good explanations → large change); fid−
measures the change when ONLY the explanation is kept (good explanations →
small change).  Masks are per-edge-type boolean arrays; the model is any
callable logits_fn(edge_mask_dict) → per-node logits.
"""

from __future__ import annotations

from typing import Callable, Dict, Tuple

import jax
import jax.numpy as jnp


def apply_edge_mask(
    edge_index_dict: Dict, mask_dict: Dict, num_nodes_cap: Dict[str, int]
) -> Dict:
    """Drop masked-out edges by rewriting endpoints one past the end."""
    out = {}
    for et, ei in edge_index_dict.items():
        m = mask_dict.get(et)
        if m is None:
            out[et] = ei
            continue
        fill_src = jnp.int32(num_nodes_cap[et[0]])
        fill_dst = jnp.int32(num_nodes_cap[et[2]])
        out[et] = jnp.stack(
            [
                jnp.where(m, ei[0], fill_src),
                jnp.where(m, ei[1], fill_dst),
            ]
        )
    return out


def hetero_fidelity(
    logits_fn: Callable[[Dict], Dict[str, jax.Array]],
    edge_index_dict: Dict,
    explanation_mask: Dict,
    labels_dict: Dict[str, jax.Array],
    weight: jax.Array,
    num_nodes_cap: Dict[str, int],
) -> Tuple[Dict[str, jax.Array], Dict[str, jax.Array]]:
    """(fid+, fid−) per task."""
    full = logits_fn(edge_index_dict)
    complement = apply_edge_mask(
        edge_index_dict,
        {et: ~m for et, m in explanation_mask.items()},
        num_nodes_cap,
    )
    without = logits_fn(complement)
    only = logits_fn(
        apply_edge_mask(edge_index_dict, explanation_mask, num_nodes_cap)
    )
    w = weight.astype(jnp.float32)
    denom = jnp.maximum(w.sum(), 1.0)
    fid_plus, fid_minus = {}, {}
    for task, labels in labels_dict.items():
        correct_full = (jnp.argmax(full[task], -1) == labels).astype(jnp.float32)
        correct_wo = (jnp.argmax(without[task], -1) == labels).astype(jnp.float32)
        correct_only = (jnp.argmax(only[task], -1) == labels).astype(jnp.float32)
        fid_plus[task] = ((correct_full - correct_wo) * w).sum() / denom
        fid_minus[task] = ((correct_full - correct_only) * w).sum() / denom
    return fid_plus, fid_minus
