"""Pre-training step for the PreEncoder (staff/voice/fifths/spelling).

Functional analog of the reference ``PreEncoderPL._common_step``
(analysisgnn/models/analysis.py:697-744): staff/voice candidate-edge link
prediction with BCE against ``isin_pairwise`` truth labels, plus
label-smoothed CE on key-signature fifths (15) and pitch spelling (35).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from analysisgnn_tpu.core.graph import HeteroGraph, NOTE
from analysisgnn_tpu.models.pre_encoder import derive_truth_edges, isin_pairwise
from analysisgnn_tpu.train.losses import masked_cross_entropy


def masked_bce(logits: jax.Array, labels: jax.Array, weight: jax.Array) -> jax.Array:
    w = weight.astype(jnp.float32)
    z = jnp.clip(logits, -30, 30)
    loss = jnp.maximum(z, 0) - z * labels.astype(jnp.float32) + jnp.log1p(jnp.exp(-jnp.abs(z)))
    return (loss * w).sum() / jnp.maximum(w.sum(), 1.0)


def pretrain_losses(model, params, batch: HeteroGraph, rngs, deterministic: bool):
    attrs = batch.node_attrs[NOTE]
    n_cap = batch.capacity(NOTE)
    nt = batch.num_target_nodes
    ei = batch.edge_index_dict()
    onset = ei[(NOTE, "onset", NOTE)]
    cons = ei[(NOTE, "consecutive", NOTE)]
    # candidates: onset ∪ consecutive for staff; consecutive for voice
    # (reference :704-715), restricted to target notes
    from analysisgnn_tpu.models.analysis import restrict_edges_to_targets

    staff_cand = jnp.concatenate(
        [
            restrict_edges_to_targets(onset, nt, n_cap, drop_self_loops=False),
            restrict_edges_to_targets(cons, nt, n_cap, drop_self_loops=False),
        ],
        axis=1,
    )
    voice_cand = restrict_edges_to_targets(cons, nt, n_cap, drop_self_loops=False)
    voice_true, staff_true = derive_truth_edges(
        cons, onset, attrs["voice"], attrs["staff"], n_cap
    )
    cand_valid_s = (staff_cand[0] < n_cap) & (staff_cand[1] < n_cap)
    cand_valid_v = (voice_cand[0] < n_cap) & (voice_cand[1] < n_cap)
    staff_labels = isin_pairwise(
        staff_cand, staff_true, cand_valid_s, staff_true[0] < n_cap
    )
    voice_labels = isin_pairwise(
        voice_cand, voice_true, cand_valid_v, voice_true[0] < n_cap
    )
    staff_l, voice_l, fifths_l, spell_l = model.apply(
        params,
        batch.x_dict(),
        ei,
        batch.batch,
        staff_cand,
        voice_cand,
        deterministic=deterministic,
        rngs=rngs,
    )
    w_note = batch.target_mask()
    losses = {
        "staff": masked_bce(staff_l, staff_labels, cand_valid_s),
        "voice": masked_bce(voice_l, voice_labels, cand_valid_v),
        "fifths": masked_cross_entropy(
            fifths_l, attrs["key_signature"], w_note, 0.1
        ),
        "spelling": masked_cross_entropy(
            spell_l, attrs["pitch_spelling"], w_note, 0.1
        ),
    }
    return losses


def make_pretrain_step(model, optimizer: optax.GradientTransformation):
    @jax.jit
    def step(params, opt_state, batch: HeteroGraph, rng):
        def loss_fn(p):
            losses = pretrain_losses(model, p, batch, {"dropout": rng}, False)
            total = sum(losses.values())
            return total, losses

        (total, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, {"total": total, **losses}

    return step
