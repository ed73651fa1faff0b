"""The unified multi-task analysis model (reference ``TorchAnalysisGNN``,
analysisgnn/models/analysis.py:421-602) as a flax module.

Pipeline: pitch-spelling (35→64) + key-signature (15→64) embeddings are
concatenated onto note input features (:424-425, :573-574); per-node-type
projection MLPs (:429-443); one of three hetero encoders (:444-473); onset
scatter-mean pooling + concat + deep projection (:580-588); optional stacked
BiGRU over onset-ordered notes (:512-537); per-task heads with optional
cross-task logit fusion (:486-511, :546-569).

Static-shape notes: the reference's ``batch_size`` (count of target notes) is
a traced scalar here; "restrict to targets" masks are applied by rewriting
edge endpoints to one-past-the-end so downstream segment ops drop them.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from analysisgnn_tpu.core.graph import EdgeType, NOTE
from analysisgnn_tpu.kernels.segment_ops import segment_mean_with_base
from analysisgnn_tpu.models.encoders import ENCODERS
from analysisgnn_tpu.models.heads import TaskHeads
from analysisgnn_tpu.models.mlp import (
    EncoderProjection,
    PlainProjection,
    ProjectionMLP,
)
from analysisgnn_tpu.models.rnn import StackedBiGRU, segment_starts

PITCH_SPELLING_CLASSES = 35
KEY_SIGNATURE_CLASSES = 15
EMBED_DIM = 64


def restrict_edges_to_targets(
    edge_index: jax.Array, num_targets: jax.Array, num_nodes_cap: int,
    drop_self_loops: bool = True,
) -> jax.Array:
    """Mask out edges touching non-target nodes (and self loops) by moving
    their endpoints past the end — the static-shape version of the boolean
    indexing at reference models/analysis.py:580-584."""
    src, dst = edge_index[0], edge_index[1]
    bad = (src >= num_targets) | (dst >= num_targets)
    if drop_self_loops:
        bad = bad | (src == dst)
    fill = jnp.int32(num_nodes_cap)
    return jnp.stack([jnp.where(bad, fill, src), jnp.where(bad, fill, dst)])


class AnalysisGNN(nn.Module):
    """Multi-task score-analysis network over a heterogeneous note graph."""

    metadata: Tuple[Tuple[str, ...], Tuple[EdgeType, ...]]
    in_channels: int
    hidden_channels: int
    out_channels: int
    task_dict: Tuple[Tuple[str, int], ...]
    num_layers: int = 3
    dropout: float = 0.3
    use_jk: bool = True
    logit_fusion: bool = False
    use_rnn: bool = False
    encoder_type: str = "hybridgnn"
    use_edge_decoder: bool = False
    # Bound the encoder output with ReLU→L2-norm after the final conv
    # (HybridGNN only).  The reference HGCN leaves the last layer raw
    # (core/hgnn.py:178-179), which is measurably unstable in the
    # multi-task recipe at the reference lr — see encoders.HybridGNN.
    # Default ON since round 3: the out-of-the-box configuration must train
    # cleanly at the reference recipe (lr=5e-3, dropout=0.3).
    final_norm: bool = True
    # Single-Dense projections (measured-stable default at the reference
    # recipe); False restores the reference's deep projection stacks
    # (ProjectionMLP/EncoderProjection, reference :429-443/:474-485)
    plain_proj: bool = True
    # Pallas fused aggregation in the HybridGNN conv path (needs the
    # sampler's src-sorted edge order)
    use_pallas: bool = False
    # HGT relation-stack grouping: "pair" (per src/dst type pair) or
    # "emax" (union-node-space capacity bins — fewer gathers/einsums per
    # layer with bounded padding, exactness-tested in
    # tests/test_encoders_perf.py)
    hgt_group_mode: str = "pair"
    # per-layer rematerialization (HybridGNN memory lever, encoders.py)
    remat: bool = False
    # fused-SAGE implementation ("node" | "edge"), models/fused.py
    conv_impl: str = "node"
    # HGT q/k/v + edge-transform staging dtype (encoders.py HGTLayer;
    # softmax/segment accumulation stays f32)
    hgt_stage_dtype: str = "float32"
    # HGT softmax stabilizer ("segment" | "global", HGTLayer.softmax_stab);
    # "global" measured +18% full-step edges/s, value-identical softmax
    hgt_softmax_stab: str = "global"
    # Dropout AFTER the final conv as well (HybridGNN only) — the torch
    # anchor RefModel normalizes+drops every layer incl. the last; probe
    # lever for the key-head family study (RESULTS.md)
    final_dropout: bool = False

    def setup(self):
        node_types, edge_types = self.metadata
        self.pitch_embedding = nn.Embed(PITCH_SPELLING_CLASSES, EMBED_DIM)
        self.key_embedding = nn.Embed(KEY_SIGNATURE_CLASSES, EMBED_DIM)
        proj_cls = PlainProjection if self.plain_proj else ProjectionMLP
        self.project = {
            t: proj_cls(
                self.hidden_channels, self.hidden_channels, self.dropout,
                name=f"project_{t}",
            )
            for t in node_types
        }
        enc_cls = ENCODERS[self.encoder_type.lower()]
        enc_kwargs = {}
        # Fail fast on flag/encoder combinations the constructor would
        # silently ignore (ADVICE r4: a benchmark arm labeled "edge" or
        # "bf16st" must measure what it claims or refuse to run).
        if self.conv_impl != "node" and self.encoder_type.lower() not in (
            "hybridgnn", "metricalgnn"
        ):
            raise ValueError(
                f"conv_impl={self.conv_impl!r} is a fused-SAGE option; "
                f"encoder_type={self.encoder_type!r} cannot honor it"
            )
        if self.hgt_stage_dtype != "float32" and self.encoder_type.lower() != "hgt":
            raise ValueError(
                f"hgt_stage_dtype={self.hgt_stage_dtype!r} only applies to "
                f"encoder_type='hgt' (got {self.encoder_type!r})"
            )
        if self.encoder_type.lower() == "hybridgnn":
            if self.final_norm:
                enc_kwargs["final_norm"] = True
            if self.final_dropout:
                enc_kwargs["final_dropout"] = True
            if self.use_pallas:
                enc_kwargs["use_pallas"] = True
            if self.remat:
                enc_kwargs["remat"] = True
            if self.conv_impl != "node":
                enc_kwargs["conv_impl"] = self.conv_impl
        if self.encoder_type.lower() == "metricalgnn":
            if self.conv_impl != "node":
                enc_kwargs["conv_impl"] = self.conv_impl
        if self.encoder_type.lower() == "hgt":
            if self.hgt_group_mode != "pair":
                enc_kwargs["group_mode"] = self.hgt_group_mode
            if self.hgt_stage_dtype != "float32":
                enc_kwargs["stage_dtype"] = self.hgt_stage_dtype
            if self.hgt_softmax_stab != "global":
                enc_kwargs["softmax_stab"] = self.hgt_softmax_stab
            if self.use_pallas:
                # the fused softmax/aggregation kernel needs the union
                # capacity-binned layout (+ sampler-sorted edges)
                enc_kwargs["group_mode"] = "emax"
                enc_kwargs["use_pallas"] = True
        self.encoder = enc_cls(
            hidden=self.hidden_channels,
            num_layers=self.num_layers,
            dropout=self.dropout,
            use_jk=self.use_jk,
            edge_types=tuple(edge_types),
            name="encoder",
            **enc_kwargs,
        )
        enc_proj_cls = PlainProjection if self.plain_proj else EncoderProjection
        self.project_enc = enc_proj_cls(
            self.hidden_channels, self.out_channels, self.dropout, name="project_enc"
        )
        self.heads = TaskHeads(
            task_dict=tuple(self.task_dict),
            out_channels=self.out_channels,
            logit_fusion=self.logit_fusion,
            dropout=self.dropout,
            name="heads",
        )
        if self.use_rnn:
            self.rnn = StackedBiGRU(self.out_channels, num_layers=2, name="rnn")
            self.rnn_norm = nn.LayerNorm(name="rnn_norm")
            self.rnn_proj = nn.Dense(self.out_channels, name="rnn_proj")
        if self.use_edge_decoder:
            from analysisgnn_tpu.models.heads import EdgeDecoder

            _, edge_types = self.metadata
            self.edge_decoder = EdgeDecoder(
                channels=self.out_channels,
                relations=tuple(
                    sorted({e[1] for e in edge_types if e[0] == NOTE and e[2] == NOTE})
                ),
                dropout=self.dropout,
                name="edge_decoder",
            )

    # ------------------------------------------------------------------ #

    def encode(
        self,
        x_dict: Dict[str, jax.Array],
        edge_index_dict: Dict[EdgeType, jax.Array],
        batch_dict: Dict[str, jax.Array],
        pitch_spelling: jax.Array,
        key_signature: jax.Array,
        num_target_nodes: jax.Array,
        deterministic: bool = True,
    ) -> jax.Array:
        """Note embeddings for the (padded) target notes — reference
        ``TorchAnalysisGNN.encode`` (:571-591)."""
        z = dict(x_dict)
        emb = jnp.concatenate(
            [
                z[NOTE],
                self.pitch_embedding(jnp.clip(pitch_spelling, 0, PITCH_SPELLING_CLASSES - 1)),
                self.key_embedding(jnp.clip(key_signature, 0, KEY_SIGNATURE_CLASSES - 1)),
            ],
            axis=-1,
        )
        h = {NOTE: self.project[NOTE](emb, deterministic=deterministic)}
        for t, x in z.items():
            if t != NOTE and t in self.project:
                h[t] = self.project[t](x, deterministic=deterministic)
        x = self.encoder(h, edge_index_dict, batch_dict, deterministic=deterministic)
        # onset pooling over target-restricted, self-loop-free onset edges
        onset = edge_index_dict[(NOTE, "onset", NOTE)]
        onset = restrict_edges_to_targets(onset, num_target_nodes, x.shape[0])
        msgs = x[jnp.minimum(onset[1], x.shape[0] - 1)]
        x_pool = segment_mean_with_base(msgs, onset[0], base=x)
        x = jnp.concatenate([x, x_pool], axis=-1)
        x = self.project_enc(x, deterministic=deterministic)
        if self.use_rnn:
            starts = segment_starts(batch_dict[NOTE])
            r = self.rnn(x, starts)
            r = self.rnn_norm(r)
            x = self.rnn_proj(r)
        return x

    def classify(self, x: jax.Array, deterministic: bool = True) -> Dict[str, jax.Array]:
        return self.heads(x, deterministic=deterministic)

    def full_init(
        self,
        x_dict,
        edge_index_dict,
        batch_dict,
        pitch_spelling,
        key_signature,
        num_target_nodes,
        deterministic: bool = True,
    ):
        """Initialization entry that touches every submodule (incl. the edge
        decoder, which ``__call__`` does not reach)."""
        x = self.encode(
            x_dict, edge_index_dict, batch_dict, pitch_spelling, key_signature,
            num_target_nodes, deterministic=deterministic,
        )
        logits = self.classify(x, deterministic=deterministic)
        if self.use_edge_decoder:
            nn_edges = {
                et: ei
                for et, ei in edge_index_dict.items()
                if et[0] == NOTE and et[2] == NOTE
            }
            self.decode_edges(x, nn_edges, deterministic=deterministic)
        return logits

    def decode_edges(
        self,
        x: jax.Array,
        edge_index_dict: Dict[EdgeType, jax.Array],
        deterministic: bool = True,
    ) -> Dict[EdgeType, jax.Array]:
        """Per-relation same-label edge logits (edge-consistency loss,
        reference models/analysis.py:986-1019)."""
        return self.edge_decoder(edge_index_dict, x, deterministic=deterministic)

    def __call__(
        self,
        x_dict: Dict[str, jax.Array],
        edge_index_dict: Dict[EdgeType, jax.Array],
        batch_dict: Dict[str, jax.Array],
        pitch_spelling: jax.Array,
        key_signature: jax.Array,
        num_target_nodes: jax.Array,
        deterministic: bool = True,
    ) -> Dict[str, jax.Array]:
        x = self.encode(
            x_dict,
            edge_index_dict,
            batch_dict,
            pitch_spelling,
            key_signature,
            num_target_nodes,
            deterministic=deterministic,
        )
        return self.classify(x, deterministic=deterministic)
