"""Per-task classification heads and cross-task logit fusion.

Reference: per-task 2-layer heads (models/analysis.py:486-496), logit-fusion
projection + ``CrossTaskTransformer`` multi-head attention over the task axis
(:409-418, :497-511, :550-567), and the ``EdgeDecoder`` used by the optional
edge-consistency loss (:805-836).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from analysisgnn_tpu.models.mlp import HeadMLP


class CrossTaskTransformer(nn.Module):
    """Self-attention across the task axis (reference :409-418)."""

    proj_dim: int
    num_heads: int = 4
    dropout: float = 0.1

    @nn.compact
    def __call__(self, task_projections: jax.Array, deterministic: bool = True) -> jax.Array:
        # task_projections: [batch, num_tasks, proj_dim]
        attended = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads,
            dropout_rate=self.dropout,
            deterministic=deterministic,
        )(task_projections, task_projections)
        return nn.LayerNorm()(task_projections + attended)


class FusedTaskHeads(nn.Module):
    """All per-task 2-layer heads as batched einsums over a task axis.

    Architecturally identical to T independent HeadMLPs (Dense → ReLU → LN →
    Dense), but T× fewer kernels: second-layer outputs are padded to the
    largest class count and sliced per task."""

    task_dict: Tuple[Tuple[str, int], ...]
    hidden: int

    @nn.compact
    def __call__(self, x: jax.Array) -> Dict[str, jax.Array]:
        t = len(self.task_dict)
        f = x.shape[-1]
        h = self.hidden
        c_max = max(n for _, n in self.task_dict)
        init = nn.initializers.lecun_normal()
        w1 = self.param("w1", init, (t, f, h))
        b1 = self.param("b1", nn.initializers.zeros, (t, 1, h))
        ln_scale = self.param("ln_scale", nn.initializers.ones, (t, 1, h))
        ln_bias = self.param("ln_bias", nn.initializers.zeros, (t, 1, h))
        w2 = self.param("w2", init, (t, h, c_max))
        b2 = self.param("b2", nn.initializers.zeros, (t, 1, c_max))
        z = jnp.einsum("nf,tfh->tnh", x, w1) + b1
        z = nn.relu(z)
        mean = z.mean(-1, keepdims=True)
        var = ((z - mean) ** 2).mean(-1, keepdims=True)
        z = (z - mean) * jax.lax.rsqrt(var + 1e-6) * ln_scale + ln_bias
        logits = jnp.einsum("tnh,thc->tnc", z, w2) + b2
        return {
            task: logits[i, :, :n_cls]
            for i, (task, n_cls) in enumerate(self.task_dict)
        }


class TaskHeads(nn.Module):
    """All per-task heads + optional cross-task logit fusion
    (reference ``forward_clf``, models/analysis.py:546-569)."""

    task_dict: Tuple[Tuple[str, int], ...]  # ((task, num_classes), ...)
    out_channels: int
    logit_fusion: bool = False
    dropout: float = 0.1

    @nn.compact
    def __call__(
        self, x: jax.Array, deterministic: bool = True
    ) -> Dict[str, jax.Array]:
        half = self.out_channels // 2
        raw = FusedTaskHeads(self.task_dict, half, name="clf")(x)
        if not self.logit_fusion:
            return raw
        projs = []
        for task, n_cls in self.task_dict:
            p = nn.Dense(half, name=f"proj_{task}")(raw[task])
            p = nn.relu(p)
            p = nn.LayerNorm(name=f"projnorm_{task}")(p)
            projs.append(p)
        stack = jnp.stack(projs, axis=1)  # [N, T, half]
        enhanced = CrossTaskTransformer(half, dropout=self.dropout, name="xtask")(
            stack, deterministic=deterministic
        )
        return {
            task: nn.Dense(n_cls, name=f"fusion_{task}")(enhanced[:, i])
            for i, (task, n_cls) in enumerate(self.task_dict)
        }


class EdgeDecoder(nn.Module):
    """Binary same-label edge classifier (reference EdgeDecoder :805-836):
    per-relation embed MLPs, elementwise product of endpoint embeddings,
    shared 2-class output MLP."""

    channels: int
    relations: Tuple[str, ...]
    dropout: float = 0.0

    @nn.compact
    def __call__(
        self,
        edge_index_dict: Dict[Tuple[str, str, str], jax.Array],
        x: jax.Array,
        deterministic: bool = True,
    ) -> Dict[Tuple[str, str, str], jax.Array]:
        embed_dense = {
            rel: nn.Dense(self.channels, name=f"embed_{rel}_dense")
            for rel in self.relations
        }
        embed_norm = {
            rel: nn.LayerNorm(name=f"embed_{rel}_norm") for rel in self.relations
        }
        drop = nn.Dropout(self.dropout)

        def embed(rel: str, h: jax.Array) -> jax.Array:
            h = embed_dense[rel](h)
            h = nn.relu(h)
            h = embed_norm[rel](h)
            return drop(h, deterministic=deterministic)

        fc_dense1 = nn.Dense(self.channels, name="fc_dense1")
        fc_norm = nn.LayerNorm(name="fc_norm")
        fc_dense2 = nn.Dense(2, name="fc_dense2")

        def fc(h: jax.Array) -> jax.Array:
            return fc_dense2(fc_norm(nn.relu(fc_dense1(h))))

        out: Dict[Tuple[str, str, str], jax.Array] = {}
        n = x.shape[0]
        for et, ei in edge_index_dict.items():
            rel = et[1]
            if rel not in self.relations:
                continue
            src = jnp.minimum(ei[0], n - 1)
            dst = jnp.minimum(ei[1], n - 1)
            src_e = embed(rel, x[src])
            dst_e = embed(rel, x[dst])
            out[et] = fc(src_e * dst_e)
        return out
