"""Encoder-level golden parity vs plain-torch reproductions of the
reference layer math (BASELINE target #1; VERDICT round-1 item 5).

The three production encoder families' core layers — the hetero SAGE layer
(HybridGNN), the HGT typed-attention layer (HybridHGT), and MetricalConv
(MetricalGNN) — are reproduced in plain torch (per-relation loops,
index_add scatters, sequential GRU cells; the semantics of graphmuse /
pyg HGTConv / torch_scatter the reference delegates to, see
analysisgnn/models/core/hgnn.py:323-433, core/gnn.py:488-540) and compared
against the framework's relation-batched / scan-based JAX implementations
under shared weights.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from analysisgnn_tpu.core.graph import BEAT, NOTE


def _t(x):
    return torch.from_numpy(np.asarray(x, np.float32))


def _dense(x, p):
    out = x @ _t(p["kernel"])
    if "bias" in p:
        out = out + _t(p["bias"])
    return out


def segment_softmax_torch(logits, segs, n):
    """Per-segment softmax matching kernels/segment_ops.py::segment_softmax
    (max-shift, empty segments' max treated as 0)."""
    h = logits.shape[1]
    seg_max = torch.zeros(n, h)
    has = torch.zeros(n, dtype=torch.bool)
    for e in range(len(segs)):
        s = segs[e]
        seg_max[s] = torch.where(
            has[s], torch.maximum(seg_max[s], logits[e]), logits[e]
        )
        has[s] = True
    shifted = torch.exp(logits - seg_max[segs])
    denom = torch.zeros(n, h).index_add_(0, segs, shifted).clamp(min=1e-16)
    return shifted / denom[segs]


# ---------------------------------------------------------------------------
# HGT layer
# ---------------------------------------------------------------------------


def test_hgt_layer_matches_torch_per_relation_reference():
    """Relation-batched HGTLayer == per-relation torch loop (typed q/k/v,
    per-relation key/message transforms + priors, segment softmax over all
    incoming typed edges, gelu-out, gated skip)."""
    from analysisgnn_tpu.models.encoders import HGTLayer

    rng = np.random.default_rng(0)
    n_note, n_beat, hidden, heads = 20, 6, 16, 4
    h_dim = hidden // heads
    x = {
        NOTE: rng.normal(size=(n_note, hidden)).astype(np.float32),
        BEAT: rng.normal(size=(n_beat, hidden)).astype(np.float32),
    }
    # unequal edge counts within the note-note group exercise the pad path
    ets = (
        (NOTE, "onset", NOTE),
        (NOTE, "consecutive", NOTE),
        (NOTE, "connects", BEAT),
        (BEAT, "connects", NOTE),
    )
    edges = {
        ets[0]: rng.integers(0, n_note, size=(2, 14)).astype(np.int32),
        ets[1]: rng.integers(0, n_note, size=(2, 9)).astype(np.int32),
        ets[2]: np.stack(
            [rng.integers(0, n_note, 10), rng.integers(0, n_beat, 10)]
        ).astype(np.int32),
        ets[3]: np.stack(
            [rng.integers(0, n_beat, 7), rng.integers(0, n_note, 7)]
        ).astype(np.int32),
    }

    layer = HGTLayer(hidden, heads, ets)
    jx = {t: jnp.asarray(v) for t, v in x.items()}
    je = {et: jnp.asarray(ei) for et, ei in edges.items()}
    params = layer.init(jax.random.PRNGKey(1), jx, je)
    got = {t: np.asarray(v) for t, v in layer.apply(params, jx, je).items()}

    p = params["params"]
    # fused per-type QKV projection: kernel [F, 3*hidden] split into thirds
    q, k, v = {}, {}, {}
    for t in x:
        qkv = _dense(_t(x[t]), p[f"qkv_{t}"])
        qt, kt, vt = torch.split(qkv, hidden, dim=-1)
        q[t] = qt.reshape(-1, heads, h_dim)
        k[t] = kt.reshape(-1, heads, h_dim)
        v[t] = vt.reshape(-1, heads, h_dim)

    # group relations by (src, dst) in metadata order — param layout contract
    groups = {}
    for et in ets:
        groups.setdefault((et[0], et[2]), []).append(et)

    per_type = {t: {"logits": [], "msgs": [], "segs": []} for t in x}
    for (src_t, dst_t), rels in groups.items():
        tag = f"{src_t}__{dst_t}"
        w_att, w_msg = _t(p[f"watt_{tag}"]), _t(p[f"wmsg_{tag}"])
        prior = _t(p[f"prior_{tag}"])
        for r, et in enumerate(rels):
            ei = torch.from_numpy(edges[et].astype(np.int64))
            q_e = q[src_t][ei[0]]  # [E, H, D] aggregator
            k_e = k[dst_t][ei[1]]  # [E, H, D] info source
            k_t = torch.einsum("ehd,hdf->ehf", k_e, w_att[r])
            logits = (q_e * k_t).sum(-1) * prior[r] / np.sqrt(h_dim)
            msg = torch.einsum("ehd,hdf->ehf", v[dst_t][ei[1]], w_msg[r])
            per_type[src_t]["logits"].append(logits)
            per_type[src_t]["msgs"].append(msg)
            per_type[src_t]["segs"].append(ei[0])

    for t in x:
        n = x[t].shape[0]
        logits = torch.cat(per_type[t]["logits"])
        msgs = torch.cat(per_type[t]["msgs"])
        segs = torch.cat(per_type[t]["segs"])
        att = segment_softmax_torch(logits, segs, n)
        agg = torch.zeros(n, heads, h_dim).index_add_(0, segs, msgs * att[..., None])
        upd = _dense(
            # flax nn.gelu defaults to the tanh approximation
            torch.nn.functional.gelu(agg.reshape(n, hidden), approximate="tanh"),
            p[f"out_{t}"],
        )
        gate = torch.sigmoid(_t(p[f"skip_{t}"]))
        want = (gate * upd + (1 - gate) * _t(x[t])).numpy()
        np.testing.assert_allclose(got[t], want, rtol=2e-4, atol=2e-5)


# ---------------------------------------------------------------------------
# MetricalConv (scatter + GRU)
# ---------------------------------------------------------------------------


def _flax_gru_sequential_torch(xs, starts, cell, reverse=False):
    """Sequential torch evaluation of flax nn.GRUCell with reset masking
    (models/rnn.py::ResetGRU semantics)."""
    T, F = xs.shape
    if reverse:
        resets = np.roll(starts, -1).copy()
        resets[-1] = True
        xs, resets = torch.flip(xs, [0]), resets[::-1]
    else:
        resets = starts
    h = torch.zeros(F)
    ys = []
    for t in range(T):
        if resets[t]:
            h = torch.zeros(F)
        r = torch.sigmoid(_dense(xs[t], cell["ir"]) + _dense(h, cell["hr"]))
        z = torch.sigmoid(_dense(xs[t], cell["iz"]) + _dense(h, cell["hz"]))
        nn_ = torch.tanh(_dense(xs[t], cell["in"]) + r * _dense(h, cell["hn"]))
        h = (1.0 - z) * nn_ + z * h
        ys.append(h)
    out = torch.stack(ys)
    return torch.flip(out, [0]) if reverse else out


def test_metrical_conv_matches_torch_reference():
    """MetricalConv (scan path) == torch scatter_add + sequential GRU +
    LayerNorm reproduction of reference MetricalConvLayer semantics
    (core/gnn.py:488-540)."""
    from analysisgnn_tpu.models.encoders import MetricalConv

    rng = np.random.default_rng(2)
    m, n, f = 8, 25, 12
    x_met = rng.normal(size=(m, f)).astype(np.float32)
    x_notes = rng.normal(size=(n, f)).astype(np.float32)
    n2m = np.stack(
        [rng.integers(0, n, 30), np.sort(rng.integers(0, m, 30))]
    ).astype(np.int32)
    starts = np.zeros(m, bool)
    starts[[0, 4]] = True

    conv = MetricalConv(hidden=f, out=f, seq_impl="scan")
    args = (
        jnp.asarray(x_met),
        jnp.asarray(x_notes),
        jnp.asarray(n2m),
        jnp.asarray(starts),
    )
    params = conv.init(jax.random.PRNGKey(3), *args)
    got_notes, got_met = conv.apply(params, *args)

    p = params["params"]
    h_neigh = _dense(_t(x_notes), p["neigh"])
    idx = torch.from_numpy(n2m.astype(np.int64))
    h_scatter = torch.zeros(m, f).index_add_(0, idx[1], h_neigh[idx[0]])
    z_s = torch.cat([h_scatter, _t(x_met)], dim=-1)

    seq = p["seq"]
    fwd_cell = seq["ResetGRU_0"]["cell"]["GRUCell_0"]
    bwd_cell = seq["ResetGRU_1"]["cell"]["GRUCell_0"]
    fwd = _flax_gru_sequential_torch(h_scatter, starts, fwd_cell)
    bwd = _flax_gru_sequential_torch(h_scatter, starts, bwd_cell, reverse=True)
    h_seq = torch.cat([fwd, bwd], dim=-1)

    h = torch.relu(_dense(torch.cat([z_s, h_seq], dim=-1), p["out"]))
    ln = p["LayerNorm_0"]
    mu = h.mean(-1, keepdim=True)
    var = h.var(-1, unbiased=False, keepdim=True)
    h = (h - mu) / torch.sqrt(var + 1e-6) * _t(ln["scale"]) + _t(ln["bias"])
    want_notes = torch.zeros(n, f).index_add_(0, idx[0], h[idx[1]])

    np.testing.assert_allclose(np.asarray(got_met), h.numpy(), rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(got_notes), want_notes.numpy(), rtol=2e-4, atol=2e-5
    )


# ---------------------------------------------------------------------------
# Hetero SAGE layer (HybridGNN core)
# ---------------------------------------------------------------------------


def test_hetero_sage_layer_matches_torch_reference():
    """HeteroConv (fused relation-batched path) == per-relation torch SAGE
    with mean-with-base aggregation + mean over relations per source type
    (reference HGCN layer semantics, core/hgnn.py:98-140, 435-484)."""
    from analysisgnn_tpu.models.hetero import HeteroConv

    rng = np.random.default_rng(4)
    n_note, n_beat, f, g = 18, 5, 10, 14
    x = {
        NOTE: rng.normal(size=(n_note, f)).astype(np.float32),
        BEAT: rng.normal(size=(n_beat, f)).astype(np.float32),
    }
    ets = (
        (NOTE, "onset", NOTE),
        (NOTE, "consecutive", NOTE),
        (NOTE, "during", NOTE),
        (NOTE, "connects", BEAT),
    )
    edges = {
        ets[0]: rng.integers(0, n_note, size=(2, 20)).astype(np.int32),
        ets[1]: rng.integers(0, n_note, size=(2, 20)).astype(np.int32),
        ets[2]: rng.integers(0, n_note, size=(2, 20)).astype(np.int32),
        ets[3]: np.stack(
            [rng.integers(0, n_note, 12), rng.integers(0, n_beat, 12)]
        ).astype(np.int32),
    }

    layer = HeteroConv(g, ets)
    jx = {t: jnp.asarray(v) for t, v in x.items()}
    je = {et: jnp.asarray(ei) for et, ei in edges.items()}
    params = layer.init(jax.random.PRNGKey(5), jx, je)
    got = {t: np.asarray(v) for t, v in layer.apply(params, jx, je).items()}

    p = params["params"]

    def sage_with_base(x_src, x_dst, ei, w_neigh, b_neigh, w_self, w_agg, b_out):
        h = x_dst @ w_neigh + b_neigh
        idx = torch.from_numpy(ei.astype(np.int64))
        total = torch.zeros_like(x_src).index_add_(0, idx[0], h[idx[1]]) + x_src
        count = torch.zeros(x_src.shape[0]).index_add_(
            0, idx[0], torch.ones(ei.shape[1])
        )
        agg = total / count.clamp(min=1.0)[:, None]
        return x_src @ w_self + agg @ w_agg + b_out

    fused = p["fused_note"]
    note_outs = []
    for r, et in enumerate(ets[:3]):
        note_outs.append(
            sage_with_base(
                _t(x[NOTE]),
                _t(x[NOTE]),
                edges[et],
                _t(fused["w_neigh"][r]),
                _t(fused["b_neigh"][r, 0]),
                _t(fused["w_self"][r]),
                _t(fused["w_agg"][r]),
                _t(fused["b_out"][r, 0]),
            )
        )
    # cross-type relation uses the generic SageConv (concat formulation:
    # [x ‖ agg] @ w_out == x @ w_self + agg @ w_agg)
    sc = p["conv_note__connects__beat"]
    w_out = _t(sc["out"]["kernel"])
    note_outs.append(
        sage_with_base(
            _t(x[NOTE]),
            _t(x[BEAT]),
            edges[ets[3]],
            _t(sc["neigh"]["kernel"]),
            _t(sc["neigh"]["bias"]),
            w_out[:f],
            w_out[f:],
            _t(sc["out"]["bias"]),
        )
    )
    want_note = torch.stack(note_outs).mean(0).numpy()
    want_beat = _dense(_t(x[BEAT]), p["self_beat"]).numpy()
    np.testing.assert_allclose(got[NOTE], want_note, rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(got[BEAT], want_beat, rtol=2e-4, atol=2e-5)
