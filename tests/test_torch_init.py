"""torch-style init transform (train/state.py::torch_style_reinit)."""

import jax
import jax.numpy as jnp
import numpy as np

from analysisgnn_tpu.train.state import torch_style_reinit


def test_reinit_bounds_and_scope():
    import flax.linen as nn

    class M(nn.Module):
        @nn.compact
        def __call__(self, x):
            h = nn.Dense(64)(x)
            w = self.param("w_neigh", nn.initializers.lecun_normal(), (7, 32, 32))
            e = nn.Embed(10, 8)(jnp.zeros((4,), jnp.int32))
            return h.sum() + w.sum() + e.sum()

    m = M()
    params = m.init(jax.random.PRNGKey(0), jnp.ones((4, 32)))
    out = torch_style_reinit(params, seed=3)
    k = np.asarray(out["params"]["Dense_0"]["kernel"])
    b = np.asarray(out["params"]["Dense_0"]["bias"])
    bound_k = 1.0 / np.sqrt(32)
    # kernels redrawn uniform within the torch nn.Linear bound, not zero/normal
    assert np.abs(k).max() <= bound_k + 1e-6
    assert np.abs(k).std() > 0.1 * bound_k
    # flax zero-bias replaced by a nonzero uniform draw
    assert np.abs(b).max() > 0
    # fused batched-linear params ARE redrawn (round-5 scope): each task/
    # relation slice is an independent torch Linear with fan_in=shape[-2]
    w = np.asarray(out["params"]["w_neigh"])
    assert np.abs(w).max() <= 1.0 / np.sqrt(32) + 1e-6
    assert np.abs(w - np.asarray(params["params"]["w_neigh"])).max() > 0
    # round-4 scope reproducible for bisects
    legacy = torch_style_reinit(params, seed=3, fused=False)
    np.testing.assert_array_equal(
        np.asarray(legacy["params"]["w_neigh"]),
        np.asarray(params["params"]["w_neigh"]),
    )
    np.testing.assert_array_equal(
        np.asarray(out["params"]["Embed_0"]["embedding"]),
        np.asarray(params["params"]["Embed_0"]["embedding"]),
    )


def test_reinit_scope_norm_and_attention():
    """ADVICE r3: LayerNorm biases stay zero (torch zeros them); DenseGeneral
    attention kernels (ndim>=3) keep flax defaults; Dense bias bound derives
    from the sibling kernel's fan_in, not the bias's own length."""
    import flax.linen as nn

    class M(nn.Module):
        @nn.compact
        def __call__(self, x):
            h = nn.Dense(35)(x)  # non-square: fan_in=256 != out=35
            h = nn.LayerNorm()(jnp.pad(h, ((0, 0), (0, 221))))
            a = nn.MultiHeadDotProductAttention(num_heads=4)(
                h[None], h[None]
            )
            return h.sum() + a.sum()

    m = M()
    params = m.init(jax.random.PRNGKey(0), jnp.ones((4, 256)))
    out = torch_style_reinit(params, seed=3)

    # Dense bias: bound = 1/sqrt(in_features)=1/16, NOT 1/sqrt(35)
    b = np.asarray(out["params"]["Dense_0"]["bias"])
    assert np.abs(b).max() <= 1.0 / np.sqrt(256) + 1e-6
    assert np.abs(b).max() > 0
    # LayerNorm bias untouched (zero), scale untouched (one)
    np.testing.assert_array_equal(
        np.asarray(out["params"]["LayerNorm_0"]["bias"]), 0.0
    )
    np.testing.assert_array_equal(
        np.asarray(out["params"]["LayerNorm_0"]["scale"]), 1.0
    )
    # attention DenseGeneral kernels (in, heads, head_dim) untouched
    for sub in ("query", "key", "value"):
        np.testing.assert_array_equal(
            np.asarray(
                out["params"]["MultiHeadDotProductAttention_0"][sub]["kernel"]
            ),
            np.asarray(
                params["params"]["MultiHeadDotProductAttention_0"][sub]["kernel"]
            ),
        )


def test_reinit_deterministic():
    import flax.linen as nn

    dense = nn.Dense(16)
    p = dense.init(jax.random.PRNGKey(1), jnp.ones((2, 8)))
    a = torch_style_reinit(p, seed=7)
    b = torch_style_reinit(p, seed=7)
    c = torch_style_reinit(p, seed=8)
    ka, kb, kc = (np.asarray(x["params"]["kernel"]) for x in (a, b, c))
    np.testing.assert_array_equal(ka, kb)
    assert np.abs(ka - kc).max() > 0


def test_reinit_fused_layouts():
    """Round-5 scope: FusedHeteroSage relation stacks and FusedTaskHeads
    per-task stacks are drawn as stacked torch Linears — w_self/w_agg/b_out
    use fan_in=2f (the two halves of SageConv's Linear(2f, g)); head w2/b2
    use fan_in=h.  LayerNorm-style ln_scale/ln_bias stay untouched."""
    import flax.linen as nn

    class M(nn.Module):
        @nn.compact
        def __call__(self, x):
            init = nn.initializers.lecun_normal()
            conv = {
                k: self.param(k, init, (3, 16, 16))
                for k in ("w_neigh", "w_self", "w_agg")
            }
            heads = {
                "w1": self.param("w1", init, (5, 16, 8)),
                "w2": self.param("w2", init, (5, 8, 40)),
            }
            b1 = self.param("b1", nn.initializers.zeros, (5, 1, 8))
            ln = self.param("ln_scale", nn.initializers.ones, (5, 1, 8))
            return sum(v.sum() for v in conv.values()) + sum(
                v.sum() for v in heads.values()
            ) + b1.sum() + ln.sum()

    m = M()
    params = m.init(jax.random.PRNGKey(0), jnp.ones((2, 16)))
    out = torch_style_reinit(params, seed=5)
    p = out["params"]
    for key, fan in (("w_neigh", 16), ("w_self", 32), ("w_agg", 32)):
        v = np.asarray(p[key])
        assert np.abs(v).max() <= 1.0 / np.sqrt(fan) + 1e-6, key
        assert np.abs(v).std() > 0.1 / np.sqrt(fan), key
    # heads: w1 fan_in=16, w2 fan_in=8; b1 redrawn nonzero; ln_scale kept
    assert np.abs(np.asarray(p["w1"])).max() <= 1.0 / 4 + 1e-6
    assert np.abs(np.asarray(p["w2"])).max() <= 1.0 / np.sqrt(8) + 1e-6
    assert np.abs(np.asarray(p["b1"])).max() > 0
    np.testing.assert_array_equal(np.asarray(p["ln_scale"]), 1.0)
