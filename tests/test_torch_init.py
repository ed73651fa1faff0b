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
    # non-Dense leaves untouched
    np.testing.assert_array_equal(
        np.asarray(out["params"]["w_neigh"]),
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
