"""relation_weighted_matmul (Pallas) == einsum reference, values + grads."""

import numpy as np
import jax
import jax.numpy as jnp

from analysisgnn_tpu.kernels.pallas_relmm import relation_weighted_matmul

INTERP = jax.default_backend() == "cpu"


def _ref(x, w, alpha):
    return jnp.einsum("tn,nf,tfg->ng", alpha, x, w)


def test_relmm_forward_matches_einsum():
    rng = np.random.default_rng(0)
    n, f, g, t = 300, 128, 256, 7  # n NOT a tile multiple — exercises padding
    x = jnp.asarray(rng.normal(size=(n, f)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(t, f, g)) * 0.1, jnp.float32)
    alpha = jnp.asarray(rng.uniform(0, 1, size=(t, n)), jnp.float32)
    got = relation_weighted_matmul(x, w, alpha, INTERP)
    want = _ref(x, w, alpha)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4
    )


def test_relmm_grads_match_einsum():
    rng = np.random.default_rng(1)
    n, f, g, t = 256, 64, 64, 3
    x = jnp.asarray(rng.normal(size=(n, f)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(t, f, g)) * 0.1, jnp.float32)
    alpha = jnp.asarray(rng.uniform(0, 1, size=(t, n)), jnp.float32)
    co = jnp.asarray(rng.normal(size=(n, g)), jnp.float32)

    def loss_k(x, w, a):
        return jnp.sum(relation_weighted_matmul(x, w, a, INTERP) * co)

    def loss_r(x, w, a):
        return jnp.sum(_ref(x, w, a) * co)

    gk = jax.grad(loss_k, argnums=(0, 1, 2))(x, w, alpha)
    gr = jax.grad(loss_r, argnums=(0, 1, 2))(x, w, alpha)
    for a, b, name in zip(gk, gr, ("dx", "dw", "dalpha")):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=3e-4, atol=3e-4, err_msg=name
        )
