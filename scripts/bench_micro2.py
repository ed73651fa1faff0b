"""Honest microbenchmarks: loop-carried deps prevent hoisting/DCE."""

import time

import jax
import jax.numpy as jnp
import numpy as np


def run(name, fn, args, reps):
    f = jax.jit(fn)
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = f(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:46s} {dt*1e3:9.3f} ms/iter")


def main():
    n_nodes, n_edges, f = 8192, 131072, 256
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(n_nodes, f)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(f, f)) * 0.05, jnp.float32)
    src = jnp.asarray(rng.integers(0, n_nodes, n_edges), jnp.int32)
    dst = jnp.asarray(rng.integers(0, n_nodes, n_edges), jnp.int32)
    dst_sorted = jnp.sort(dst)
    reps = 20
    print(f"platform={jax.default_backend()} nodes={n_nodes} edges={n_edges} f={f} reps={reps}")

    def chain(step):
        def fn(x, idx_a, idx_b):
            def body(c, _):
                xx = step(c[0], c[1], c[2])
                # feed a data-dependent perturbation into the indices so no
                # iteration can be hoisted or deduplicated
                shift = (xx[0, 0] * 0).astype(jnp.int32)
                return (xx, c[1] + shift, c[2] + shift), None

            (xx, _, _), _ = jax.lax.scan(fn_body := body, (x, idx_a, idx_b), None, length=reps)
            return xx

        return fn

    run("matmul chained", chain(lambda x, a, b: jnp.tanh(x @ w)), (x, src, dst), reps)
    run(
        "gather chained",
        chain(lambda x, a, b: x[a][:n_nodes] * 0.999),
        (x, src, dst),
        reps,
    )
    run(
        "gather+segsum unsorted",
        chain(lambda x, a, b: jax.ops.segment_sum(x[a], b, num_segments=n_nodes) * 0.01),
        (x, src, dst),
        reps,
    )
    run(
        "gather+segsum sorted-flag",
        chain(
            lambda x, a, b: jax.ops.segment_sum(
                x[a], b, num_segments=n_nodes, indices_are_sorted=True
            )
            * 0.01
        ),
        (x, src, dst_sorted),
        reps,
    )
    run(
        "full sage-ish layer",
        chain(
            lambda x, a, b: jnp.tanh(
                jnp.concatenate(
                    [x, jax.ops.segment_sum((x @ w)[a], b, num_segments=n_nodes)], -1
                )
                @ jnp.concatenate([w, w], 0)
                * 0.01
            )
        ),
        (x, src, dst),
        reps,
    )
    # dropout cost
    key = jax.random.PRNGKey(0)

    def drop_step(x, a, b):
        return x * jax.random.bernoulli(key, 0.7, x.shape)

    run("dropout mask gen", chain(drop_step), (x, src, dst), reps)


if __name__ == "__main__":
    main()
