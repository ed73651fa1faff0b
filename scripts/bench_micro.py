"""Microbenchmarks on the real chip: where does a train step's time go?

Each measurement wraps the op in a lax.scan of K reps inside ONE jit dispatch
so tunnel/dispatch latency is amortized away.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np


def timed(name, fn, *args, reps=50):
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:40s} {dt*1e3:8.3f} ms/iter")
    return dt


def scan_reps(op, reps=50):
    def fn(*args):
        def body(c, _):
            return op(*c), None

        c, _ = jax.lax.scan(body, args, None, length=reps)
        return c

    return fn


def main():
    n_nodes, n_edges, f = 8192, 131072, 256
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(n_nodes, f)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(f, f)), jnp.float32) * 0.01
    src = jnp.asarray(rng.integers(0, n_nodes, n_edges), jnp.int32)
    dst = jnp.asarray(rng.integers(0, n_nodes, n_edges), jnp.int32)
    dst_sorted = jnp.sort(dst)

    print(f"nodes={n_nodes} edges={n_edges} feat={f} platform={jax.default_backend()}")

    # pure matmul anchor: (8192×256)·(256×256) = 1.07 GFLOP
    def mm(x, w):
        return x @ w, w

    timed("matmul [N,F]x[F,F] x50", scan_reps(lambda x, w: (x @ w, w)), x, w)

    # gather
    timed(
        "gather x[src] x50",
        scan_reps(lambda x, s: (x[s].sum(0, keepdims=True) * 0 + x, s)),
        x,
        src,
    )

    # segment_sum unsorted
    def seg(x, s, d):
        msgs = x[s]
        out = jax.ops.segment_sum(msgs, d, num_segments=n_nodes)
        return out, s, d

    timed("gather+segment_sum (unsorted) x50", scan_reps(seg), x, src, dst)

    def seg_sorted(x, s, d):
        msgs = x[s]
        out = jax.ops.segment_sum(
            msgs, d, num_segments=n_nodes, indices_are_sorted=True
        )
        return out, s, d

    timed("gather+segment_sum (sorted) x50", scan_reps(seg_sorted), x, src, dst_sorted)

    # bf16 variants
    xb = x.astype(jnp.bfloat16)
    wb = w.astype(jnp.bfloat16)
    timed("matmul bf16 x50", scan_reps(lambda x, w: (x @ w, w)), xb, wb)

    def seg_bf16(x, s, d):
        out = jax.ops.segment_sum(x[s], d, num_segments=n_nodes, indices_are_sorted=True)
        return out, s, d

    timed("gather+segment_sum bf16 sorted x50", scan_reps(seg_bf16), xb, src, dst_sorted)

    # full SAGE-ish layer: 2 matmuls + gather + scatter
    def sage(x, w, s, d):
        h = x @ w
        agg = jax.ops.segment_sum(h[s], d, num_segments=n_nodes)
        return jnp.concatenate([x, agg], -1) @ jnp.concatenate([w, w], 0), w, s, d

    timed("sage layer f32 x50", scan_reps(sage), x, w, src, dst)


if __name__ == "__main__":
    main()
