"""HGT gather-traffic variants, micro-benched at the production bench shape
(VERDICT r3 ask #2).

The round-3 trace attribution (bench_queue/hgt_trace.json) put 94.8% of HGT
device time in "data-formatting": 16x per-head async slices of the
f32[N,4,64] q/k/v arrays plus the per-relation gather fusions.  The per-head
slices are LAYOUT artifacts of the head-batched edge einsum
(``einsum('rehd,rhdf->rehf', k_u[dst], w_att)``): the gather wants row-major
[N, H*D] rows while the h-batched dot wants h-major operands, so XLA
materializes per-head copies of every gathered operand.

This script times mathematically-identical reformulations of the edge
transform stage on the real chip (fwd+bwd through the full 3-layer
union-space softmax aggregation, same param tensors):

  v0-baseline   current HGTLayer emax math (head-batched edge einsum)
  v1-nodelevel  transform k/v at NODE level per relation ([R,N,H,D] einsum,
                MXU-friendly), gather TRANSFORMED rows per edge
  v2-blockdiag  gather flat [HD] rows, transform per edge with the
                block-diagonal [R,HD,HD] weight (4x transform FLOPs, zero
                per-head layout traffic — FLOPs are not the binding
                constraint at 2.7% MXU)
  *-bf16        same, with q/k/v staged bfloat16 (segment accumulation f32)

Run on an OTHERWISE IDLE machine:  python scripts/bench_hgt_variants.py
Writes bench_queue/hgt_variants.json.
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# production bench shape (scripts/bench_encoders.py workload, round-3 trace):
# union of 4000 notes + beats + measures ~= 8000 rows, 7 note-note relations
# at e_max ~= 10496 each
N_UNION = 8000
R = 7
E_MAX = 10496
HIDDEN = 256
HEADS = 4
H_DIM = HIDDEN // HEADS
LAYERS = 3
STEPS = 24


def make_inputs(seed: int = 0):
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(N_UNION, HIDDEN)).astype(np.float32)
    # ~90% valid edges, padding (src = N_UNION) last within each relation row
    src = rng.integers(0, N_UNION, size=(R, E_MAX)).astype(np.int32)
    dst = rng.integers(0, N_UNION, size=(R, E_MAX)).astype(np.int32)
    n_pad = E_MAX // 10
    src[:, -n_pad:] = N_UNION
    dst[:, -n_pad:] = 0
    src.sort(axis=1)  # sorted-by-src, padding sorts last (kernel contract)
    return x, src, dst


def make_params(key):
    import jax

    ks = jax.random.split(key, 4 * LAYERS)
    params = []
    for i in range(LAYERS):
        params.append(dict(
            wqkv=jax.random.normal(ks[4 * i], (HIDDEN, 3 * HIDDEN)) * 0.05,
            watt=jax.random.normal(ks[4 * i + 1], (R, HEADS, H_DIM, H_DIM)) * 0.1,
            wmsg=jax.random.normal(ks[4 * i + 2], (R, HEADS, H_DIM, H_DIM)) * 0.1,
            wout=jax.random.normal(ks[4 * i + 3], (HIDDEN, HIDDEN)) * 0.05,
            prior=np.ones((R, HEADS), np.float32),
        ))
    return params


def layer(p, x, src, dst, variant: str):
    """One HGT-style layer: qkv proj -> per-relation typed attention ->
    union segment softmax-aggregation -> out proj + residual."""
    import jax
    import jax.numpy as jnp

    from analysisgnn_tpu.kernels.segment_ops import segment_sum

    bf16 = variant.endswith("bf16")
    dt = jnp.bfloat16 if bf16 else jnp.float32

    qkv = (x @ p["wqkv"]).astype(dt)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q = q.reshape(-1, HEADS, H_DIM)
    k = k.reshape(-1, HEADS, H_DIM)
    v = v.reshape(-1, HEADS, H_DIM)
    pad = jnp.zeros((1, HEADS, H_DIM), dt)
    q_u = jnp.concatenate([q, pad])
    k_u = jnp.concatenate([k, pad])
    v_u = jnp.concatenate([v, pad])
    watt = p["watt"].astype(dt)
    wmsg = p["wmsg"].astype(dt)

    segs = src  # [R, E], padding = N_UNION
    q_e = q_u[jnp.minimum(segs, N_UNION)]  # [R, E, H, D]

    if variant.startswith("v0"):
        k_e = k_u[dst]
        k_t = jnp.einsum("rehd,rhdf->rehf", k_e, watt)
        msg = jnp.einsum("rehd,rhdf->rehf", v_u[dst], wmsg)
    elif variant.startswith("v1"):
        # node-level transform, gather TRANSFORMED rows (R*(N+1) row space)
        k_t_n = jnp.einsum("nhd,rhdf->rnhf", k_u, watt)
        v_t_n = jnp.einsum("nhd,rhdf->rnhf", v_u, wmsg)
        rid = jnp.arange(R, dtype=dst.dtype)[:, None]
        flat_idx = rid * (N_UNION + 1) + dst
        k_t = k_t_n.reshape(R * (N_UNION + 1), HEADS, H_DIM)[flat_idx]
        msg = v_t_n.reshape(R * (N_UNION + 1), HEADS, H_DIM)[flat_idx]
    elif variant.startswith("v2"):
        # flat-row gather + block-diagonal edge transform (no head batch dim)
        eye = jnp.eye(HEADS, dtype=dt)
        # [R, H*D, H*D] with w[r,h] on the h-th diagonal block
        wbd_att = jnp.einsum("gh,rhdf->rgdhf", eye, watt).reshape(
            R, HIDDEN, HIDDEN
        )
        wbd_msg = jnp.einsum("gh,rhdf->rgdhf", eye, wmsg).reshape(
            R, HIDDEN, HIDDEN
        )
        kf = k_u.reshape(N_UNION + 1, HIDDEN)
        vf = v_u.reshape(N_UNION + 1, HIDDEN)
        k_t = jnp.einsum("ref,rfg->reg", kf[dst], wbd_att).reshape(
            R, E_MAX, HEADS, H_DIM
        )
        msg = jnp.einsum("ref,rfg->reg", vf[dst], wbd_msg).reshape(
            R, E_MAX, HEADS, H_DIM
        )
    else:
        raise ValueError(variant)

    prior = p["prior"].astype(dt)
    logits = (q_e * k_t).sum(-1) * prior[:, None, :] / np.sqrt(H_DIM)
    logits = logits.reshape(R * E_MAX, HEADS)
    msg = msg.reshape(R * E_MAX, HEADS, H_DIM)
    seg_flat = segs.reshape(-1)

    seg_max = jax.ops.segment_max(
        logits.astype(jnp.float32), seg_flat, num_segments=N_UNION
    )
    seg_max = jnp.where(jnp.isfinite(seg_max), seg_max, 0.0)
    expw = jnp.exp(
        logits.astype(jnp.float32)
        - seg_max[jnp.minimum(seg_flat, N_UNION - 1)]
    )
    packed = jnp.concatenate(
        [(msg.astype(jnp.float32) * expw[..., None]).reshape(-1, HIDDEN), expw],
        axis=-1,
    )
    summed = segment_sum(packed, seg_flat, N_UNION)
    num = summed[:, :HIDDEN].reshape(N_UNION, HEADS, H_DIM)
    den = jnp.maximum(summed[:, HIDDEN:], 1e-16)
    agg = (num / den[..., None]).reshape(N_UNION, HIDDEN)
    return x + jax.nn.gelu(agg) @ p["wout"]


def build_step(variant: str):
    import jax
    import jax.numpy as jnp

    def loss_fn(params, x, src, dst):
        h = x
        for p in params:
            h = layer(p, h, src, dst, variant)
        return jnp.sum(h * h) * 1e-6

    @jax.jit
    def step(params, x, src, dst):
        l, g = jax.value_and_grad(loss_fn)(params, x, src, dst)
        return l, jax.tree_util.tree_map(lambda a: jnp.sum(jnp.abs(a)), g)

    return step


def main() -> None:
    import jax

    cache_dir = os.path.join(ROOT, ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    if os.environ.get("HGT_VAR_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["HGT_VAR_PLATFORM"])

    variants = sys.argv[1:] or [
        "v0-baseline", "v0-bf16",
        "v1-nodelevel", "v1-bf16",
        "v2-blockdiag", "v2-bf16",
    ]
    x, src, dst = make_inputs()
    x, src, dst = jax.device_put(x), jax.device_put(src), jax.device_put(dst)
    params = jax.device_put(make_params(jax.random.PRNGKey(0)))

    results = []
    ref_loss = None
    for variant in variants:
        step = build_step(variant)
        l, g = step(params, x, src, dst)
        l = float(l)
        jax.block_until_ready(g)
        t0 = time.perf_counter()
        for _ in range(STEPS):
            l2, g = step(params, x, src, dst)
        jax.block_until_ready(g)
        dt = time.perf_counter() - t0
        if ref_loss is None:
            ref_loss = l
        rec = {
            "variant": variant,
            "ms_per_step": round(1000 * dt / STEPS, 2),
            "loss": l,
            "loss_rel_err_vs_v0": (
                abs(l - ref_loss) / abs(ref_loss) if ref_loss else 0.0
            ),
        }
        results.append(rec)
        print(json.dumps(rec), flush=True)

    out = os.path.join(ROOT, "bench_queue", "hgt_variants.json")
    with open(out, "w") as f:
        json.dump({
            "shape": {"n_union": N_UNION, "relations": R, "e_max": E_MAX,
                      "hidden": HIDDEN, "heads": HEADS, "layers": LAYERS},
            "steps": STEPS,
            "results": results,
        }, f, indent=1)
    print(f"wrote {out}", file=sys.stderr)


if __name__ == "__main__":
    main()
