"""Per-phase timing of the POST-PRUNE flagship train step (the bench headline).

Decomposes the step into isolated jitted sub-programs, each timed with EVOLVING
inputs and consumed outputs (axon result-caching reads as 1000x wins otherwise —
PERFORMANCE.md): the dual-grid encoding VJP, its forward alone, the MXU scatter
alone at matched event counts, the decoder MLP grad at matched sample counts, and
the full train step. Differences between these bound what raymarch/compaction/
compositing/losses cost. Prints a table to stderr and one JSON line to stdout.

Usage (TPU): python scripts/profile_step.py
Knobs: PROF_ITERS (default 4), BENCH_* as in bench.py for scale.
"""
from __future__ import annotations

import json
import os
import sys
import time


def note(msg):
    print(f"# profile: {msg}", file=sys.stderr, flush=True)


def timed(fn, make_args, iters, consume):
    """Median of ``iters`` timed calls, fresh args each call, output consumed."""
    ts = []
    for i in range(iters):
        args = make_args(i)
        t0 = time.perf_counter()
        out = fn(*args)
        consume(out)
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2]


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from pagnerf_tpu.ops.permuto_encoding import PermutoEncodingSpec

    iters = int(os.environ.get("PROF_ITERS", 4))
    rays = int(os.environ.get("BENCH_BATCH", 6)) * int(os.environ.get("BENCH_RAYS", 4096))
    compact = int(os.environ.get("BENCH_STEPS", 512)) // 2 // 4  # voxel 256 -> 64
    num_lods = int(os.environ.get("BENCH_LODS", 24))
    cap_log2 = int(os.environ.get("BENCH_CAP_LOG2", 18))
    n = rays * compact                        # samples through the NeF post-prune
    f = 2
    note(f"post-prune sample count N={n} ({rays} rays x {compact} compacted), "
         f"L={num_lods}, C=2^{cap_log2}")

    spec = PermutoEncodingSpec(num_levels=num_lods, feature_dim=f,
                               capacity_log2=cap_log2, coarsest_scale=1.0,
                               finest_scale=1e-4)
    key = jax.random.PRNGKey(0)
    ka, kb, kc = jax.random.split(key, 3)
    ta = spec.init(ka)
    tb = spec.init(kb)

    def consume(x):
        jax.block_until_ready(x)

    def coords(i):
        return jax.random.uniform(jax.random.PRNGKey(i), (3, n),
                                  minval=-1.0, maxval=1.0)

    # ---- 1. dual encoding forward ----------------------------------------
    @jax.jit
    def enc_fwd(ta, tb, c):
        a, b = spec.encode_dual_T(ta, tb, c, jnp.bfloat16)
        return a.sum() + b.sum()

    t_fwd = timed(enc_fwd, lambda i: (ta, tb, coords(i)), iters, consume)
    note(f"dual encode FWD: {t_fwd * 1e3:.0f} ms")

    # ---- 2. dual encoding fwd+bwd (the table-gradient path) ---------------
    @jax.jit
    def enc_vjp(ta, tb, c):
        def f_(ta_, tb_):
            a, b = spec.encode_dual_T(ta_, tb_, c, jnp.bfloat16)
            return (a.astype(jnp.float32).sum() + b.astype(jnp.float32).sum())
        g = jax.grad(f_, argnums=(0, 1))(ta, tb)
        return g[0].sum() + g[1].sum()

    t_vjp = timed(enc_vjp, lambda i: (ta, tb, coords(i)), iters, consume)
    note(f"dual encode FWD+BWD: {t_vjp * 1e3:.0f} ms "
         f"(bwd-only ~{(t_vjp - t_fwd) * 1e3:.0f} ms)")

    # ---- 3. the MXU scatter alone at matched event counts -----------------
    from pagnerf_tpu.ops.pallas_scatter import table_grad_matmul_dual
    v = 4
    cap = 1 << cap_log2

    @jax.jit
    def scatter_only(idx, bary, g_a, g_b):
        def body(_, lvl):
            i, b, ga, gb = lvl
            da, db = table_grad_matmul_dual(i, b, ga, gb, cap, f)
            return None, (da.sum(), db.sum())
        _, (sa, sb) = jax.lax.scan(
            body, None, (idx, bary, g_a, g_b))
        return sa.sum() + sb.sum()

    def scatter_args(i):
        k = jax.random.PRNGKey(100 + i)
        k1, k2, k3, k4 = jax.random.split(k, 4)
        idx = jax.random.randint(k1, (num_lods, v, n), 0, cap, jnp.int32)
        bary = jax.random.uniform(k2, (num_lods, v, n))
        g_a = jax.random.uniform(k3, (num_lods, f, n))
        g_b = jax.random.uniform(k4, (num_lods, f, n))
        return idx, bary, g_a, g_b

    t_scat = timed(scatter_only, scatter_args, iters, consume)
    note(f"MXU dual scatter x{num_lods} levels: {t_scat * 1e3:.0f} ms "
         f"({num_lods * v * n / 1e6:.1f}M events/table)")

    # ---- 4. decoder MLP grad at matched sample counts ----------------------
    from pagnerf_tpu.models.decoder import BasicDecoder
    dec = BasicDecoder(output_dim=16, hidden_dim=64, num_layers=1,
                       compute_dtype=jnp.bfloat16)
    feats0 = jax.random.uniform(kc, (num_lods * f, n))   # [Cin, N] feature-major

    @jax.jit
    def mlp_grad(p, x):
        def f_(p_):
            return dec.apply(p_, x).sum()
        g = jax.grad(f_)(p)
        return sum(jnp.sum(l) for l in jax.tree.leaves(g))

    dparams = dec.init(kc, feats0)
    t_mlp = timed(mlp_grad, lambda i: (dparams, feats0 + i), iters, consume)
    note(f"decoder MLP grad at N={n}: {t_mlp * 1e3:.0f} ms")

    print(json.dumps({
        "n_samples": n, "levels": num_lods,
        "enc_fwd_ms": round(t_fwd * 1e3, 1),
        "enc_vjp_ms": round(t_vjp * 1e3, 1),
        "scatter_ms": round(t_scat * 1e3, 1),
        "mlp_grad_ms": round(t_mlp * 1e3, 1),
    }), flush=True)


if __name__ == "__main__":
    main()
