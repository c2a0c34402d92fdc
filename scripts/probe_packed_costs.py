"""Feasibility probe for the cross-ray PACKED sample layout (PERFORMANCE.md
roadmap): measure the three overheads the design would add, at deployed
flagship scale, so the ~2x NeF/encode saving it buys can be netted out before
any tracer rewrite.

Costs probed (all absent from today's per-ray [R, K] layout):
  1. pack-sort      — one lax.sort over the R*S dense march producing the
                      ray-major packed permutation (6.3M keys at post scale).
  2. pack-gather    — applying the permutation to the [3, R, S] positions
                      (the forward pack) .
  3. pack-scatter   — the gather's VJP: scattering B packed coord-grads back
                      to the dense layout (pose optimisation needs coord
                      grads, so this runs every train step).
  4. seg-cumsum     — segmented integration: [C, B] cumsum + 2R boundary
                      gathers replacing the [R, K] compositing scan.

MEASUREMENT DISCIPLINE (PERFORMANCE.md / CLAUDE.md rule 6): every probe is an
evolving-state loop (each iteration's inputs depend on the previous outputs)
synced by a HOST READ — repeated launches with fresh-but-independent inputs
return cached results on axon.

Usage (TPU): python scripts/probe_packed_costs.py
Knobs: PROF_ITERS (default 4); BENCH_BATCH/BENCH_RAYS/BENCH_STEPS as bench.py;
PACK_MEAN_VALID (default 113, the measured q-mean at the 120v run's 44% occ —
scripts/probe_compact_budget.py).
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def note(msg):
    print(f"# packed: {msg}", file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    iters = int(os.environ.get("PROF_ITERS", 4))
    rays = int(os.environ.get("BENCH_BATCH", 6)) * int(os.environ.get("BENCH_RAYS", 4096))
    steps = int(os.environ.get("BENCH_STEPS", 512)) // 2   # voxel-mode 256
    mean_valid = int(os.environ.get("PACK_MEAN_VALID", 113))
    n_dense = rays * steps
    b = int(1.05 * rays * mean_valid) // 128 * 128
    chans = 8
    note(f"R={rays} S={steps} dense={n_dense} packed B={b} ({b / n_dense:.2f}x)")

    key = jax.random.PRNGKey(0)

    def loop(step_fn, state, label):
        def consume(s):
            return float(jnp.asarray(jax.tree.leaves(s)[0]).ravel()[:8].sum())

        step_fn = jax.jit(step_fn)
        state = step_fn(state)                     # compile + warmup
        consume(state)
        t0 = time.perf_counter()
        for _ in range(iters):
            state = step_fn(state)
        consume(state)                             # syncs the whole chain
        dt = (time.perf_counter() - t0) / iters * 1e3
        note(f"{label}: {dt:.1f} ms/iter")
        return dt

    # ---- 1. pack-sort: [R*S] keys -> packed permutation ------------------
    # key = ray*S + step where valid else +inf; evolving via the value array.
    vals0 = jax.random.uniform(key, (n_dense,))
    base_key = jnp.arange(n_dense, dtype=jnp.float32)

    def sort_step(state):
        vals, = state
        keys = jnp.where(vals > 0.56, base_key, jnp.float32(3e38))
        skeys, sidx = jax.lax.sort((keys, jnp.arange(n_dense, dtype=jnp.int32)),
                                   num_keys=1)
        # evolve: mix the permutation back into the values
        return (vals * 0.999 + 1e-4 * (sidx[:n_dense].astype(jnp.float32)
                                       / n_dense),)

    t_sort = loop(sort_step, (vals0,), "pack-sort (lax.sort, key+idx)")

    # ---- 2. pack-gather: [3, R*S] -> [3, B] via the permutation ----------
    pos0 = jax.random.uniform(key, (3, n_dense))
    idx0 = jax.random.randint(key, (b,), 0, n_dense)

    def gather_step(state):
        pos, idx = state
        packed = pos[:, idx]                                 # [3, B]
        bump = packed.mean() * 1e-6
        idx2 = (idx + 1) % n_dense
        return pos + bump, idx2

    t_gather = loop(gather_step, (pos0, idx0), "pack-gather [3,B]")

    # ---- 3. pack-scatter: VJP of the gather (coord grads back to dense) --
    def scatter_step(state):
        dense, idx = state
        upd = dense[:, idx] * 0.5                            # [3, B] from chain
        out = jnp.zeros((3, n_dense), dense.dtype).at[:, idx].add(upd)
        return dense * 0.999 + out * 1e-3, (idx + 1) % n_dense

    t_scatter = loop(scatter_step, (pos0, idx0),
                     "pack-scatter VJP [3,B]->dense (incl. one [3,B] gather)")

    # ---- 4. segmented integration: [C, B] cumsum + 2R boundary gathers ----
    feats0 = jax.random.uniform(key, (chans, b))
    bounds0 = jnp.sort(jax.random.randint(key, (rays,), 0, b))

    def seg_step(state):
        feats, bounds = state
        cs = jnp.cumsum(feats, axis=1)                       # [C, B]
        hi = cs[:, jnp.minimum(bounds + mean_valid, b - 1)]
        lo = cs[:, bounds]
        ray_sums = hi - lo                                   # [C, R]
        bump = ray_sums.mean() * 1e-6
        return feats * 0.999 + bump, (bounds + 1) % (b - mean_valid)

    t_seg = loop(seg_step, (feats0, bounds0), f"seg-cumsum [{chans},B] + bounds")

    total = t_sort + t_gather + t_scatter + t_seg
    note(f"TOTAL packed-layout overhead: {total:.0f} ms/step-equivalent "
         f"(vs the ~2x encode+NeF saving it buys at {b / n_dense:.2f}x samples)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
