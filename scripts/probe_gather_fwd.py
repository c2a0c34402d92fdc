"""Decompose the forward table-gather phase (the #1 step phase per round-3
roofline: dual encode FWD = 1050 ms at flagship post scale) into its parts,
and A/B the candidate XLA-level levers, at the exact deployed shapes.

Parts probed per (level, vertex) at flagship scale (C=2^18, dual 2F=4 lanes
per entry -> packed rows [8192, 128], N samples):
  1. pure row gather       — the hardware gather unit alone
  2. gather + lane select  — the deployed _gather_feats inner step
  3. full 24-level dual fwd— ops/table_gather._dual_forward (the real phase)
Levers A/B'd:
  4. entry-reshape select  — one [N, 32] one-hot over ENTRIES, features via a
     [N, 32, 4] view (4x fewer compares than the [N, 128] lane masks)
  5. bf16 packed rows      — halves the materialised [N, 128] row traffic
     (the gather RATE is row-byte-independent, but the select reads the
     materialised rows from HBM)

MEASUREMENT DISCIPLINE (CLAUDE.md rule 6): evolving-state loops (outputs feed
back into indices), HOST READ sync.

Usage (TPU): python scripts/probe_gather_fwd.py
Knobs: PROF_ITERS (default 4), PROBE_N (default 1.57e6).
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def note(msg):
    print(f"# gatherfwd: {msg}", file=sys.stderr, flush=True)


def main():
    from pagnerf_tpu.utils.compile_cache import enable_persistent_cache
    enable_persistent_cache()
    import jax
    import jax.numpy as jnp

    iters = int(os.environ.get("PROF_ITERS", 4))
    n = int(float(os.environ.get("PROBE_N", 1.57e6)))
    c = 1 << 18
    f2 = 4                       # dual: 2 grids x F=2 lanes per entry
    rows = (c * f2) // 128       # 8192
    epr = 128 // f2              # 32 entries per packed row
    l, v = 24, 4
    note(f"N={n} C=2^18 dual-lanes={f2} rows={rows} L={l} V={v}")

    key = jax.random.PRNGKey(0)
    packed0 = jax.random.normal(key, (rows, 128), jnp.float32)
    idx0 = jax.random.randint(key, (n,), 0, c)

    def loop(step_fn, state, label, per=1.0):
        def consume(s):
            return float(jnp.asarray(jax.tree.leaves(s)[0]).ravel()[:8].sum())
        step_fn = jax.jit(step_fn)
        state = step_fn(state)
        consume(state)
        t0 = time.perf_counter()
        for _ in range(iters):
            state = step_fn(state)
        consume(state)
        dt = (time.perf_counter() - t0) / iters * 1e3
        note(f"{label}: {dt:.1f} ms/iter ({dt / per:.2f} ms per unit)")
        return dt

    # ---- 1. pure row gather (one level-vertex) ----------------------------
    def g_step(state):
        packed, idx = state
        rws = packed.at[idx // epr].get(mode="promise_in_bounds")   # [N, 128]
        rws = jax.lax.optimization_barrier(rws)
        bump = (rws[:, 0].astype(jnp.int32)) & 0x7
        return packed, (idx + bump + 1) % c

    t_g = loop(g_step, (packed0, idx0), "pure row gather [N] (x1 level-vertex)")

    # ---- 2. gather + deployed lane select ----------------------------------
    def gs_step(state):
        packed, idx = state
        rws = packed.at[idx // epr].get(mode="promise_in_bounds")
        rws = jax.lax.optimization_barrier(rws)
        lane0 = (idx % epr) * f2
        lanes = jax.lax.broadcasted_iota(jnp.int32, (n, 128), 1)
        feats = [jnp.sum(rws * (lanes == (lane0 + fi)[:, None]), axis=1)
                 for fi in range(f2)]                              # 4 x [N]
        out = sum(feats)
        return packed, (idx + out.astype(jnp.int32) % 7 + 1) % c

    t_gs = loop(gs_step, (packed0, idx0), "gather + 4-lane select (deployed)")

    # ---- 4. entry-reshape select -------------------------------------------
    def gr_step(state):
        packed, idx = state
        rws = packed.at[idx // epr].get(mode="promise_in_bounds")
        rws = jax.lax.optimization_barrier(rws)
        ent = jax.lax.broadcasted_iota(jnp.int32, (n, epr), 1)
        onehot = (ent == (idx % epr)[:, None]).astype(rws.dtype)   # [N, 32]
        feats = jnp.einsum("nef,ne->fn", rws.reshape(n, epr, f2), onehot)
        out = feats.sum(0)
        return packed, (idx + out.astype(jnp.int32) % 7 + 1) % c

    t_gr = loop(gr_step, (packed0, idx0), "gather + entry-reshape select")

    # ---- 5. bf16 rows -------------------------------------------------------
    packed_bf0 = packed0.astype(jnp.bfloat16)

    def gb_step(state):
        packed, idx = state
        rws = packed.at[idx // epr].get(mode="promise_in_bounds")  # [N,128] bf16
        rws = jax.lax.optimization_barrier(rws)
        lane0 = (idx % epr) * f2
        lanes = jax.lax.broadcasted_iota(jnp.int32, (n, 128), 1)
        feats = [jnp.sum((rws * (lanes == (lane0 + fi)[:, None])
                          ).astype(jnp.float32), axis=1) for fi in range(f2)]
        out = sum(feats)
        return packed, (idx + out.astype(jnp.int32) % 7 + 1) % c

    t_gb = loop(gb_step, (packed_bf0, idx0), "bf16 gather + 4-lane select")

    # ---- 3. full 24-level dual forward (the real phase) --------------------
    from pagnerf_tpu.ops.table_gather import dual_multilevel_table_gather
    tables_a0 = jax.random.normal(key, (l, c, 2), jnp.float32) * 0.01
    tables_b0 = jax.random.normal(key, (l, c, 2), jnp.float32) * 0.01
    idxs0 = jax.random.randint(key, (l, v, n), 0, c)
    bary0 = jax.random.uniform(key, (l, v, n))

    def full_step(state):
        ta, tb, idxs = state
        oa, ob = dual_multilevel_table_gather(ta, tb, idxs, bary0)
        bump = (oa[:, 0, :1] + ob[:, 0, :1]).astype(jnp.int32) % 5  # [L, 1]
        return (ta + 1e-6 * oa.mean(), tb, (idxs + bump[:, None] + 1) % c)

    t_full = loop(full_step, (tables_a0, tables_b0, idxs0),
                  f"full dual fwd ({l} levels x {v} verts)", per=l * v)

    note(f"breakdown per level-vertex: pure gather {t_g:.1f} ms, +select "
         f"{t_gs:.1f} ms (select adds {t_gs - t_g:.1f}), entry-reshape "
         f"{t_gr:.1f} ms, bf16 {t_gb:.1f} ms; full fwd/96 = {t_full / 96:.2f} ms")
    note(f"implied rates: gather {n / t_g / 1e3:.0f}M rows/s, full fwd "
         f"{n * 96 / t_full / 1e3:.0f}M rows/s")
    return 0


if __name__ == "__main__":
    sys.exit(main())
