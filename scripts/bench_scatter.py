"""Scatter-strategy shootout for the encoding table gradient (round-2 perf work).

Compares, at per-level flagship scale (C=2^18, F=2, V=4, N=2.1M -> M=8.4M events):
  mxu      — the one-hot-matmul Pallas kernel (ops/pallas_scatter.table_grad_matmul)
  xla      — flat XLA .at[].add scatter
  sort     — jax.lax.sort events by table slot, then scatter with indices_are_sorted
  sortseg  — sort + cumsum-diff segment reduction, final scatter touches each slot once

Every iteration gets EVOLVING inputs and consumes the result (sum) — loop-invariant
microbenchmarks on axon read as ~0 due to runtime result caching (PERFORMANCE.md).

Usage: python scripts/bench_scatter.py [variant ...] (default: all)
Env: N (samples), ITERS.
"""
from __future__ import annotations

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

C = 2 ** 18
F = 2
V = 4
N = int(os.environ.get("N", 2_097_152))
ITERS = int(os.environ.get("ITERS", 8))
LANES = 128


def make_inputs(key):
    k1, k2, k3 = jax.random.split(key, 3)
    idx = jax.random.randint(k1, (V, N), 0, C, dtype=jnp.int32)
    bary = jax.random.uniform(k2, (V, N), jnp.float32)
    g = jax.random.uniform(k3, (F, N), jnp.float32)
    return idx, bary, g


@jax.jit
def xla_scatter(idx, bary, g):
    flat_idx = (idx[:, None, :] * F
                + jnp.arange(F, dtype=idx.dtype)[None, :, None])     # [V, F, N]
    vals = bary[:, None, :] * g[None, :, :]
    dtable = jnp.zeros((C * F,), g.dtype).at[flat_idx.reshape(-1)].add(
        vals.reshape(-1)).reshape(C, F)
    return dtable


@jax.jit
def sort_scatter(idx, bary, g):
    flat_idx = (idx[:, None, :] * F
                + jnp.arange(F, dtype=idx.dtype)[None, :, None]).reshape(-1)
    vals = (bary[:, None, :] * g[None, :, :]).reshape(-1)
    sidx, svals = jax.lax.sort((flat_idx, vals), dimension=0, num_keys=1)
    dtable = jnp.zeros((C * F,), g.dtype).at[sidx].add(
        svals, indices_are_sorted=True).reshape(C, F)
    return dtable


@jax.jit
def sortseg_scatter(idx, bary, g):
    """Sorted segment reduction: run total = csum[run end] - csum[just before run
    start]; each table slot is written exactly once per scatter (sorted + unique),
    correct for signed values."""
    flat_idx = (idx[:, None, :] * F
                + jnp.arange(F, dtype=idx.dtype)[None, :, None]).reshape(-1)
    vals = (bary[:, None, :] * g[None, :, :]).reshape(-1)
    sidx, svals = jax.lax.sort((flat_idx, vals), dimension=0, num_keys=1)
    csum = jnp.cumsum(svals)
    is_end = jnp.concatenate([sidx[1:] != sidx[:-1], jnp.ones((1,), bool)])
    is_start = jnp.concatenate([jnp.ones((1,), bool), sidx[1:] != sidx[:-1]])
    endv = jnp.zeros((C * F,), g.dtype).at[sidx].add(
        jnp.where(is_end, csum, 0.0), indices_are_sorted=True)
    startv = jnp.zeros((C * F,), g.dtype).at[sidx].add(
        jnp.where(is_start, csum - svals, 0.0), indices_are_sorted=True)
    return (endv - startv).reshape(C, F)


@partial(jax.jit, static_argnames=("event_chunk",))
def mxu_scatter(idx, bary, g, event_chunk=1024):
    from pagnerf_tpu.ops.pallas_scatter import table_grad_matmul
    return table_grad_matmul(idx, bary, g, C, F, event_chunk=event_chunk)


def run(name, fn, check_against=None):
    key = jax.random.PRNGKey(0)
    times = []
    out = None
    for i in range(ITERS):
        key, k = jax.random.split(key)
        idx, bary, g = jax.block_until_ready(make_inputs(k))
        t0 = time.perf_counter()
        out = jax.block_until_ready(fn(idx, bary, g))
        times.append(time.perf_counter() - t0)
        s = float(out.sum())           # consume
        if i == 0:
            print(f"  {name}: compile+first {times[0]*1e3:.1f} ms (sum {s:.1f})",
                  flush=True)
    steady = sorted(times[1:])[len(times[1:]) // 2] if len(times) > 1 else times[0]
    print(f"  {name}: median steady {steady*1e3:.1f} ms", flush=True)
    return steady


def main():
    variants = sys.argv[1:] or ["mxu", "xla", "sort", "sortseg"]
    print(f"scatter shootout: C={C} F={F} V={V} N={N} M={V*N} "
          f"platform={jax.devices()[0].platform}", flush=True)
    # correctness cross-check at small scale first
    key = jax.random.PRNGKey(42)
    small = (jax.random.randint(key, (V, 4096), 0, C, dtype=jnp.int32),
             jax.random.uniform(key, (V, 4096)),
             jax.random.uniform(key, (F, 4096)))
    ref = xla_scatter(*small)
    for name, fn in [("sort", sort_scatter), ("sortseg", sortseg_scatter),
                     ("mxu", mxu_scatter)]:
        got = fn(*small)
        err = float(jnp.abs(got - ref).max() / (jnp.abs(ref).max() + 1e-9))
        print(f"  correctness {name}: rel err {err:.2e}", flush=True)

    fns = {"mxu": mxu_scatter, "xla": xla_scatter, "sort": sort_scatter,
           "sortseg": sortseg_scatter,
           "mxu2048": lambda i, b, g: mxu_scatter(i, b, g, event_chunk=2048),
           "mxu4096": lambda i, b, g: mxu_scatter(i, b, g, event_chunk=4096)}
    results = {}
    for v in variants:
        try:
            results[v] = run(v, fns[v])
        except Exception as e:
            print(f"  {v}: FAILED {type(e).__name__}: {str(e)[:300]}", flush=True)
    print("RESULTS " + " ".join(f"{k}={v*1e3:.1f}ms" for k, v in results.items()),
          flush=True)


if __name__ == "__main__":
    main()
