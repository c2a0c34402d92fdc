"""Post-regime fixed-cost A/B on the chip: pack-map and march-probe variants.

Round-5 profile (docs/profile_post_r5.json) ranks pack machinery (38 ms) and
the voxel march probe+mask (35 ms) as the two largest non-encode fixed costs
of the post-prune step (0.322 s at the bench scene). This probe measures the
deployed implementations against the round-5 variants:

  * pack map: scatter construction (R*S-source scatter) vs gather
    construction (segment-start cumsum + log2(S) lane-packed row searches),
    ops/packed.pack_samples PAGNERF_PACK_GATHER_MAP.
  * march first-hit probe: single-stage (ceil(sqrt(3)*res) fine probes) vs
    two-stage (res/4 mip + windowed fine probes),
    ops/raymarch PAGNERF_WINDOWED_PROBE.

Measurement discipline per PERFORMANCE.md: evolving-state loops, host-read
sync. Emits one JSON object on stdout; the default flips ride the result.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def note(msg):
    print(f"# probe: {msg}", file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from pagnerf_tpu.core.rays import Rays
    from pagnerf_tpu.ops.occupancy import OccupancyGrid
    from pagnerf_tpu.ops.packed import pack_samples
    from pagnerf_tpu.ops import raymarch as rmod
    from pagnerf_tpu.ops.raymarch import RaymarchResult, raymarch

    iters = int(os.environ.get("PROF_ITERS", 6))
    rays = int(os.environ.get("BENCH_BATCH", 6)) * int(os.environ.get("BENCH_RAYS", 4096))
    s_march = int(os.environ.get("BENCH_STEPS", 512)) // 2
    pack_per_ray = int(os.environ.get("PROF_PACK", 8))
    occ_level = int(os.environ.get("BENCH_OCC_LEVEL", 7))

    key = jax.random.PRNGKey(0)
    ka, kb, kc = jax.random.split(key, 3)

    def loop(step_fn, state, label):
        def consume(s):
            return float(jnp.asarray(jax.tree.leaves(s)[0]).ravel()[:8].sum())

        state = step_fn(state)
        consume(state)
        t0 = time.perf_counter()
        for _ in range(iters):
            state = step_fn(state)
        consume(state)
        dt = (time.perf_counter() - t0) / iters * 1e3
        note(f"{label}: {dt:.1f} ms/iter")
        return dt

    out = {"rays": rays, "s_march": s_march, "pack_per_ray": pack_per_ray}

    # ---- pack machinery: scatter vs gather map construction ----------------
    kq1, kq2 = jax.random.split(kc)
    occ_frac_post = pack_per_ray / (1.15 * s_march)
    mask0 = jax.random.uniform(kq1, (rays, s_march)) < occ_frac_post
    depths0 = jnp.cumsum(jax.random.uniform(kq2, (rays, s_march)), axis=-1) * 0.01
    t0s = depths0[:, 0]
    spans = depths0[:, -1] - t0s
    ko1, ko2 = jax.random.split(kc)
    o0 = jax.random.uniform(ko1, (rays, 3), minval=-0.1, maxval=0.1)
    d0 = jax.random.normal(ko2, (rays, 3))
    d0 = d0 / jnp.linalg.norm(d0, axis=-1, keepdims=True)

    def make_pack_step():
        # env is read at TRACE time inside pack_samples; a fresh jitted
        # closure per variant pins the path
        @jax.jit
        def pack_step(state):
            o, d = state
            rm = RaymarchResult(
                positionsT=None, depths=depths0,
                deltas=jnp.full((rays, s_march), 0.01), mask=mask0,
                t0=t0s, span=spans)
            ps = pack_samples(rm, o.T, d.T, budget=pack_per_ray * rays)
            bump = (ps.positionsT.mean() + ps.deltas.mean()) * 1e-9
            return o + bump, d
        return pack_step

    for name, env in (("pack_scatter_map_ms", "0"), ("pack_gather_map_ms", "1")):
        os.environ["PAGNERF_PACK_GATHER_MAP"] = env
        out[name] = loop(make_pack_step(), (o0, d0), name)

    # ---- voxel march: single-stage vs windowed probe -----------------------
    occ = OccupancyGrid.create(level=occ_level)
    kmask = jax.random.uniform(kb, (occ.res ** 3,)) < 0.02
    occ = occ.replace(mask=kmask)

    def make_march_step():
        @jax.jit
        def march_step(state):
            o, d = state
            r = Rays(origins=o, dirs=d, dist_min=jnp.float32(0.0),
                     dist_max=jnp.float32(4.0))
            res = raymarch(r, occ, s_march, raymarch_type="voxel",
                           ray_max_travel=2.0)
            shift = jnp.sum(res.depths * res.mask, axis=-1, keepdims=True) * 1e-6
            return o + shift * d, d
        return march_step

    for name, env in (("march_single_ms", "0"), ("march_windowed_ms", "1")):
        os.environ["PAGNERF_WINDOWED_PROBE"] = env
        out[name] = loop(make_march_step(), (o0, d0), name)

    out["pack_gather_speedup"] = round(
        out["pack_scatter_map_ms"] / max(out["pack_gather_map_ms"], 1e-9), 3)
    out["march_windowed_speedup"] = round(
        out["march_single_ms"] / max(out["march_windowed_ms"], 1e-9), 3)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
