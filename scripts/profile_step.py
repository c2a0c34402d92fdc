"""Per-phase timing of the POST-PRUNE flagship train step (the bench headline).

Decomposes the step into isolated jitted sub-programs. MEASUREMENT DISCIPLINE
(PERFORMANCE.md): the axon runtime returns cached results for repeated program
launches even with fresh random inputs — phase timings are only trustworthy when
each iteration's INPUTS DEPEND ON the previous iteration's OUTPUTS (a real
sequential dependency chain, like a train loop's evolving params). Every phase
here is an update loop: the measured program's output feeds back into its own
parameters.

Usage (TPU): python scripts/profile_step.py
Knobs: PROF_ITERS (default 4), BENCH_* as in bench.py for scale.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def note(msg):
    print(f"# profile: {msg}", file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from pagnerf_tpu.ops.permuto_encoding import PermutoEncodingSpec

    iters = int(os.environ.get("PROF_ITERS", 4))
    rays = int(os.environ.get("BENCH_BATCH", 6)) * int(os.environ.get("BENCH_RAYS", 4096))
    compact = int(os.environ.get("BENCH_STEPS", 512)) // 2 // 4  # voxel 256 -> 64
    num_lods = int(os.environ.get("BENCH_LODS", 24))
    cap_log2 = int(os.environ.get("BENCH_CAP_LOG2", 18))
    n = rays * compact                        # samples through the NeF post-prune
    f = 2
    v = 4
    cap = 1 << cap_log2
    note(f"post-prune sample count N={n} ({rays} rays x {compact} compacted), "
         f"L={num_lods}, C=2^{cap_log2}")

    spec = PermutoEncodingSpec(num_levels=num_lods, feature_dim=f,
                               capacity_log2=cap_log2, coarsest_scale=1.0,
                               finest_scale=1e-4)
    key = jax.random.PRNGKey(0)
    ka, kb, kc = jax.random.split(key, 3)
    coords0 = jax.random.uniform(kc, (3, n), minval=-1.0, maxval=1.0)

    def loop(step_fn, state, label):
        """Evolving-state timing: state feeds back through the measured program.
        Completion is forced by a HOST READ of the evolved state — on axon,
        block_until_ready returns without waiting for the async stream."""
        def consume(s):
            return float(jnp.asarray(jax.tree.leaves(s)[0]).ravel()[:8].sum())

        state = step_fn(state)                     # compile + warmup
        consume(state)
        t0 = time.perf_counter()
        for _ in range(iters):
            state = step_fn(state)
        consume(state)                             # syncs the whole chain
        dt = (time.perf_counter() - t0) / iters * 1e3
        note(f"{label}: {dt:.0f} ms/iter")
        return dt

    # ---- 1. dual encoding FWD only (tables evolve from the features) -------
    @jax.jit
    def fwd_step(state):
        ta, tb, coords = state
        a, b = spec.encode_dual_T(ta, tb, coords, jnp.bfloat16)
        bump = (a.astype(jnp.float32).mean() + b.astype(jnp.float32).mean())
        return ta + bump * 1e-6, tb - bump * 1e-6, coords

    t_fwd = loop(fwd_step, (spec.init(ka), spec.init(kb), coords0),
                 "dual encode FWD")

    # ---- 2. dual encoding FWD+BWD (params descend their own gradient) ------
    @jax.jit
    def vjp_step(state):
        ta, tb, coords = state
        def f_(ta_, tb_):
            a, b = spec.encode_dual_T(ta_, tb_, coords, jnp.bfloat16)
            return (a.astype(jnp.float32) ** 2).mean() + \
                   (b.astype(jnp.float32) ** 2).mean()
        ga, gb = jax.grad(f_, argnums=(0, 1))(ta, tb)
        return ta - 1e-3 * ga, tb - 1e-3 * gb, coords

    t_vjp = loop(vjp_step, (spec.init(ka), spec.init(kb), coords0),
                 "dual encode FWD+BWD")

    # ---- 3. MXU dual scatter alone, event stream derived from prior output -
    # (the lane-major _T kernel — the deployed full-R path since round 3;
    # the [M, 1]-operand variant measures ~2x slower at this scale from the
    # 128x padded HBM traffic alone)
    from pagnerf_tpu.ops.pallas_scatter import table_grad_matmul_dual_T

    @jax.jit
    def scatter_step(state):
        seed_tab, idx, bary = state
        g_a = jnp.broadcast_to(seed_tab[:, 0][:, :, None], (num_lods, f, n))
        g_b = g_a + 1.0

        def body(_, lvl):
            i_l, b_l, ga_l, gb_l = lvl
            return None, table_grad_matmul_dual_T(i_l, b_l, ga_l, gb_l, cap, f,
                                                  rows_used=0)

        _, (da, db) = jax.lax.scan(body, None, (idx, bary, g_a, g_b))
        # fold the scatter result back into next iteration's values and indices
        new_seed = seed_tab + da * 1e-6
        new_idx = (idx + 1) % cap
        return new_seed, new_idx, bary

    k1, k2 = jax.random.split(ka)
    st0 = (jnp.zeros((num_lods, cap, f)).at[:, :, :].set(0.5),
           jax.random.randint(k1, (num_lods, v, n), 0, cap, jnp.int32),
           jax.random.uniform(k2, (num_lods, v, n)))
    t_scat = loop(scatter_step, st0, f"MXU dual scatter x{num_lods} levels "
                  f"({num_lods * v * n / 1e6:.0f}M events/table)")

    # ---- 3b. SINGLE-grid encode FWD+BWD (the rgb-only segments' cost) ------
    # Epochs < sem/inst_epoch_start (600 of the reference's 801) never run the
    # delta grid: their encode phase is this, not the dual probe above.
    @jax.jit
    def single_vjp_step(state):
        ta, coords = state
        def f_(ta_):
            a = spec.encode_T(ta_, coords, jnp.bfloat16)
            return (a.astype(jnp.float32) ** 2).mean()
        ga = jax.grad(f_)(ta)
        return ta - 1e-3 * ga, coords

    t_single = loop(single_vjp_step, (spec.init(ka), coords0),
                    "SINGLE-grid encode FWD+BWD (rgb-only segments)")

    # ---- 3c. tracer tail: integration weights + channel compositing grad ---
    # Attributes the step remainder after encode/scatter/MLP: the [R, S]
    # cumsum-exp integration + feature-major composite + loss reduction, at the
    # post-prune compacted scale (R rays x S=compact samples, 19 channels).
    @jax.jit
    def composite_step(state):
        tau_p, feats_p = state
        mask = jnp.ones((rays, compact), bool)
        def f_(tp, fp):
            from pagnerf_tpu.ops.composite import (composite_channel_T,
                                                   exponential_integration_weights)
            w, alpha = exponential_integration_weights(jnp.abs(tp), mask)
            out = composite_channel_T(fp, w)
            return (out ** 2).mean() + (alpha ** 2).mean()
        gt, gf = jax.grad(f_, argnums=(0, 1))(tau_p, feats_p)
        return tau_p - 1e-3 * gt, feats_p - 1e-3 * gf

    t_comp = loop(composite_step,
                  (jax.random.uniform(k1, (rays, compact)),
                   jax.random.uniform(k2, (19, rays, compact))),
                  f"integration+composite grad (R={rays}, S={compact}, C=19)")

    # ---- 3d. device assignment solve (panoptic-loss tail) ------------------
    # One [K, M] solve per image per step (lin_assignment_things); K = GT
    # instances present (~20 upper bound on the synthetic/BUP20 scenes),
    # M = 200 slots. The while_loop is sequential on-device — this probe
    # decides whether the solver is a visible share of the panoptic tail.
    # (Round-4 history: the eps-scaled auction burned its full 4000-iteration
    # cap every solve = 267 ms/step; the JV rewrite measures ~20x less.)
    from pagnerf_tpu.ops.assignment import lap_assign

    imgs_per_step = int(os.environ.get("BENCH_BATCH", 6))

    @jax.jit
    def assign_step(cost):
        present = jnp.ones(cost.shape[1], bool)
        assign = jax.vmap(lambda c: lap_assign(c, present))(cost)
        # evolve the costs from the result so each iteration depends on the
        # previous solve (axon caches repeated launches otherwise)
        bump = jax.nn.one_hot(jnp.maximum(assign, 0), cost.shape[-1]) * 1e-4
        return cost + bump

    t_assign = loop(assign_step,
                    jax.random.uniform(kb, (imgs_per_step, 20, 200)),
                    f"auction assignment ({imgs_per_step} x [20, 200])")

    # ---- 4. decoder MLP grad at matched sample counts (params descend) -----
    from pagnerf_tpu.models.decoder import BasicDecoder
    dec = BasicDecoder(output_dim=16, hidden_dim=64, num_layers=1,
                       compute_dtype=jnp.bfloat16)
    feats0 = jax.random.uniform(kc, (num_lods * f, n))

    @jax.jit
    def mlp_step(state):
        p, x = state
        def f_(p_):
            return (dec.apply(p_, x) ** 2).mean()
        g = jax.grad(f_)(p)
        return jax.tree.map(lambda a, b: a - 1e-3 * b, p, g), x

    t_mlp = loop(mlp_step, (dec.init(kc, feats0), feats0),
                 f"decoder MLP grad at N={n}")

    # ---- 5. voxel raymarch (probe + refit + mask) at the post regime --------
    # The voxel-mode path runs EVERY post step: a sqrt(3)*res-probe first-hit
    # search per ray + the per-sample occupancy mask over the refit span
    # (ops/raymarch.py:119-131). ~5.5M + R*S row-gathers from the bitgrid.
    from pagnerf_tpu.core.rays import Rays
    from pagnerf_tpu.ops.occupancy import OccupancyGrid
    from pagnerf_tpu.ops.raymarch import raymarch

    occ_level = int(os.environ.get("BENCH_OCC_LEVEL", 7))
    occ = OccupancyGrid.create(level=occ_level)
    kmask = jax.random.uniform(kb, (occ.res ** 3,)) < 0.02   # post-like sparsity
    occ = occ.replace(mask=kmask)
    voxel_steps = int(os.environ.get("BENCH_STEPS", 512)) // 2

    @jax.jit
    def march_step(state):
        o, d = state
        r = Rays(origins=o, dirs=d, dist_min=jnp.float32(0.0),
                 dist_max=jnp.float32(4.0))
        res = raymarch(r, occ, voxel_steps, raymarch_type="voxel",
                       ray_max_travel=2.0)
        # evolve ray origins from the result (dependency chain, rule 6)
        shift = jnp.sum(res.depths * res.mask, axis=-1, keepdims=True) * 1e-6
        return o + shift * d, d

    ko1, ko2 = jax.random.split(kc)
    o0 = jax.random.uniform(ko1, (rays, 3), minval=-0.1, maxval=0.1)
    d0 = jax.random.normal(ko2, (rays, 3))
    d0 = d0 / jnp.linalg.norm(d0, axis=-1, keepdims=True)
    t_march = loop(march_step, (o0, d0),
                   f"voxel raymarch probe+mask (R={rays}, S={voxel_steps})")

    # ---- 5b. lattice-scan structure ONLY (keys + bary, no gathers) ----------
    # Ranks the per-level simplex math + scan structure separately from the
    # table gathers it feeds (VERDICT r4 #3: "lattice-scan structure" was a
    # named-but-unquantified post-regime fixed cost; the end-to-end flat-vs-
    # scan A/B already measured as a null, /tmp-queued round 4).
    from pagnerf_tpu.ops.permuto_encoding import (_lattice_all_levels,
                                                  direct_level_specs)

    inv_scales = (1.0 / spec.scales).astype("float32")
    mm0, dm0, direct0, _rows = direct_level_specs(spec.scales, cap, f)

    @jax.jit
    def lattice_step(state):
        coords, acc = state
        idx, bary = _lattice_all_levels(cap_log2, coords, inv_scales,
                                        mm0, dm0, direct0)
        bump = bary.mean() + (idx % 7).astype(jnp.float32).mean() * 1e-9
        return coords + bump * 1e-9, acc + bump

    t_lattice = loop(lattice_step, (coords0, jnp.float32(0.0)),
                     f"lattice keys+bary only (L={num_lods}, N={n})")

    # ---- 5c. pose chain: transform_rays fwd+bwd at step scale ---------------
    # The BA pose chain runs every step: 6-DoF params -> per-ray rotation /
    # translation -> (packed path) segment_broadcast VJP back to the pose.
    from pagnerf_tpu.core.camera import (extrinsics_params_from_view_matrix,
                                         transform_rays as cam_transform)
    from pagnerf_tpu.core.rays import Rays as _Rays

    n_cams = 12
    eye = jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32), (n_cams, 4, 4))
    ext0 = extrinsics_params_from_view_matrix(eye)
    imgs_b = int(os.environ.get("BENCH_BATCH", 6))
    rays_img = rays // imgs_b
    kp1, kp2 = jax.random.split(kb)
    base_o = jax.random.uniform(kp1, (imgs_b, rays_img, 3)) * 0.1
    base_d = jax.random.normal(kp2, (imgs_b, rays_img, 3))
    base_d = base_d / jnp.linalg.norm(base_d, axis=-1, keepdims=True)
    cam_ids = jnp.arange(imgs_b, dtype=jnp.int32)

    @jax.jit
    def pose_step(ext):
        def f_(e):
            r = cam_transform(e, _Rays(origins=base_o, dirs=base_d,
                                       dist_min=jnp.float32(0.0),
                                       dist_max=jnp.float32(6.0)), cam_ids)
            return (r.origins ** 2).mean() + (r.dirs ** 2).mean()
        return ext - 1e-3 * jax.grad(f_)(ext)

    t_pose = loop(pose_step, ext0,
                  f"pose chain grad ({imgs_b} cams x {rays_img} rays)")

    # ---- 5d. pack machinery at post scale -----------------------------------
    # pack_samples' sort + boundary build + packed-space position math — the
    # cross-ray layout's per-step overhead (ops/packed.py), at the deployed
    # voxel march shape.
    from pagnerf_tpu.ops.packed import pack_samples
    from pagnerf_tpu.ops.raymarch import RaymarchResult

    pack_per_ray = int(os.environ.get("PROF_PACK", 8))
    s_march = voxel_steps
    kq1, kq2 = jax.random.split(kc)
    occ_frac_post = pack_per_ray / (1.15 * s_march)
    mask0 = jax.random.uniform(kq1, (rays, s_march)) < occ_frac_post
    depths0 = jnp.cumsum(jax.random.uniform(kq2, (rays, s_march)), axis=-1) * 0.01
    t0s = depths0[:, 0]
    spans = depths0[:, -1] - t0s

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

    t_pack = loop(pack_step, (o0, d0),
                  f"pack machinery (R={rays}, S={s_march} -> "
                  f"{pack_per_ray}/ray)")

    # ---- 6. optimizer update at flagship param count -------------------------
    import optax
    n_params = 2 * num_lods * cap * f        # both grids
    tx = optax.adam(1e-3)

    @jax.jit
    def opt_step(state):
        p, o = state
        g = p * 1e-6 + 1.0
        up, o2 = tx.update(g, o, p)
        return optax.apply_updates(p, up), o2

    p0 = jnp.zeros((n_params,), jnp.float32)
    t_opt = loop(opt_step, (p0, tx.init(p0)),
                 f"adam update ({n_params / 1e6:.1f}M params)")

    print(json.dumps({
        "n_samples": n, "levels": num_lods,
        "enc_fwd_ms": round(t_fwd, 1),
        "enc_vjp_ms": round(t_vjp, 1),
        "enc_single_vjp_ms": round(t_single, 1),
        "scatter_ms": round(t_scat, 1),
        "composite_grad_ms": round(t_comp, 1),
        "assign_ms": round(t_assign, 1),
        "mlp_grad_ms": round(t_mlp, 1),
        "voxel_march_ms": round(t_march, 1),
        "lattice_only_ms": round(t_lattice, 1),
        "pose_chain_ms": round(t_pose, 1),
        "pack_machinery_ms": round(t_pack, 1),
        "adam_ms": round(t_opt, 1),
    }), flush=True)


if __name__ == "__main__":
    main()
