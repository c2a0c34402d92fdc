"""Benchmark: training-step ray throughput of the flagship PAg-NeRF configuration.

Runs the full jitted training step (pose transform -> permuto delta-NeF -> dense
tracer -> panoptic losses -> Adam) at the reference's best.yaml scale: batch 6 images
x 4096 rays = 24,576 rays/step, PermutoGrid 24 LoDs x 2^18 x 2 (x2 grids), all
panoptic losses + pose optimisation. Prints ONE JSON line.

FOUR schedule segments are measured, mirroring the reference's best.yaml run
epoch for epoch (prune + ray->voxel switch at epoch 201 of 800; panoptic heads
ONLY from epoch 601 — sem/inst epoch_start, SURVEY §6 — so 600 of the 801
epochs are rgb+pose-only steps where the delta grid never runs), plus the
framework's early occupancy seeding:
  * pre (rgb)     — ray mode, 512 samples/ray, dense occupancy (epochs 0..SEED).
  * seeded (rgb)  — ray mode, conservative seed prune (trainer.prune(seed=True)) +
    occupancy-adaptive sample compaction (epochs SEED..201; the packed CUDA
    reference's ragged layout gives it this empty-space skipping from epoch 0).
  * post (rgb)    — voxel mode, 2 samples/voxel (256 steps) compacted via
    occupancy skipping, micro_batch=6 (epochs 201..601).
  * post (panoptic) — same regime with ALL panoptic losses + both grids
    (epochs 601..800; this is also the r1/r2-comparable "post_prune" number).
The HEADLINE number is the OCCUPANCY-TRAJECTORY-WEIGHTED throughput over those
801 epochs — each regime re-measured at the occupancies a committed flagship
convergence run actually traversed (docs/convergence_flagship*/
occupancy_trajectory.json; round-4 verdict: the bench scene's near-empty
post-prune field weighted the old headline at an occupancy real runs never
reach). The bench-scene schedule-weighted number is still computed and
reported alongside for round-over-round continuity. A separate probe times
the panoptic post-prune step at ~25% occupancy so the deployed regime is on
record.
Every timed step prints an evolving rgb_loss: throughput claims are only valid with
real training progress (axon result-caching artifacts read as 1000x wins otherwise —
see PERFORMANCE.md).

``vs_baseline`` compares the schedule-weighted number against an estimated
throughput of the CUDA reference (kaolin-wisp + permutohedral_encoding on an RTX
A6000). The reference repo publishes no benchmark numbers (BASELINE.md); the
estimate assumes ~15 train steps/s at 24,576 rays/step — revise when a measured
number lands.
"""
from __future__ import annotations

import dataclasses
import json
import time

REFERENCE_RAYS_PER_SEC = 370_000.0  # estimated CUDA reference throughput (see above)

# reference 801-epoch schedule segments (best.yaml: prune at 201, panoptic
# heads from 601; seeding at 20 is this framework's addition)
SEED_EPOCH = 20
PRUNE_EPOCH = 201
SEM_EPOCH = 601
TOTAL_EPOCHS = 801


def main():
    import os
    import sys

    from pagnerf_tpu.utils.compile_cache import enable_persistent_cache
    enable_persistent_cache()

    import jax
    import numpy as np
    import jax.numpy as jnp

    from pagnerf_tpu.data.multiview import MultiviewDataset
    from pagnerf_tpu.data.synthetic import make_dataset
    from pagnerf_tpu.models.nefs import GridConfig, PanopticDeltaNeF
    from pagnerf_tpu.models.pipeline import BAPipeline
    from pagnerf_tpu.models.tracer import TracerConfig
    from pagnerf_tpu.train.optimizer import OptimizerConfig
    from pagnerf_tpu.train.trainer import PanopticTrainer, TrainerConfig

    def note(msg):
        print(f"# bench: {msg}", file=sys.stderr, flush=True)

    batch_size = int(os.environ.get("BENCH_BATCH", 6))
    rays_per_img = int(os.environ.get("BENCH_RAYS", 4096))
    num_steps = int(os.environ.get("BENCH_STEPS", 512))
    micro_post = int(os.environ.get("BENCH_MICRO", 6))
    pre_iters = int(os.environ.get("BENCH_PRE_ITERS", 3))
    max_iters = int(os.environ.get("BENCH_ITERS", 8))
    budget = float(os.environ.get("BENCH_BUDGET_S", 3600))
    probe_conv_occ = os.environ.get("BENCH_CONV_OCC", "1") != "0"

    num_lods = int(os.environ.get("BENCH_LODS", 24))        # smoke-testing knobs
    cap_log2 = int(os.environ.get("BENCH_CAP_LOG2", 18))
    occ_level = int(os.environ.get("BENCH_OCC_LEVEL", 7))

    data = make_dataset(num_views=12, width=96, height=72, num_spheres=4)
    ds = MultiviewDataset(data)
    si = ds.semantic_info
    grid = GridConfig(grid_type="PermutoGrid", num_lods=num_lods, feature_dim=2,
                      capacity_log2=cap_log2, coarsest_scale=1.0, finest_scale=0.0001)
    nef = PanopticDeltaNeF(grid=grid, num_classes=si["num_classes"],
                           num_instances=200, hidden_dim=64,
                           panoptic_features_type="delta",
                           compute_dtype_name="bfloat16")
    pipe = BAPipeline(nef, TracerConfig(num_steps=num_steps, ray_max_travel=2.0),
                      jnp.asarray(data["view_matrices"]), anchor_frame_idxs=[0])
    # voxel_raymarch_epoch_start=2: stage_for_epoch(3) below is the reference's
    # post-201 regime (voxel march, samples_per_voxel=2 -> 256 steps, compacted).
    cfg = TrainerConfig(batch_size=batch_size, num_rays_sampled_per_img=rays_per_img,
                        sem_epoch_start=0, inst_epoch_start=0, prune_every=-1,
                        optimize_val_extrinsics=False, inst_outlier_rejection=True,
                        voxel_raymarch_epoch_start=2, micro_batch_imgs=1)
    trainer = PanopticTrainer(pipe, ds, cfg, OptimizerConfig(), occ_level=occ_level)

    rng = np.random.default_rng(0)
    batch = ds.sample_batch(rng, batch_size, rays_per_img)
    note(f"setup done: {batch_size}x{rays_per_img} rays")

    def timed_steps(stage, label, iters, start):
        # Throughput from the MEDIAN step time: the axon service exhibits rare
        # multi-minute device stalls mid-run (PERFORMANCE.md round-3 caveat —
        # one observed 6.3 s step took 399 s), and a single stall in a mean
        # would misreport the regime 10x. Every step still prints its
        # cumulative time + evolving rgb_loss, so outliers stay visible.
        t0 = time.perf_counter()
        durs = []
        while len(durs) < iters:
            losses = trainer.train_step(stage, batch)
            jax.block_until_ready(trainer.params)
            # HOST READ before taking the time: on axon block_until_ready can
            # return early (CLAUDE.md rule 6), and a dispatch-only first dur
            # would anchor the stall filter and discard every real step.
            rgb = float(losses.get("rgb_loss", 0.0))
            durs.append(time.perf_counter() - t0 - sum(durs))
            note(f"{label} step {len(durs)}: cumulative "
                 f"{time.perf_counter() - t0:.1f}s "
                 f"rgb_loss {rgb:.5f}")
            if time.perf_counter() - start > budget and durs:
                break
        # stall filter anchored to the FASTEST step (legit steps cluster within
        # ~1.2x of it under the evolving-loss discipline; a stall is 10-60x):
        # a 3x-median anchor fails when a stall dominates few steps (two steps
        # [6.3s, 399s] -> median 203s)
        lo = min(durs)
        keep = [d for d in durs if d <= 3 * lo]
        if len(keep) < len(durs):
            note(f"{label}: dropped {len(durs) - len(keep)} stall outlier "
                 f"step(s) (max {max(durs):.1f}s vs fastest {lo:.1f}s)")
        return batch_size * rays_per_img / float(np.median(keep))

    def run_phase(stage, label, iters, start, micro):
        trainer.cfg = dataclasses.replace(trainer.cfg, micro_batch_imgs=micro)
        t0 = time.perf_counter()
        trainer.train_step(stage, batch)   # compile + warmup
        jax.block_until_ready(trainer.params)
        note(f"{label} compile+first step: {time.perf_counter() - t0:.1f}s "
             f"({stage.raymarch_type} {stage.num_steps} steps"
             + (f" compacted to {stage.compact_steps}" if stage.compact_steps
                else "")
             + (f" packed to {stage.pack_steps}/ray" if stage.pack_steps
                else "") + f", micro_batch_imgs={micro})")
        rays = timed_steps(stage, label, iters, start)
        note(f"{label}: {rays:.1f} rays/s")
        return rays

    def rgb_only(stage):
        # The reference trains rgb+pose ONLY for epochs < sem/inst_epoch_start
        # (601 of 801 in best.yaml): no panoptic channels -> the delta grid,
        # its dual gather/scatter, and the sem/inst heads are never traced.
        return dataclasses.replace(
            stage, channels=frozenset({"rgb"}), use_sem=False, use_inst=False,
            use_inst_segment_reg=False)

    # The HBM envelope is set by the [L, V, 3, N] lattice-index intermediates
    # (permuto_encoding), which the rgb-only path computes in full — so the
    # rgb segments get the SAME per-microbatch sample cap as panoptic ones
    # (3.3M samples rgb-only compile-OOMs by 90 MB; 2.23M fits either way).
    cap = float(os.environ.get("BENCH_SAMPLE_CAP", 2.3e6))
    cap_rgb = float(os.environ.get("BENCH_SAMPLE_CAP_RGB", cap))

    def micro_for(stage, sample_cap):
        steps = stage.pack_steps or stage.compact_steps or stage.num_steps
        fits = [m for m in range(1, batch_size + 1)
                if batch_size % m == 0
                and m * rays_per_img * steps <= sample_cap]
        if not fits:   # even mb=1 exceeds the cap (e.g. BENCH_RAYS raised):
            note(f"mb=1 already exceeds the sample cap "
                 f"({rays_per_img * steps:.0f} > {sample_cap:.0f}) — running "
                 f"mb=1 anyway")
            return 1
        return max(fits)

    def force_occupancy(keep_frac, label):
        # Re-threshold the measured density field so the top ``keep_frac`` of
        # cells stay occupied. The choice CANNOT affect step timing (the
        # compiled step is shape-static; occupancy only selects which samples
        # are valid) — it selects the compaction budget, which is what the
        # regimes differ in — and keeps the loss genuinely evolving.
        from pagnerf_tpu.ops.occupancy import OccupancyGrid
        dens = np.asarray(trainer.occ.occupancy)
        # top-k selection, NOT a quantile threshold: a degenerate plateau field
        # (every density at MIN_DENSITY — the case that triggers this fallback)
        # ties at the quantile and `>= thr` would keep ~100% of cells, zeroing
        # the compaction budget and failing the post-prune stage assert.
        k = max(1, int(round(keep_frac * dens.size)))
        mask = np.zeros(dens.shape, dtype=bool)
        mask.reshape(-1)[np.argpartition(dens.reshape(-1), -k)[-k:]] = True
        trainer.occ = OccupancyGrid(occupancy=trainer.occ.occupancy,
                                    mask=jnp.asarray(mask),
                                    level=trainer.occ.level)
        trainer._occ_frac = frac = float(trainer.occ.mask.mean())
        note(f"{label}: forced occupancy {100 * frac:.1f}% (top-{k} cells)")
        return frac

    start = time.perf_counter()

    # ---- phase 1: pre-prune (ray mode, 512 steps, dense occupancy) --------
    stage_pre = trainer.stage_for_epoch(0)
    assert stage_pre.raymarch_type == "ray" and stage_pre.compact_steps == 0
    pre_rays = run_phase(rgb_only(stage_pre), "pre[rgb]", pre_iters, start,
                         micro_for(stage_pre, cap_rgb))

    # ---- phase 2: seeded pre-prune (conservative seed + compaction) -------
    # A real run seeds from a ~20-epoch field; the bench's 4-step field is
    # unconverged, so (exactly like the top-2% fallback of the 201-prune below)
    # force a REPRESENTATIVE seed occupancy when the real conservative seed
    # keeps too much. BENCH_SEED_OCC defaults to 25%, the occupancy the
    # committed convergence run measured at its first threshold prune
    # (docs/convergence).
    seed_occ = float(os.environ.get("BENCH_SEED_OCC", 0.25))
    trainer.prune(seed=True)
    seed_frac = float(trainer.occ.mask.mean())
    note(f"seed prune: {100 * seed_frac:.1f}% cells occupied")
    if seed_frac > seed_occ:
        seed_frac = force_occupancy(seed_occ, "unconverged bench field — "
                                    "representative seed occupancy")

    stage_seed = trainer.stage_for_epoch(0)
    seeded_rays = pre_rays
    if stage_seed.compact_steps > 0 or stage_seed.pack_steps > 0:
        seeded_rays = run_phase(rgb_only(stage_seed), "seeded[rgb]", pre_iters,
                                start, micro_for(stage_seed, cap_rgb))
    else:
        note(f"seeded field too dense for compaction — regime parity with pre "
             f"(pruned={getattr(trainer, '_pruned', None)} "
             f"occ_frac={getattr(trainer, '_occ_frac', None)} "
             f"steps={stage_seed.num_steps})")

    # ---- real prune (the reference does this at epoch 201) ----------------
    # A bench-scale field hasn't crossed the absolute reference density
    # threshold yet, so fall back to keeping the top-2% densest cells when the
    # prune empties the grid.
    trainer.prune()
    occ_frac = float(trainer.occ.mask.mean())
    if occ_frac == 0.0:
        occ_frac = force_occupancy(0.02, "prune fell below the reference "
                                   "density threshold everywhere")
    note(f"pruned: {100 * occ_frac:.2f}% cells occupied")

    # ---- phase 3: post-prune rgb (voxel mode + compaction, epochs 201-601)
    stage_post = trainer.stage_for_epoch(3)
    assert stage_post.raymarch_type == "voxel" and (
        stage_post.compact_steps > 0 or stage_post.pack_steps > 0)
    post_rgb_rays = run_phase(rgb_only(stage_post), "post[rgb]", max_iters,
                              start, min(micro_post,
                                         micro_for(stage_post, cap_rgb)))

    # ---- phase 4: post-prune panoptic (epochs 601-800; r1/r2-comparable) --
    post_rays = run_phase(stage_post, "post[panoptic]", max_iters, start,
                          min(micro_post, micro_for(stage_post, cap)))

    # post-prune occupancy state, restored for the render/probe phases after
    # the trajectory block re-forces other occupancies
    occ_post_state = trainer.occ

    # ---- schedule-weighted throughput (801 reference epochs) --------------
    # at the BENCH SCENE's own occupancies — kept for round-over-round
    # continuity, but NOT the headline: the round-4 verdict's criticism is
    # that the bench scene's near-empty post-prune field (1.5%) weights the
    # post segments at an occupancy real runs never reach.
    seg = [(SEED_EPOCH, pre_rays), (PRUNE_EPOCH - SEED_EPOCH, seeded_rays),
           (SEM_EPOCH - PRUNE_EPOCH, post_rgb_rays),
           (TOTAL_EPOCHS - SEM_EPOCH, post_rays)]
    weighted = sum(e for e, _ in seg) / sum(e / r for e, r in seg)
    note(f"schedule-weighted (bench-scene occupancies): {weighted:.1f} rays/s "
         f"(epochs {SEED_EPOCH} pre[rgb] @ {pre_rays:.0f} + "
         f"{PRUNE_EPOCH - SEED_EPOCH} seeded[rgb] @ {seeded_rays:.0f} + "
         f"{SEM_EPOCH - PRUNE_EPOCH} post[rgb] @ {post_rgb_rays:.0f} + "
         f"{TOTAL_EPOCHS - SEM_EPOCH} post[panoptic] @ {post_rays:.0f})")

    # ---- occupancy-trajectory-weighted headline ----------------------------
    # Weight the 801-epoch schedule by the MEASURED occupancy trajectory of
    # the committed flagship convergence run (docs/convergence_flagship/
    # occupancy_trajectory.json, scripts/extract_occupancy_trajectory.py):
    # each regime is re-measured at the trajectory's min/max occupancy and
    # step time is interpolated LINEARLY IN OCCUPANCY in between (cost =
    # fixed + per-evaluated-sample; evaluated samples scale with the occupied
    # fraction under compaction/packing). BENCH_TRAJ overrides the file;
    # BENCH_TRAJ=0 disables.
    traj_weighted = None
    traj_detail = {}
    # Prefer the finest-calibrated rerun's trajectory when its evidence exists
    # (docs/convergence_flagship_tuned/ — the committed flagship-capacity run
    # whose quality gains are the ones being claimed); fall back to the
    # 0.004-finest run's trajectory.
    _default_traj = "docs/convergence_flagship/occupancy_trajectory.json"
    _tuned_traj = "docs/convergence_flagship_tuned/occupancy_trajectory.json"
    if os.path.exists(_tuned_traj):
        _default_traj = _tuned_traj
    traj_path = os.environ.get("BENCH_TRAJ", _default_traj)
    if traj_path not in ("0", "") and os.path.exists(traj_path) \
            and time.perf_counter() - start < budget:
        with open(traj_path) as f:
            traj = json.load(f)["segments"]

        def measure_regime_at(regime, occ):
            force_occupancy(occ, f"trajectory {regime}")
            if regime.startswith("seeded"):
                stage = trainer.stage_for_epoch(0)       # ray-mode seeded
            else:
                stage = trainer.stage_for_epoch(3)       # voxel-mode post
            rgb = regime.endswith("rgb")
            st = rgb_only(stage) if rgb else stage
            mb = micro_for(stage, cap_rgb if rgb else cap)
            if regime.startswith("post"):
                mb = min(micro_post, mb)
            return run_phase(st, f"{regime}@{100 * occ:.0f}%occ",
                             max_iters, start, mb)

        # Fail-soft: a device fault during a trajectory re-measure must not
        # cost the whole capture — the schedule-weighted headline and the
        # already-measured segment numbers still print.
        try:
            regime_occs = {}
            for s in traj:
                regime_occs.setdefault(s["regime"], set()).add(float(s["occ"]))
            rates = {}   # (regime, occ) -> rays/s
            for regime, occs in regime_occs.items():
                if regime == "pre_rgb":
                    for o in occs:
                        rates[(regime, o)] = pre_rays  # dense, already measured
                    continue
                ends = sorted({min(occs), max(occs)})
                for o in ends:
                    rates[(regime, o)] = measure_regime_at(regime, o)
                if len(ends) == 2:
                    (lo, hi) = ends
                    t_lo = 1.0 / rates[(regime, lo)]
                    t_hi = 1.0 / rates[(regime, hi)]
                    for o in occs - set(ends):
                        t = t_lo + (t_hi - t_lo) * (o - lo) / (hi - lo)
                        rates[(regime, o)] = 1.0 / t
            total_ep = sum(s["ref_epochs"] for s in traj)
            traj_weighted = total_ep / sum(
                s["ref_epochs"] / rates[(s["regime"], float(s["occ"]))]
                for s in traj)
            traj_detail = {f"{r}@{100 * o:.1f}%occ": round(v, 1)
                           for (r, o), v in sorted(rates.items())}
            note(f"occupancy-trajectory-weighted: {traj_weighted:.1f} rays/s "
                 f"over {total_ep:.0f} reference epochs "
                 f"(trajectory: {traj_path})")

            # Seed-refresh lever, measured end-to-end (VERDICT r4 #2): the
            # seeded segment's per-plateau rates vs the counterfactual where
            # the budgets stay FROZEN at the first seed occupancy for the
            # whole segment (seed_refresh_every=0). >1 means refreshing is
            # faster; <1 means the field FILLED IN as it converged and the
            # refreshed budgets honestly track a denser field.
            seeded = [s for s in traj if s["regime"] == "seeded_rgb"]
            if len(seeded) > 1:
                ref_ep = sum(s["ref_epochs"] for s in seeded)
                t_refresh = sum(s["ref_epochs"]
                                / rates[("seeded_rgb", float(s["occ"]))]
                                for s in seeded)
                occ0 = float(seeded[0]["occ"])
                refresh_effect = (ref_ep
                                  / rates[("seeded_rgb", occ0)]) / t_refresh
                note(f"seed-refresh lever: refreshed-budget seeded segment "
                     f"runs {refresh_effect:.2f}x the "
                     f"frozen-at-{100 * occ0:.0f}%-seed counterfactual "
                     f"({ref_ep:.0f} ref epochs, {ref_ep / t_refresh:.0f} vs "
                     f"{rates[('seeded_rgb', occ0)]:.0f} rays/s)")
        except Exception as e:                          # noqa: BLE001
            note(f"trajectory-weighted phase FAILED ({type(e).__name__}: "
                 f"{e}); falling back to the schedule-weighted headline")
            traj_weighted, traj_detail, seeded = None, {}, []

    # restore the post-prune occupancy for the serving/probe phases (the
    # trajectory block leaves the field at its last forced occupancy)
    trainer.occ = occ_post_state
    trainer._occ_frac = occ_frac

    # ---- render (serving) throughput at the post-prune regime -------------
    # The reference logs "render time/img" per validation (SURVEY §6,
    # pc_nerf/trainer.py:699-704). Full-image forward renders with all
    # panoptic channels, through the CURRENT stage's raymarch settings —
    # the regime a deployed/interactive viewer serves from. Each timed frame
    # is a DISTINCT view rendered exactly once (axon caches repeated launches
    # with identical inputs — CLAUDE.md rule 6), with a host read per frame.
    # Runs AFTER the trajectory headline: under budget pressure the headline
    # survives, the serving number is the one dropped.
    render_rays = render_ms = None
    if (os.environ.get("BENCH_RENDER", "1") != "0"
            and time.perf_counter() - start < budget):
        try:
            from pagnerf_tpu.train.validation import _rays_from
            imgs = ds.get_images(split="val", mip=0)
            chans = {"rgb", "depth", "semantics", "inst_embedding"}
            n_views = imgs["imgs"].shape[0]
            h, w = imgs["imgs"].shape[1:3]
            t0 = time.perf_counter()
            _ = np.asarray(trainer.batch_render(
                _rays_from(imgs, 0, False), chans,
                stage_cfg=stage_post).rgb)   # compile + warmup
            note(f"render compile+first frame: "
                 f"{time.perf_counter() - t0:.1f}s "
                 f"({w}x{h}, {len(chans)} channels)")
            t0 = time.perf_counter()
            for i in range(1, n_views):
                _ = np.asarray(trainer.batch_render(
                    _rays_from(imgs, i, False), chans,
                    stage_cfg=stage_post).rgb)
            dt = time.perf_counter() - t0
            render_ms = 1000.0 * dt / (n_views - 1)
            render_rays = (n_views - 1) * h * w / dt
            note(f"render: {render_rays:.0f} rays/s, {render_ms:.1f} ms/img "
                 f"over {n_views - 1} distinct views")
        except Exception as e:                          # noqa: BLE001
            note(f"render phase FAILED ({type(e).__name__}: {e}); "
                 f"continuing without serving numbers")
            render_rays = render_ms = None

    # ---- probe: panoptic post-prune at the convergence run's ~25% occ -----
    post_conv_rays = None
    if probe_conv_occ and time.perf_counter() - start < budget:
        try:
            force_occupancy(0.25, "conv-occupancy probe")
            stage_conv = trainer.stage_for_epoch(3)
            note(f"conv-occupancy probe: "
                 f"{100 * trainer._occ_frac:.1f}% occupied, "
                 f"compact budget {stage_conv.compact_steps}, "
                 f"pack budget {stage_conv.pack_steps}/ray")
            post_conv_rays = run_phase(
                stage_conv, "post@25%occ", max_iters, start,
                min(micro_post, micro_for(stage_conv, cap)))
        except Exception as e:                          # noqa: BLE001
            note(f"conv-occupancy probe FAILED ({type(e).__name__}: {e})")
            post_conv_rays = None

    headline = traj_weighted if traj_weighted is not None else weighted
    out = {
        "metric": ("train_rays_per_sec_occupancy_trajectory_weighted"
                   if traj_weighted is not None
                   else "train_rays_per_sec_schedule_weighted"),
        "value": round(headline, 1),
        "unit": "rays/s",
        "vs_baseline": round(headline / REFERENCE_RAYS_PER_SEC, 3),
        "schedule_weighted_bench_occ": round(weighted, 1),
        "pre_prune_rgb": round(pre_rays, 1),
        "seeded_rgb": round(seeded_rays, 1),
        "post_prune_rgb": round(post_rgb_rays, 1),
        "post_prune": round(post_rays, 1),
        "seed_occ_frac": round(seed_frac, 4),
        "post_occ_frac": round(occ_frac, 4),
    }
    if traj_weighted is not None:
        out["trajectory_rates"] = traj_detail
        out["trajectory_source"] = traj_path
        if len(seeded) > 1:
            out["seeded_refresh_vs_frozen_seed_occ"] = round(refresh_effect, 3)
    if post_conv_rays is not None:
        out["post_prune_at_25pct_occ"] = round(post_conv_rays, 1)
    if render_rays is not None:
        out["render_rays_per_sec"] = round(render_rays, 1)
        out["render_ms_per_img"] = round(render_ms, 1)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
