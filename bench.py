"""Benchmark: training-step ray throughput of the flagship PAg-NeRF configuration.

Runs the full jitted training step (pose transform -> permuto delta-NeF -> dense
tracer -> panoptic losses -> Adam) at the reference's best.yaml scale: batch 6 images
x 4096 rays = 24,576 rays/step, PermutoGrid 24 LoDs x 2^18 x 2 (x2 grids), all
panoptic losses + pose optimisation. Prints ONE JSON line.

Two regimes are measured, mirroring the reference's own schedule (best.yaml:
prune + ray->voxel switch at epoch 201 of 800):
  * pre-prune  — ray mode, 512 samples/ray, dense occupancy (epochs 0-200; 25%).
  * post-prune — voxel mode, 2 samples/voxel (256 steps) compacted to 64 valid
    samples/ray via occupancy skipping (epochs 201-800; 75% of the schedule; the
    packed CUDA reference gets the same sample reduction from its ragged layout).
The HEADLINE number is the post-prune steady state — the dominant regime. Both are
printed to stderr. Every timed step prints an evolving rgb_loss: throughput claims
are only valid with real training progress (axon result-caching artifacts read as
1000x wins otherwise — see PERFORMANCE.md).

``vs_baseline`` compares against an estimated throughput of the CUDA reference
(kaolin-wisp + permutohedral_encoding on an RTX A6000). The reference repo publishes
no benchmark numbers (BASELINE.md); the estimate assumes ~15 train steps/s at
24,576 rays/step for the packed CUDA pipeline — revise when a measured number lands.
"""
from __future__ import annotations

import dataclasses
import json
import time

REFERENCE_RAYS_PER_SEC = 370_000.0  # estimated CUDA reference throughput (see above)


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
    budget = float(os.environ.get("BENCH_BUDGET_S", 1800))

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
        t0 = time.perf_counter()
        done = 0
        while done < iters:
            losses = trainer.train_step(stage, batch)
            jax.block_until_ready(trainer.params)
            done += 1
            note(f"{label} step {done}: cumulative {time.perf_counter() - t0:.1f}s "
                 f"rgb_loss {float(losses.get('rgb_loss', 0.0)):.5f}")
            if time.perf_counter() - start > budget and done >= 1:
                break
        return batch_size * rays_per_img * done / (time.perf_counter() - t0)

    start = time.perf_counter()

    # ---- phase 1: pre-prune (ray mode, 512 steps) -------------------------
    stage_pre = trainer.stage_for_epoch(0)
    assert stage_pre.raymarch_type == "ray" and stage_pre.compact_steps == 0
    losses = trainer.train_step(stage_pre, batch)   # compile + warmup
    jax.block_until_ready(trainer.params)
    note(f"pre-prune compile+first step: {time.perf_counter() - start:.1f}s "
         f"({stage_pre.num_steps} samples/ray)")
    pre_rays = timed_steps(stage_pre, "pre", pre_iters, start)
    note(f"pre-prune: {pre_rays:.1f} rays/s")

    # ---- prune (the reference does this at epoch 201) ---------------------
    # The reference prunes after 201 epochs of training; a bench can't afford
    # that, so train in short bursts until the density field is formed enough
    # that pruning keeps cells (throughput is shape-static — warmup length does
    # not affect the timed steady state, only whether the loss keeps evolving).
    def try_prune():
        # The reference prunes after 201 epochs; a bench-scale field hasn't
        # crossed the absolute reference density threshold yet, so fall back to
        # keeping the top-2% densest cells. The threshold choice CANNOT affect
        # the timed result (the compiled step is shape-static — occupancy only
        # selects which samples are valid); it only keeps the loss genuinely
        # evolving through the post-prune phase.
        from pagnerf_tpu.ops.occupancy import OccupancyGrid
        trainer.prune()
        frac = float(trainer.occ.mask.mean())
        if frac == 0.0:
            dens = np.asarray(trainer.occ.occupancy)
            thr = float(np.quantile(dens, 0.98))
            trainer.occ = OccupancyGrid(
                occupancy=trainer.occ.occupancy,
                mask=jnp.asarray(dens >= thr), level=trainer.occ.level)
            frac = float(trainer.occ.mask.mean())
            note(f"prune fell below the reference density threshold everywhere; "
                 f"kept top-2% densest cells (thr={thr:.3f})")
        return frac

    occ_frac = try_prune()
    note(f"pruned: {100 * occ_frac:.2f}% cells occupied")

    # ---- phase 2: post-prune (voxel mode + compaction) --------------------
    trainer.cfg = dataclasses.replace(trainer.cfg, micro_batch_imgs=micro_post)
    stage_post = trainer.stage_for_epoch(3)
    assert stage_post.raymarch_type == "voxel" and stage_post.compact_steps > 0
    t0 = time.perf_counter()
    losses = trainer.train_step(stage_post, batch)
    jax.block_until_ready(trainer.params)
    note(f"post-prune compile+first step: {time.perf_counter() - t0:.1f}s "
         f"({stage_post.num_steps} steps compacted to {stage_post.compact_steps}, "
         f"micro_batch_imgs={micro_post})")
    post_rays = timed_steps(stage_post, "post", max_iters, start)
    note(f"post-prune steady state: {post_rays:.1f} rays/s "
         f"(dominant regime: 599/800 reference epochs)")

    print(json.dumps({
        "metric": "train_rays_per_sec",
        "value": round(post_rays, 1),
        "unit": "rays/s",
        "vs_baseline": round(post_rays / REFERENCE_RAYS_PER_SEC, 3),
    }), flush=True)


if __name__ == "__main__":
    main()
