"""Packed-vs-compact end-to-end validation on TPU at flagship scale.

Runs the SAME post-prune panoptic training segment twice — once with the
per-ray compacted layout (PAGNERF_PACKED=0), once with the cross-ray packed
layout (PAGNERF_PACKED=1) — from bit-identical initial state (same param
seed, same forced occupancy mask, same pre-sampled batch sequence, same step
keys), and compares the loss trajectories step for step plus the median step
time of each mode.

The trajectories are NOT expected to be bit-identical: the two layouts
truncate differently (compact keeps min(count, 2*occ*S) per ray; packed
water-fills to ~1.15*occ*S mean budget, dropping <1% of valid samples on the
deep tail where transmittance is lowest — scripts/probe_compact_budget.py).
The acceptance bar is trajectory agreement within a few percent on every
step, which is the same bar the dense-vs-compact switch was validated at.

MEASUREMENT DISCIPLINE (CLAUDE.md rule 6): every timed step does a host read
of an evolving loss; throughput is the median step time (rule 11 stalls).

Usage (TPU): python scripts/packed_parity_tpu.py
Knobs: PARITY_ITERS (default 8), PARITY_OCC (default 0.25, the deployed
convergence-run occupancy; also probes sparse occ via PARITY_OCC2=0.02),
BENCH_BATCH/BENCH_RAYS/BENCH_STEPS/BENCH_MICRO as bench.py.
"""
from __future__ import annotations

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def note(msg):
    print(f"# parity: {msg}", file=sys.stderr, flush=True)


def build(batch_size, rays_per_img, num_steps, occ_frac):
    """Fresh flagship trainer with a deterministically forced occupancy."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from pagnerf_tpu.data.multiview import MultiviewDataset
    from pagnerf_tpu.data.synthetic import make_dataset
    from pagnerf_tpu.models.nefs import GridConfig, PanopticDeltaNeF
    from pagnerf_tpu.models.pipeline import BAPipeline
    from pagnerf_tpu.models.tracer import TracerConfig
    from pagnerf_tpu.ops.occupancy import OccupancyGrid
    from pagnerf_tpu.train.optimizer import OptimizerConfig
    from pagnerf_tpu.train.trainer import PanopticTrainer, TrainerConfig

    data = make_dataset(num_views=12, width=96, height=72, num_spheres=4)
    ds = MultiviewDataset(data)
    si = ds.semantic_info
    grid = GridConfig(grid_type="PermutoGrid",
                      num_lods=int(os.environ.get("BENCH_LODS", 24)),
                      feature_dim=2,
                      capacity_log2=int(os.environ.get("BENCH_CAP_LOG2", 18)),
                      coarsest_scale=1.0, finest_scale=0.0001)
    nef = PanopticDeltaNeF(grid=grid, num_classes=si["num_classes"],
                           num_instances=200, hidden_dim=64,
                           panoptic_features_type="delta",
                           compute_dtype_name="bfloat16")
    pipe = BAPipeline(nef, TracerConfig(num_steps=num_steps, ray_max_travel=2.0),
                      jnp.asarray(data["view_matrices"]), anchor_frame_idxs=[0])
    cfg = TrainerConfig(batch_size=batch_size,
                        num_rays_sampled_per_img=rays_per_img,
                        sem_epoch_start=0, inst_epoch_start=0, prune_every=-1,
                        optimize_val_extrinsics=False,
                        inst_outlier_rejection=True,
                        voxel_raymarch_epoch_start=2, micro_batch_imgs=1)
    trainer = PanopticTrainer(pipe, ds, cfg, OptimizerConfig(), occ_level=7)

    # deterministic occupancy: top-k cells of the INITIAL density field (same
    # params -> same field -> same mask in both modes; no train-steps first,
    # so no layout-dependent drift can leak into the mask)
    trainer.prune(seed=True)
    dens = np.asarray(trainer.occ.occupancy)
    k = max(1, int(round(occ_frac * dens.size)))
    mask = np.zeros(dens.shape, dtype=bool)
    mask.reshape(-1)[np.argpartition(dens.reshape(-1), -k)[-k:]] = True
    trainer.occ = OccupancyGrid(occupancy=trainer.occ.occupancy,
                                mask=jnp.asarray(mask), level=trainer.occ.level)
    trainer._pruned = True
    trainer._occ_frac = float(trainer.occ.mask.mean())
    return ds, trainer


def run_mode(packed, batches, occ_frac, iters, micro_cap, sample_cap,
             force_micro=0):
    import jax
    import numpy as np

    os.environ["PAGNERF_PACKED"] = "1" if packed else "0"
    batch_size = int(os.environ.get("BENCH_BATCH", 6))
    rays_per_img = int(os.environ.get("BENCH_RAYS", 4096))
    num_steps = int(os.environ.get("BENCH_STEPS", 512))
    ds, trainer = build(batch_size, rays_per_img, num_steps, occ_frac)
    stage = trainer.stage_for_epoch(3)   # voxel post-prune regime
    steps_budget = stage.pack_steps or stage.compact_steps or stage.num_steps
    fits = [m for m in range(1, batch_size + 1) if batch_size % m == 0
            and m * rays_per_img * steps_budget <= sample_cap]
    # force_micro pins BOTH parity runs to one microbatching so the step-key
    # stream (one key per microbatch) and therefore the stratified-jitter
    # sample sets are identical across modes — the trajectory diff then
    # isolates the LAYOUT (truncation + integration), not rng drift.
    micro = force_micro or min(micro_cap, max(fits) if fits else 1)
    trainer.cfg = dataclasses.replace(trainer.cfg, micro_batch_imgs=micro)
    label = "packed" if packed else "compact"
    note(f"{label}: occ {100 * trainer._occ_frac:.1f}%  raymarch "
         f"{stage.raymarch_type} {stage.num_steps}  compact "
         f"{stage.compact_steps}  pack {stage.pack_steps}/ray  mb={micro}")

    t0 = time.perf_counter()
    losses = trainer.train_step(stage, batches[0])
    _ = float(losses["total_loss"])
    note(f"{label}: compile+first step {time.perf_counter() - t0:.1f}s")

    traj, durs = [], []
    t_prev = time.perf_counter()
    for i, b in enumerate(batches[1:iters + 1]):
        losses = trainer.train_step(stage, b)
        rec = {k: float(v) for k, v in losses.items()}   # host read = sync
        durs.append(time.perf_counter() - t_prev)
        t_prev = time.perf_counter()
        traj.append(rec)
        note(f"{label} step {i + 1}: {durs[-1]:.2f}s rgb {rec['rgb_loss']:.5f} "
             f"inst {rec.get('inst_loss', 0.0):.4f} total {rec['total_loss']:.3f}")
    lo = min(durs)
    keep = [d for d in durs if d <= 3 * lo]
    rays_s = batch_size * rays_per_img / float(np.median(keep))
    note(f"{label}: {rays_s:.1f} rays/s (median of {len(keep)}/{len(durs)} steps)")
    del trainer
    return traj, rays_s, {"compact": stage.compact_steps,
                          "pack": stage.pack_steps, "micro": micro}


def main():
    from pagnerf_tpu.utils.compile_cache import enable_persistent_cache
    enable_persistent_cache()
    import numpy as np

    iters = int(os.environ.get("PARITY_ITERS", 8))
    occ = float(os.environ.get("PARITY_OCC", 0.25))
    micro_cap = int(os.environ.get("BENCH_MICRO", 6))
    sample_cap = float(os.environ.get("BENCH_SAMPLE_CAP", 2.3e6))
    batch_size = int(os.environ.get("BENCH_BATCH", 6))
    rays_per_img = int(os.environ.get("BENCH_RAYS", 4096))

    # one shared batch sequence (sampling is independent of layout mode)
    from pagnerf_tpu.data.multiview import MultiviewDataset
    from pagnerf_tpu.data.synthetic import make_dataset
    ds = MultiviewDataset(make_dataset(num_views=12, width=96, height=72,
                                       num_spheres=4))
    rng = np.random.default_rng(0)
    batches = [ds.sample_batch(rng, batch_size, rays_per_img)
               for _ in range(iters + 1)]

    # parity phase: both modes at the COMPACT-feasible microbatching so the
    # per-microbatch key streams match (see run_mode); then a timing phase
    # at each mode's deployed microbatching.
    parity_mb = int(os.environ.get("PARITY_MB", 3))
    traj_c, rays_c, info_c = run_mode(False, batches, occ, iters, micro_cap,
                                      sample_cap, force_micro=parity_mb)
    traj_p, rays_p0, info_p0 = run_mode(True, batches, occ, iters, micro_cap,
                                        sample_cap, force_micro=parity_mb)
    _, rays_p, info_p = run_mode(True, batches, occ, max(4, iters // 2),
                                 micro_cap, sample_cap)

    worst = 0.0
    for i, (c, p) in enumerate(zip(traj_c, traj_p)):
        rel = {k: abs(p[k] - c[k]) / (abs(c[k]) + 1e-9)
               for k in c if k in p}
        m = max(rel.values())
        worst = max(worst, m)
        note(f"step {i + 1} max rel diff {m:.4f} "
             + " ".join(f"{k}={rel[k]:.4f}" for k in sorted(rel)))
    ok = worst < 0.05
    out = {"occ_frac": occ, "iters": iters, "parity_mb": parity_mb,
           "compact_rays_per_sec": round(rays_c, 1),
           "packed_rays_per_sec_parity_mb": round(rays_p0, 1),
           "packed_rays_per_sec": round(rays_p, 1),
           "speedup": round(rays_p / rays_c, 3),
           "worst_step_rel_loss_diff": round(worst, 5),
           "trajectories_match_5pct": ok,
           "compact_info": info_c, "packed_info": info_p}
    print(json.dumps(out), flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
