"""Measure the converged field's occupied fraction vs occupancy resolution.

The packed/compacted sample budgets all scale with the occupancy grid's
occupied FRACTION, and on surface-dominated fields that fraction drops as the
cells get finer (a 2-cell-thick shell at 128^3 is a 1-cell shell at 256^3 over
8x the cells). The reference's SPC octree (grids/occtree.py:35, blas_level)
fixes the same trade. This probe loads a converged run's checkpoint and
replays the PRODUCTION prune rule (trainer.prune: max over jittered samples,
threshold, monotone-from-virgin = plain threshold, dilate) at several
``--blas-level`` values, reporting each level's occupied fraction and the
implied packed budget at the deployed voxel march — the honest sizing input
for raising the default level.

Usage (TPU): python scripts/probe_blas_level.py <run_dir> [levels...]
  run_dir must hold config.yaml + model.ckpt (a main.py run directory).
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(run_dir: str, *levels: str) -> None:
    levels = tuple(int(l) for l in levels) or (7, 8)

    from pagnerf_tpu.config.config import parse_options
    from pagnerf_tpu.config.factory import get_modules_from_config
    from pagnerf_tpu.ops.occupancy import OccupancyGrid
    from pagnerf_tpu.train import checkpoint
    from pagnerf_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    cfg_path = os.path.join(run_dir, "config.yaml")
    ckpt = os.path.join(run_dir, "model.ckpt")
    args = parse_options(["--config", cfg_path])
    _, _, trainer = get_modules_from_config(args)
    checkpoint.load_checkpoint(ckpt, trainer, "full")

    steps = trainer.pipeline.tracer_cfg.num_steps // 2   # deployed voxel march
    out = {"run": run_dir, "epoch": trainer.epoch, "voxel_steps": steps,
           "levels": {}}
    for level in levels:
        # virgin mask at this resolution -> prune is a pure threshold+dilate
        # of the CONVERGED field (monotone is a no-op from all-true)
        trainer.occ = OccupancyGrid.create(level=level)
        trainer.prune(seed=False)
        frac = float(trainer.occ.mask.mean())
        pack = max(1, int(1.15 * frac * steps))
        out["levels"][level] = {"occ_frac": round(frac, 4),
                                "pack_per_ray": pack}
        print(f"# level {level} ({1 << level}^3): {100 * frac:.2f}% occupied "
              f"-> pack ~{pack}/ray at voxel {steps}", file=sys.stderr,
              flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main(*sys.argv[1:])
