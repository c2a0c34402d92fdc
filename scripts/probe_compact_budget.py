"""Measure the deployed per-ray valid-sample distribution against the
compaction-budget rule.

The post-prune sample-compaction budget (trainer.stage_for_epoch) is a static
shape chosen from the occupied VOLUME fraction: ``2 * occ_frac * num_steps``
(2x headroom, floor S/4). But compaction truncation is governed by the per-ray
valid-sample COUNT — a line statistic. For surface-shell occupancy fields the
line quantiles can sit far below 2x the volume fraction (a ray crosses a
sphere's diameter, not its volume), in which case the rule wastes most of the
sample budget in the regime that covers 400/801 reference epochs.

This probe loads a REAL trained checkpoint (its exact post-prune occupancy
field), marches every training view's full-image rays through the deployed
voxel-mode settings, and prints the valid-count quantiles next to the current
rule's budget — the measurement that decides whether a measured budget is
worth deploying.

Runs on CPU (the march is mask-only, no NeF).

Usage:
  python scripts/probe_compact_budget.py _results/.../model.ckpt \
      [--num-views 120] [--width 96] [--height 72] [--steps 256] [--travel 2.0]
"""
from __future__ import annotations

import argparse
import sys

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("ckpt")
    ap.add_argument("--num-views", type=int, default=120)
    ap.add_argument("--width", type=int, default=96)
    ap.add_argument("--height", type=int, default=72)
    ap.add_argument("--steps", type=int, default=256)
    ap.add_argument("--travel", type=float, default=2.0)
    ap.add_argument("--mode", default="voxel", choices=["voxel", "ray"])
    ap.add_argument("--max-views", type=int, default=24,
                    help="probe this many evenly-spaced training views")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from flax import serialization as flax_ser

    from pagnerf_tpu.data.multiview import MultiviewDataset
    from pagnerf_tpu.data.synthetic import make_dataset
    from pagnerf_tpu.ops.occupancy import OccupancyGrid
    from pagnerf_tpu.ops.raymarch import raymarch
    from pagnerf_tpu.train.validation import _rays_from

    with open(args.ckpt, "rb") as f:
        state = flax_ser.msgpack_restore(f.read())
    occ = OccupancyGrid(occupancy=jnp.asarray(state["occupancy"]),
                        mask=jnp.asarray(state["occ_mask"]),
                        level=int(state["occ_level"]))
    occ_frac = float(np.asarray(occ.mask).mean())
    print(f"checkpoint epoch {state.get('epoch')}: occupancy {100 * occ_frac:.1f}% "
          f"(res {occ.res})")

    data = make_dataset(num_views=args.num_views, width=args.width,
                        height=args.height, num_spheres=4)
    ds = MultiviewDataset(data)
    imgs = ds.get_images(split="train", mip=0)
    n = imgs["imgs"].shape[0]
    views = np.unique(np.linspace(0, n - 1, args.max_views).astype(int))

    march = jax.jit(lambda r: raymarch(
        r, occ, args.steps, raymarch_type=args.mode,
        ray_max_travel=args.travel).mask.sum(-1))

    counts = []
    for i in views:
        counts.append(np.asarray(march(_rays_from(imgs, int(i), False))))
    c = np.concatenate(counts)
    qs = [50, 90, 99, 99.9, 99.99, 100]
    vals = np.percentile(c, qs)
    print(f"{args.mode}/{args.steps} over {c.size} rays "
          f"({len(views)} views): valid-count quantiles:")
    for q, v in zip(qs, vals):
        print(f"  q{q:<6} {v:8.1f}")

    rule = int(np.ceil(2.0 * occ_frac * args.steps / 16.0)) * 16
    rule = min(args.steps, max(args.steps // 4, rule))
    for cover in (99.9, 99.99):
        q = float(np.percentile(c, cover))
        meas = min(args.steps, max(16, int(np.ceil(q / 16.0)) * 16))
        trunc = float((c > meas).mean())
        print(f"measured budget @q{cover}: {meas}  "
              f"(truncates {100 * trunc:.3f}% of rays; "
              f"current volume-rule budget: {rule})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
