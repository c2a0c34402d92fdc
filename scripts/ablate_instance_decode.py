"""Ablate the instance decode/post-processing chain on a trained checkpoint.

VERDICT round 2 (weak #3): instance quality on the synthetic schedule scene was
poor (PQ-things 0.394 / mAP 0.072) with no diagnosis of which stage of the
decode chain — raw embedding argmax, semantic gating, morphological opening,
center-of-mass outlier rejection, small-mask drop (reference trainer.py:737-772)
— is responsible. This script renders the labeled validation views ONCE from a
checkpoint and scores PQ/SQ/RQ + mAP under each decode variant, so the chain's
contribution is measured instead of guessed.

Usage:
    python scripts/ablate_instance_decode.py <run_dir> [--split val] [--res W H]
where <run_dir> contains the run's config.yaml snapshot and model.ckpt.
Writes <run_dir>/ablate_decode.json and prints a table.

``--res W H`` re-renders the validation views at a different resolution than
the run trained at (the synthetic scene regenerates ground truth at any
resolution; focal scales with width so the frustum is identical). The round-3
instance-floor diagnosis bounded PQ-things by rendering sharpness (SQ-things
0.82 at 96x72, where the smallest spheres are ~13 px) — this flag measures
that claim directly on the SAME checkpoint. Writes ablate_decode_{W}x{H}.json.
"""
from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("run_dir")
    p.add_argument("--split", default="val")
    p.add_argument("--ckpt", default=None)
    p.add_argument("--res", type=int, nargs=2, default=None,
                   metavar=("W", "H"),
                   help="re-render validation at this resolution instead of "
                        "the run's synthetic_res (synthetic scenes only)")
    ns = p.parse_args(argv)

    from pagnerf_tpu.utils.compile_cache import enable_persistent_cache
    enable_persistent_cache()

    from pagnerf_tpu.config.config import parse_options
    from pagnerf_tpu.config.factory import get_modules_from_config
    from pagnerf_tpu.train import checkpoint
    from pagnerf_tpu.train.validation import _rays_from
    from pagnerf_tpu.utils.metrics import MeanAveragePrecision, PanopticQuality
    from pagnerf_tpu.utils.postprocess import (clean_instance_map,
                                               decode_instance_map)

    cfg_path = os.path.join(ns.run_dir, "config.yaml")
    ckpt_path = ns.ckpt or os.path.join(ns.run_dir, "model.ckpt")
    args = parse_options(["--config", cfg_path, "--valid-only"])
    if ns.res is not None:
        if args.multiview_dataset_format not in ("synthetic",):
            p.error("--res only applies to synthetic scenes (GT is "
                    "regenerated at the requested resolution)")
        args.synthetic_res = list(ns.res)
    _, dataset, trainer = get_modules_from_config(args)
    checkpoint.load_checkpoint(ckpt_path, trainer, "full")
    cfg = trainer.cfg
    sem_info = dataset.semantic_info
    stuff_ids = np.asarray(sem_info["stuff_ids"])

    data = dataset.get_images(split=ns.split, mip=0)
    h, w = data["imgs"].shape[1:3]
    use_base = cfg.optimize_val_extrinsics

    # ---- render labeled views once --------------------------------------
    views = []
    for i in range(data["imgs"].shape[0]):
        sem_gts = np.asarray(data["semantics"][i]).reshape(h, w)
        inst_gts = np.asarray(data["instance"][i]).reshape(h, w)
        if np.all(sem_gts == -1) or np.all(inst_gts == -1):
            continue
        rays = _rays_from(data, i, use_base)
        cam_idx = int(data["cam_idx"][i]) if use_base else None
        rb = trainer.batch_render(rays, {"rgb", "semantics", "inst_embedding"},
                                  cam_idx=cam_idx)
        rgb_gt = np.asarray(data["imgs"][i]).reshape(h, w, -1)
        mse = float(np.mean((np.asarray(rb.rgb).reshape(h, w, -1)
                             - rgb_gt) ** 2))
        views.append({
            "sem_map": np.argmax(np.asarray(rb.semantics), -1).reshape(h, w),
            "e": np.asarray(rb.inst_embedding),
            "sem_gts": sem_gts, "inst_gts": inst_gts, "mse": mse,
        })
    psnr = -10.0 * np.log10(np.mean([v["mse"] for v in views]))
    print(f"# {len(views)} labeled {ns.split} views rendered at {w}x{h}; "
          f"pooled PSNR {psnr:.2f} dB", flush=True)

    def decode(v, gated: bool):
        # the production decode (shared with train/validation.py)
        return decode_instance_map(v["e"], v["sem_map"], stuff_ids, gated)[0]

    variants = {
        # name: (gated, num_dilations, outlier_rejection, min_mask_px)
        "joint_argmax_raw": (False, 0, False, 0),
        "gated_raw": (True, 0, False, 0),
        "gated_com": (True, 0, True, 0),
        "gated_com_minpx": (True, 0, True,
                            getattr(cfg, "inst_min_mask_px", 100)),
        "gated_dil1_com_minpx": (True, 1, True,
                                 getattr(cfg, "inst_min_mask_px", 100)),
        "config_default": (cfg.inst_loss == "linear_assignment_things",
                           cfg.inst_num_dilations, cfg.inst_outlier_rejection,
                           getattr(cfg, "inst_min_mask_px", 100)),
    }

    results = {}
    for name, (gated, dil, com, minpx) in variants.items():
        pq = PanopticQuality(set(sem_info["things_ids"]),
                             set(sem_info["stuff_ids"]))
        mAP = MeanAveragePrecision()
        for v in views:
            inst_map = decode(v, gated)
            inst_map, masks, _ = clean_instance_map(
                inst_map, dil, outlier_rejection=com, min_mask_px=minpx)
            pq.update(np.stack([v["sem_map"], inst_map])[None],
                      np.stack([v["sem_gts"], v["inst_gts"]])[None])
            gt_ids = np.unique(v["inst_gts"])
            gt_masks = (v["inst_gts"][None] == gt_ids[1:][:, None, None])
            mAP.update(masks.astype(bool), np.ones(masks.shape[0]), gt_masks)
        row = {}
        for group, vals in pq.compute().items():
            for k, val in vals.items():
                if k != "n":
                    row[f"{k}_{group}"] = round(float(val), 4)
        row.update({k: round(float(v), 4) for k, v in mAP.compute().items()})
        results[name] = row
        print(f"{name:24s} pq_things={row['pq_things']:.3f} "
              f"rq_things={row['rq_things']:.3f} sq_things={row['sq_things']:.3f} "
              f"map={row['map']:.3f} map_50={row['map_50']:.3f}", flush=True)

    results["_meta"] = {"res": [int(w), int(h)], "split": ns.split,
                        "psnr": round(float(psnr), 3),
                        "n_views": len(views)}
    name = ("ablate_decode.json" if ns.res is None
            else f"ablate_decode_{w}x{h}.json")
    out = os.path.join(ns.run_dir, name)
    with open(out, "w") as f:
        json.dump(results, f, indent=2)
    print(f"# wrote {out}", flush=True)
    return results


if __name__ == "__main__":
    main(sys.argv[1:])
