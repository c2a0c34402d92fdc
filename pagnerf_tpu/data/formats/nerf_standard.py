"""Instant-NGP / NeRF-synthetic ``transforms.json`` dataset format.

TPU-native equivalent of /root/reference/datasets/formats/nerf_standard.py: loads
``transforms*.json`` (camera_angle_x / fl_x / cx / cy variants, lines 177-227),
blender->GL pose convention, optional alpha-to-background compositing
(lines 269-283), and produces the framework's standard data dict."""
from __future__ import annotations

import json
import os
from pathlib import Path
from typing import Dict

import numpy as np

from ...core.camera import PinholeIntrinsics, view_from_c2w


def _load_image(path: str, mip: int = 0) -> np.ndarray:
    from PIL import Image
    img = Image.open(path)
    if mip > 0:
        s = 1 << mip
        # real resize, not stride subsampling (aliasing biases PSNR) — the
        # reference also reloads per-mip with a proper resize
        img = img.resize((img.width // s, img.height // s), Image.LANCZOS)
    return np.asarray(img, np.float32) / 255.0


def load_nerf_standard(root: str, split: str = "train", mip: int = 0,
                       bg_color: str = "white", num_workers: int = 8) -> Dict:
    root = Path(root).expanduser()
    # When the dataset ships explicit train/val splits, load BOTH and expose
    # train_idxs/val_idxs: otherwise MultiviewDataset's even/odd interleave
    # would silently withhold half the train frames as val and never touch
    # the real val split.
    tf_split = root / f"transforms_{split}.json"
    tf_val = root / "transforms_val.json"
    if tf_split.exists() and split == "train" and tf_val.exists():
        tform_files = [(tf_split, "train"), (tf_val, "val")]
    elif tf_split.exists():
        tform_files = [(tf_split, split)]
    elif (root / "transforms.json").exists():
        tform_files = [(root / "transforms.json", split)]
    else:
        raise FileNotFoundError(f"no transforms json under {root}")

    # resolve frame paths first, then decode images in parallel (the reference
    # uses a multiprocessing pool, nerf_standard.py:142-162; threads suffice here
    # since PIL decode/resize release the GIL, and they avoid fork-vs-JAX hazards)
    paths, poses, tags, meta = [], [], [], None
    for tforms, tag in tform_files:
        with open(tforms) as f:
            m = json.load(f)
        if meta is None:
            meta = m            # intrinsics come from the primary split
        # instant-ngp pose normalisation (reference nerf_standard.py:229-236):
        # translations /= aabb_scale (default 1.25), *= scale, += offset
        offset = np.asarray(m.get("offset", [0.0, 0.0, 0.0]), np.float32)
        pscale = float(m.get("scale", 1.0))
        aabb_scale = float(m.get("aabb_scale", 1.25))
        for frame in m["frames"]:
            fp = root / frame["file_path"]
            if not fp.suffix:
                fp = fp.with_suffix(".png")
            if not fp.exists():
                continue
            pose = np.asarray(frame["transform_matrix"], np.float32)
            pose[:3, 3] = pose[:3, 3] / aabb_scale * pscale + offset
            paths.append(str(fp))
            poses.append(pose)
            tags.append(tag)
    if len(paths) > 1 and num_workers > 1:
        from concurrent.futures import ThreadPoolExecutor
        with ThreadPoolExecutor(min(num_workers, len(paths))) as pool:
            imgs = list(pool.map(lambda p: _load_image(p, mip), paths))
    else:
        imgs = [_load_image(p, mip) for p in paths]
    if not imgs:
        raise FileNotFoundError(f"no frames found under {root}")
    imgs = np.stack(imgs)
    poses = np.stack(poses)
    h, w = imgs.shape[1:3]

    # intrinsics (nerf_standard.py:177-227)
    if "fl_x" in meta:
        fx = meta["fl_x"] / (1 << mip)
        fy = meta.get("fl_y", meta["fl_x"]) / (1 << mip)
    else:
        cam_angle = float(meta["camera_angle_x"])
        fx = fy = 0.5 * w / np.tan(0.5 * cam_angle)
    cx = meta.get("cx", w * 0.5 * (1 << mip)) / (1 << mip)
    cy = meta.get("cy", h * 0.5 * (1 << mip)) / (1 << mip)
    intr = PinholeIntrinsics(fx=np.float32(fx), fy=np.float32(fy),
                             cx=np.float32(cx), cy=np.float32(cy),
                             width=w, height=h, near=0.0, far=6.0)

    # alpha compositing onto the background (nerf_standard.py:269-283)
    if imgs.shape[-1] == 4:
        alpha = imgs[..., 3:4]
        if bg_color == "black":
            rgb = np.clip(imgs[..., :3] * alpha, 0, 1)
        else:
            rgb = np.clip(imgs[..., :3] * alpha + (1 - alpha), 0, 1)
    else:
        rgb = imgs[..., :3]

    import jax.numpy as jnp
    from ...core.camera import (extrinsics_params_from_view_matrix,
                                generate_pinhole_rays, inv_transform_rays)
    views = view_from_c2w(poses.astype(np.float64)).astype(np.float32)
    base = generate_pinhole_rays(intr)
    params = extrinsics_params_from_view_matrix(jnp.asarray(views))
    n = views.shape[0]
    bo = jnp.broadcast_to(base.origins.reshape(1, -1, 3), (n, h * w, 3))
    bd = jnp.broadcast_to(base.dirs.reshape(1, -1, 3), (n, h * w, 3))
    wo, wd = inv_transform_rays(params, bo, bd)
    wd = wd / (jnp.linalg.norm(wd, axis=-1, keepdims=True) + 1e-12)

    out = {
        "imgs": rgb.astype(np.float32),
        "rays_origins": np.asarray(wo).reshape(n, h, w, 3),
        "rays_dirs": np.asarray(wd).reshape(n, h, w, 3),
        "base_rays_origins": np.asarray(base.origins),
        "base_rays_dirs": np.asarray(base.dirs),
        "view_matrices": views,
        "cameras_ts": np.arange(n),
        "intrinsics": intr,
        "semantic_info": {"num_classes": 2, "num_instances": 2,
                          "stuff_ids": [0], "things_ids": [1]},
    }
    tags_arr = np.asarray(tags)
    if (tags_arr == "val").any():
        out["train_idxs"] = np.nonzero(tags_arr == "train")[0]
        out["val_idxs"] = np.nonzero(tags_arr == "val")[0]
    return out
