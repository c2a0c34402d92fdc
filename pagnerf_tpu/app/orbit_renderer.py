"""Offline orbit renderer — the headless stand-in for the interactive viewer.

The reference ships an OpenGL interactive viewer (``SemanticApp``,
/root/reference/app/app.py: channel colourisers for semantics/clusters, camera
cycling, background training). A TPU pod has no GL stack; the TPU-native equivalent
renders the same channel visualisations offline: an orbit (or the dataset's own
cameras) is rendered per channel (rgb / depth / semantics / instances / embedding
distance) into PNG frames and an mp4, using the identical colourisers.

The click-to-embedding-distance visualisation (app.py:111-129) is exposed as
``embedding_distance_image``: given a query pixel, renders per-pixel cosine distance
to that pixel's instance embedding.
"""
from __future__ import annotations

import os
from typing import Dict, List, Optional

import jax.numpy as jnp
import numpy as np

from ..core.rays import Rays
from ..utils.visualization import (depth2rgb, label2rgb, label_colormap,
                                   write_png, write_video)


def _rays_for_view(trainer, idx: int):
    ds = trainer.dataset
    from ..models.pipeline import BAPipeline
    is_ba = isinstance(trainer.pipeline, BAPipeline)
    if is_ba:
        o = ds.data["base_rays_origins"].reshape(-1, 3)
        d = ds.data["base_rays_dirs"].reshape(-1, 3)
    else:
        o = ds.data["rays_origins"][idx].reshape(-1, 3)
        d = ds.data["rays_dirs"][idx].reshape(-1, 3)
    rays = Rays(origins=jnp.asarray(o), dirs=jnp.asarray(d),
                dist_min=jnp.float32(0.0), dist_max=jnp.float32(6.0))
    return rays, (int(idx) if is_ba else None)


def render_channels_for_view(trainer, idx: int,
                             channels=("rgb", "depth", "semantics",
                                       "inst_embedding")) -> Dict[str, np.ndarray]:
    """Render one dataset view and colourise every channel (SemanticApp channel
    colourisers, app.py:79-136)."""
    h, w = trainer.dataset.img_shape
    rays, cam_idx = _rays_for_view(trainer, idx)
    supported = trainer.pipeline.nef.supported_channels()
    chans = {c for c in channels if c in supported or c in ("depth",)}
    rb = trainer.batch_render(rays, chans, cam_idx=cam_idx)
    return _colourise(trainer, rb, h, w)


def pose_from_orbit(azimuth_deg: float, elevation_deg: float, radius: float,
                    target=(0.0, 0.0, 0.0)) -> np.ndarray:
    """Camera-to-world look-at pose on an orbit around ``target`` (GL convention,
    camera looks down -z) — the pose synthesis behind the viewer's free camera
    (reference wisp interactive camera, app/app.py:276-309)."""
    az = np.deg2rad(azimuth_deg)
    el = np.deg2rad(np.clip(elevation_deg, -89.0, 89.0))
    target = np.asarray(target, np.float64)
    eye = target + radius * np.array([np.cos(el) * np.cos(az), np.sin(el),
                                      np.cos(el) * np.sin(az)])
    fwd = target - eye
    fwd = fwd / np.linalg.norm(fwd)
    up = np.array([0.0, 1.0, 0.0])
    right = np.cross(fwd, up)
    right /= max(np.linalg.norm(right), 1e-9)
    up = np.cross(right, fwd)
    c2w = np.eye(4)
    c2w[:3, 0], c2w[:3, 1], c2w[:3, 2] = right, up, -fwd
    c2w[:3, 3] = eye
    return c2w


def render_channels_for_pose(trainer, c2w: np.ndarray,
                             channels=("rgb", "depth", "semantics",
                                       "inst_embedding")) -> Dict[str, np.ndarray]:
    """Render an ARBITRARY camera pose (free-viewpoint camera): the dataset's
    camera-space base rays are rotated/translated by ``c2w`` into world space and
    rendered without any per-frame learned extrinsics."""
    ds = trainer.dataset
    h, w = ds.img_shape
    base = ds.data["base_rays_dirs"].reshape(-1, 3)
    d = (base @ np.asarray(c2w)[:3, :3].T).astype(np.float32)
    o = np.broadcast_to(np.asarray(c2w)[:3, 3], d.shape).astype(np.float32)
    rays = Rays(origins=jnp.asarray(o), dirs=jnp.asarray(d),
                dist_min=jnp.float32(0.0), dist_max=jnp.float32(6.0))
    supported = trainer.pipeline.nef.supported_channels()
    chans = {c for c in channels if c in supported or c in ("depth",)}
    rb = trainer.batch_render(rays, chans, cam_idx=None)
    return _colourise(trainer, rb, h, w)


def _colourise(trainer, rb, h: int, w: int) -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}
    if rb.rgb is not None:
        out["rgb"] = (np.clip(np.asarray(rb.rgb).reshape(h, w, 3), 0, 1)
                      * 255).astype(np.uint8)
    if rb.depth is not None:
        out["depth"] = depth2rgb(np.asarray(rb.depth).reshape(h, w))
    if rb.semantics is not None:
        sem = np.argmax(np.asarray(rb.semantics), -1).reshape(h, w)
        ncls = trainer.dataset.semantic_info["num_classes"]
        out["semantics"] = label2rgb(sem, colormap=label_colormap(max(ncls, 2)))
    if rb.inst_embedding is not None:
        inst = np.argmax(np.asarray(rb.inst_embedding), -1).reshape(h, w)
        out["instance"] = label2rgb(inst,
                                    colormap=label_colormap(int(inst.max()) + 2))
        out["_inst_embedding"] = np.asarray(rb.inst_embedding).reshape(h, w, -1)
    return out


def embedding_distance_image(emb: np.ndarray, query_yx) -> np.ndarray:
    """Per-pixel cosine distance to the embedding at ``query_yx``
    (click-to-distance view, app.py:111-129)."""
    e = emb / (np.linalg.norm(emb, axis=-1, keepdims=True) + 1e-12)
    q = e[query_yx[0], query_yx[1]]
    dist = 1.0 - e @ q
    return depth2rgb(dist, 0.0, 2.0)


def render_orbit(trainer, out_dir: str, views: Optional[List[int]] = None,
                 fps: int = 15) -> Dict[str, List[np.ndarray]]:
    """Render all (or selected) dataset views per channel to PNGs + mp4s."""
    ds = trainer.dataset
    if views is None:
        views = sorted(set(ds.train_idxs) | set(ds.val_idxs))
    frames: Dict[str, List[np.ndarray]] = {}
    os.makedirs(out_dir, exist_ok=True)
    for idx in views:
        out = render_channels_for_view(trainer, idx)
        for name, img in out.items():
            if name.startswith("_"):
                continue
            frames.setdefault(name, []).append(img)
            write_png(os.path.join(out_dir, f"{name}_{idx:04d}.png"), img)
    for name, fl in frames.items():
        write_video(os.path.join(out_dir, f"{name}.mp4"), fl, fps=fps)
    return frames
