"""Visualisation utilities: label/instance/depth colourisation, PNG/mp4 writing.

Host-side equivalents of the imgviz/imageio stack the reference uses for validation
media (/root/reference/pc_nerf/trainer.py:45-48, 710-712, 855-896): ``label_colormap``
(the standard PASCAL-VOC bit-shuffle colormap imgviz implements), ``label2rgb``,
``depth2rgb``, video writing."""
from __future__ import annotations

import os
from typing import List, Optional, Sequence

import numpy as np


def label_colormap(n_labels: int = 256) -> np.ndarray:
    """PASCAL-VOC style colormap [n, 3] uint8 (imgviz.label_colormap equivalent)."""
    def bitget(v, i):
        return (v >> i) & 1

    cmap = np.zeros((max(n_labels, 1), 3), np.uint8)
    for i in range(cmap.shape[0]):
        r = g = b = 0
        c = i
        for j in range(8):
            r |= bitget(c, 0) << (7 - j)
            g |= bitget(c, 1) << (7 - j)
            b |= bitget(c, 2) << (7 - j)
            c >>= 3
        cmap[i] = (r, g, b)
    return cmap


def label2rgb(label: np.ndarray, colormap: Optional[np.ndarray] = None,
              image: Optional[np.ndarray] = None, alpha: float = 0.5) -> np.ndarray:
    """Label map [H, W] -> RGB uint8; optionally alpha-blended over an image."""
    label = np.asarray(label)
    if colormap is None:
        colormap = label_colormap(int(label.max()) + 1 if label.size else 1)
    lab = np.clip(label, 0, colormap.shape[0] - 1).astype(np.int64)
    rgb = colormap[lab]
    if image is not None:
        img = image.astype(np.float64)
        if img.max() <= 1.0:
            img = img * 255
        fg = label > 0
        out = img.copy()
        out[fg] = (1 - alpha) * img[fg] + alpha * rgb[fg]
        return out.astype(np.uint8)
    return rgb.astype(np.uint8)


def depth2rgb(depth: np.ndarray, min_value: Optional[float] = None,
              max_value: Optional[float] = None) -> np.ndarray:
    """Depth map -> perceptual RGB uint8 (imgviz.depth2rgb equivalent; viridis-ish)."""
    d = np.asarray(depth, np.float64)
    lo = np.nanmin(d) if min_value is None else min_value
    hi = np.nanmax(d) if max_value is None else max_value
    t = np.clip((d - lo) / max(hi - lo, 1e-9), 0, 1)
    # compact viridis approximation
    r = np.clip(1.38 * t - 0.23 * np.sin(6.8 * t) - 0.15, 0, 1)
    g = np.clip(0.96 * t + 0.07, 0, 1)
    b = np.clip(0.35 + 0.6 * np.cos(2.7 * t - 1.1), 0, 1)
    return (np.stack([r, g, b], -1) * 255).astype(np.uint8)


def write_png(path: str, img: np.ndarray):
    """uint8 (or [0,1] float) image -> PNG (wisp write_png equivalent)."""
    from PIL import Image
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    if img.dtype != np.uint8:
        img = (np.clip(img, 0, 1) * 255).astype(np.uint8)
    Image.fromarray(img).save(path)


def write_video(path: str, frames: Sequence[np.ndarray], fps: int = 15):
    """Frame list -> mp4 (reference saves per-channel validation videos,
    trainer.py:881-896). Falls back to a PNG strip if imageio/ffmpeg is missing."""
    if not len(frames):
        return
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    frames = [f if f.dtype == np.uint8 else (np.clip(f, 0, 1) * 255).astype(np.uint8)
              for f in frames]
    try:
        import imageio
        imageio.mimwrite(path, frames, fps=fps, quality=8)
    except Exception:
        base = os.path.splitext(path)[0]
        for i, f in enumerate(frames):
            write_png(f"{base}_{i:04d}.png", f)
