"""Multiview dataset wrapper: per-image flattened modes + random ray sampling.

TPU-native equivalent of /root/reference/datasets/multiview_dataset.py (flattens
images to per-image pixel arrays, lines 125-132; dispatches to format loaders) and
datasets/transforms/ray_sampler.py (``SampleRays``). Host-side, numpy-first: batches
are assembled on the host and shipped to device once per step, ready to be sharded
along the ray axis.
"""
from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np

# Pixel modes that get flattened and ray-sampled (multiview_dataset.py:125-132).
PIXEL_MODES = ("imgs", "semantics", "instance", "semantics_pred", "instance_pred",
               "sem_conf", "inst_conf", "depths", "rays_origins", "rays_dirs")


def _resize_stack(arr: np.ndarray, h: int, w: int, nearest: bool) -> np.ndarray:
    """Resize [N, H, W, ...] per image (cv2; AREA for downsampling images, NEAREST
    for label maps — the reference reloads per-mip with PIL resize,
    multiview_dataset.py:142-170)."""
    import cv2
    interp = cv2.INTER_NEAREST if nearest else cv2.INTER_AREA
    dtype = arr.dtype
    out = np.stack([
        cv2.resize(a if nearest else a.astype(np.float32), (w, h),
                   interpolation=interp)
        for a in arr])
    return out.astype(dtype)


def _regenerate_rays(intrinsics, view_matrices: np.ndarray, s: int):
    """Base + world rays at mip scale ``s`` through exact mip pixel centres."""
    import jax.numpy as jnp

    from ..core.camera import (extrinsics_params_from_view_matrix,
                               generate_pinhole_rays, inv_transform_rays)
    intr = intrinsics.rescaled(1.0 / s, intrinsics.width // s,
                               intrinsics.height // s)
    base = generate_pinhole_rays(intr, dist_min=0.0, dist_max=2.0)
    h, w = intr.height, intr.width
    n = view_matrices.shape[0]
    params = extrinsics_params_from_view_matrix(jnp.asarray(view_matrices))
    bo = jnp.broadcast_to(jnp.asarray(base.origins).reshape(1, -1, 3), (n, h * w, 3))
    bd = jnp.broadcast_to(jnp.asarray(base.dirs).reshape(1, -1, 3), (n, h * w, 3))
    wo, wd = inv_transform_rays(params, bo, bd)
    wd = wd / (jnp.linalg.norm(wd, axis=-1, keepdims=True) + 1e-12)
    return (np.asarray(base.origins).reshape(h, w, 3),
            np.asarray(base.dirs).reshape(h, w, 3),
            np.asarray(wo).reshape(n, h, w, 3),
            np.asarray(wd).reshape(n, h, w, 3))


class MultiviewDataset:
    """Wraps a loaded data dict (see data/synthetic.py and data/formats/*) and serves
    ray batches.

    train/val split: interleaved frames (even=train, odd=val), matching the reference
    sequence split (agrobot_base.py:110-116), unless the dict provides explicit
    ``train_idxs`` / ``val_idxs``.
    """

    def __init__(self, data: Dict, split_interleave: bool = True):
        self.data = data
        n = data["imgs"].shape[0]
        if "train_idxs" in data:
            self.train_idxs = np.asarray(data["train_idxs"])
            self.val_idxs = np.asarray(data["val_idxs"])
        elif split_interleave and n >= 2:
            self.train_idxs = np.arange(0, n, 2)
            self.val_idxs = np.arange(1, n, 2)
        else:
            self.train_idxs = np.arange(n)
            self.val_idxs = np.arange(n)
        h, w = data["imgs"].shape[1:3]
        self.img_shape = (h, w)
        self.num_pixels = h * w
        # Robot-mask-aware ray sampling: rays are only drawn from non-robot pixels
        # (reference attaches a per-sequence robot mask to every frame,
        # agrobot_base.py:120-155; True/1 = robot pixel to exclude).
        self._valid_pixels = None
        if "robot_mask" in data:
            rm = np.asarray(data["robot_mask"]).reshape(-1)
            valid = np.nonzero(rm == 0)[0]
            if 0 < len(valid) < self.num_pixels:
                self._valid_pixels = valid

    @property
    def semantic_info(self) -> Dict:
        return self.data["semantic_info"]

    @property
    def num_train(self) -> int:
        return len(self.train_idxs)

    def steps_per_epoch(self, batch_size: int) -> int:
        return max(1, int(np.ceil(self.num_train / batch_size)))

    def sample_batch(self, rng: np.random.Generator, batch_size: int,
                     num_rays: int, split: str = "train",
                     modes: Optional[List[str]] = None) -> Dict[str, np.ndarray]:
        """Random images x random rays per image (SampleRays single-image mode,
        ray_sampler.py:20-25). Returns numpy batch with 'cam_idx' of absolute frame
        indices (for extrinsics lookup)."""
        from . import native
        idxs = self.train_idxs if split == "train" else self.val_idxs
        img_idx = rng.choice(idxs, size=min(batch_size, len(idxs)), replace=False)
        # native (C++) distinct-pixel sampling + batched gathers when built;
        # with a robot mask, sample positions within the valid-pixel list and
        # remap, so robot pixels never enter a training batch
        pool = self.num_pixels if self._valid_pixels is None else len(self._valid_pixels)
        ray_idx = native.sample_ray_indices(len(img_idx), num_rays,
                                            pool, int(rng.integers(2 ** 62)))
        if self._valid_pixels is not None:
            ray_idx = self._valid_pixels[ray_idx]
        batch = {"cam_idx": img_idx.astype(np.int32)}
        for mode in PIXEL_MODES:
            if mode in self.data:
                arr = self.data[mode]
                flat = arr.reshape(arr.shape[0], self.num_pixels, *arr.shape[3:])
                batch[mode] = native.gather_pixels(flat, img_idx.astype(np.int64),
                                                   ray_idx)
        # camera-space base rays, identical for every image (bup20.py:251-287)
        bo = self.data["base_rays_origins"].reshape(self.num_pixels, 3)
        bd = self.data["base_rays_dirs"].reshape(self.num_pixels, 3)
        batch["base_rays_origins"] = bo[ray_idx]
        batch["base_rays_dirs"] = bd[ray_idx]
        return batch

    # label-valued modes get nearest-neighbour resizing; everything else area/linear
    _NEAREST_MODES = ("semantics", "instance", "semantics_pred", "instance_pred")

    def get_images(self, split: str = "val", mip: int = 0) -> Dict[str, np.ndarray]:
        """Full images for validation rendering (multiview_dataset.py:142-170).

        ``mip`` downsamples by 2^mip with REAL resizing (area filter for images,
        nearest for label maps), matching the reference's resize-based mip pyramid
        (multiview_dataset.py:142-170) — stride subsampling aliases and biases
        PSNR/IoU at val_mip >= 1. Rays are regenerated at the mip resolution from
        the stored intrinsics/view matrices when available (exact pixel centres),
        else strided.
        """
        idxs = self.val_idxs if split == "val" else self.train_idxs
        s = 1 << mip
        out = {"cam_idx": idxs.astype(np.int32)}
        h, w = self.img_shape
        hm, wm = h // s, w // s
        for mode in PIXEL_MODES:
            if mode in self.data and not mode.startswith("rays_"):
                arr = self.data[mode][idxs]
                out[mode] = (arr if s == 1 else
                             _resize_stack(arr, hm, wm,
                                           nearest=mode in self._NEAREST_MODES))
        if s == 1:
            for mode in ("rays_origins", "rays_dirs"):
                if mode in self.data:
                    out[mode] = self.data[mode][idxs]
            out["base_rays_origins"] = self.data["base_rays_origins"]
            out["base_rays_dirs"] = self.data["base_rays_dirs"]
        elif "intrinsics" in self.data and "view_matrices" in self.data:
            bo, bd, wo, wd = _regenerate_rays(self.data["intrinsics"],
                                              self.data["view_matrices"][idxs], s)
            out["base_rays_origins"], out["base_rays_dirs"] = bo, bd
            if "rays_origins" in self.data:
                out["rays_origins"], out["rays_dirs"] = wo, wd
        else:
            for mode in ("rays_origins", "rays_dirs"):
                if mode in self.data:
                    out[mode] = self.data[mode][idxs][:, ::s, ::s]
            out["base_rays_origins"] = self.data["base_rays_origins"][::s, ::s]
            out["base_rays_dirs"] = self.data["base_rays_dirs"][::s, ::s]
        return out
