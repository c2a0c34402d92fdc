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

    @property
    def semantic_info(self) -> Dict:
        return self.data["semantic_info"]

    @property
    def num_train(self) -> int:
        return len(self.train_idxs)

    def steps_per_epoch(self, batch_size: int) -> int:
        return max(1, int(np.ceil(self.num_train / batch_size)))

    def _flat(self, mode: str, img_idx: np.ndarray) -> np.ndarray:
        arr = self.data[mode][img_idx]
        return arr.reshape(arr.shape[0], self.num_pixels, *arr.shape[3:])

    def sample_batch(self, rng: np.random.Generator, batch_size: int,
                     num_rays: int, split: str = "train",
                     modes: Optional[List[str]] = None) -> Dict[str, np.ndarray]:
        """Random images x random rays per image (SampleRays single-image mode,
        ray_sampler.py:20-25). Returns numpy batch with 'cam_idx' of absolute frame
        indices (for extrinsics lookup)."""
        from . import native
        idxs = self.train_idxs if split == "train" else self.val_idxs
        img_idx = rng.choice(idxs, size=min(batch_size, len(idxs)), replace=False)
        # native (C++) distinct-pixel sampling + batched gathers when built
        ray_idx = native.sample_ray_indices(len(img_idx), num_rays,
                                            self.num_pixels,
                                            int(rng.integers(2 ** 62)))
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

    def get_images(self, split: str = "val", mip: int = 0) -> Dict[str, np.ndarray]:
        """Full images for validation rendering (multiview_dataset.py:142-170).
        ``mip`` downsamples by 2^mip with striding (cheap equivalent of the
        reference's resize-based mip pyramid)."""
        idxs = self.val_idxs if split == "val" else self.train_idxs
        s = 1 << mip
        out = {"cam_idx": idxs.astype(np.int32)}
        for mode in PIXEL_MODES:
            if mode in self.data:
                out[mode] = self.data[mode][idxs][:, ::s, ::s]
        out["base_rays_origins"] = self.data["base_rays_origins"][::s, ::s]
        out["base_rays_dirs"] = self.data["base_rays_dirs"][::s, ::s]
        return out
