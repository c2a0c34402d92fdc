"""Validation-time instance-map post-processing.

Host-side equivalents of the reference's prediction cleanup before PQ/mAP updates
(/root/reference/pc_nerf/trainer.py:750-772 and utils/outlier_rejection.py:117-152):
  * morphological opening of per-instance masks (kornia ``opening`` x
    inst_num_dilations)
  * centre-of-mass outlier rejection (pixels beyond mean + 2 std of the distance to
    the mask centroid are stripped)
  * small-mask removal (< 100 px) and background re-assignment
"""
from __future__ import annotations

from typing import Tuple

import numpy as np


def _binary_open(mask: np.ndarray, iterations: int = 1) -> np.ndarray:
    """3x3 opening (erosion then dilation) of masks [K, H, W]."""
    try:
        from scipy import ndimage
        out = np.zeros_like(mask)
        st = np.ones((3, 3), bool)
        for i in range(mask.shape[0]):
            m = mask[i].astype(bool)
            for _ in range(iterations):
                m = ndimage.binary_opening(m, structure=st)
            out[i] = m
        return out.astype(mask.dtype)
    except ImportError:  # minimal fallback
        return mask


def center_of_mass_outlier_rejection(masks: np.ndarray,
                                     std_threshold: float = 2.0) -> np.ndarray:
    """Strip mask pixels farther than mean + std_threshold * std from the mask's
    centre of mass (reference outlier_rejection.py:133-152). masks [K, H, W]."""
    masks = masks.copy()
    h, w = masks.shape[-2:]
    gy, gx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    for i in range(masks.shape[0]):
        m = masks[i].astype(bool)
        area = m.sum()
        if area == 0:
            continue
        cy, cx = gy[m].mean(), gx[m].mean()
        dist = np.sqrt((gy - cy) ** 2 + (gx - cx) ** 2)
        dvals = dist[m]
        mean_d, std_d = dvals.mean(), dvals.std()
        keep = dist <= mean_d + std_threshold * std_d
        masks[i] = (m & keep).astype(masks.dtype)
    return masks


def clean_instance_map(instances: np.ndarray, num_dilations: int = 1,
                       outlier_rejection: bool = True,
                       min_mask_px: int = 100) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Full cleanup pipeline on an instance id map [H, W]
    (reference trainer.py:750-772). Returns (cleaned id map, per-instance masks
    [K, H, W], mask ids [K])."""
    mask_ids = np.unique(instances)
    if mask_ids.shape[0] <= 1:
        return instances, np.zeros((0,) + instances.shape, instances.dtype), mask_ids
    fg_ids = mask_ids[1:]
    masks = (instances[None] == fg_ids[:, None, None]).astype(instances.dtype)
    if num_dilations > 0:
        masks = _binary_open(masks, num_dilations)
    if outlier_rejection:
        masks = center_of_mass_outlier_rejection(masks)
    small = masks.sum(axis=(1, 2)) < min_mask_px
    masks[small] = 0
    stacked = np.concatenate([(masks.sum(0) == 0)[None].astype(instances.dtype),
                              masks])
    cleaned = mask_ids[np.argmax(stacked, axis=0)]
    return cleaned, masks, fg_ids
