"""ctypes bindings for the native host data-path library (native/batcher.cpp).

Provides fast ray-index sampling and batched pixel gathers for the input pipeline
(the host-side equivalent of the reference's DataLoader workers,
pc_nerf/trainer.py:215-227). Falls back to numpy transparently when the shared
library hasn't been built (``make -C native``)."""
from __future__ import annotations

import ctypes
import os
from typing import Optional, Tuple

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    path = os.path.join(os.path.dirname(__file__), "..", "..", "native",
                        "libpagnerf_native.so")
    try:
        if not os.path.exists(path):
            # try building it once
            import subprocess
            subprocess.run(["make", "-C", os.path.dirname(path)], check=True,
                           capture_output=True, timeout=120)
        lib = ctypes.CDLL(path)
        lib.sample_ray_indices.argtypes = [ctypes.c_int64] * 3 + [
            ctypes.c_uint64,
            np.ctypeslib.ndpointer(np.int64), np.ctypeslib.ndpointer(np.int64)]
        for name, dt in (("gather_pixels_f32", np.float32),
                         ("gather_pixels_i32", np.int32)):
            fn = getattr(lib, name)
            fn.argtypes = [np.ctypeslib.ndpointer(dt),
                           np.ctypeslib.ndpointer(np.int64),
                           np.ctypeslib.ndpointer(np.int64),
                           np.ctypeslib.ndpointer(dt)] + [ctypes.c_int64] * 4
        lib.rle_decode.argtypes = [np.ctypeslib.ndpointer(np.int64),
                                   ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
                                   np.ctypeslib.ndpointer(np.uint8)]
        _LIB = lib
    except Exception:
        _LIB = None
    return _LIB


def available() -> bool:
    return _load() is not None


def sample_ray_indices(batch: int, num_rays: int, num_pixels: int,
                       seed: int) -> np.ndarray:
    """[batch, num_rays] pixel indices per image — distinct while the pool
    allows; WITH replacement when num_rays exceeds the pool (shapes must stay
    static for jit; the reference's randperm[:num_rays] would go ragged).
    The replacement path also sidesteps the native sampler, whose Fisher-Yates
    mod (batcher.cpp:38) divides by zero — a process-killing SIGFPE — when the
    pool is exhausted."""
    if num_rays > num_pixels:
        rng = np.random.default_rng(seed)
        return rng.integers(0, num_pixels,
                            (batch, num_rays)).astype(np.int64)
    lib = _load()
    if lib is None:
        rng = np.random.default_rng(seed)
        return np.stack([rng.choice(num_pixels, num_rays, replace=False)
                         for _ in range(batch)]).astype(np.int64)
    pool = np.empty(num_pixels, np.int64)
    out = np.empty((batch, num_rays), np.int64)
    lib.sample_ray_indices(batch, num_rays, num_pixels, seed & (2**64 - 1),
                           pool, out)
    return out


def gather_pixels(src: np.ndarray, img_idx: np.ndarray,
                  ray_idx: np.ndarray) -> np.ndarray:
    """src [N_img, P, C] (or [N_img, P]) -> [B, R, C] gathered pixels."""
    lib = _load()
    squeeze = src.ndim == 2
    s = src[..., None] if squeeze else src
    if lib is None or s.dtype not in (np.float32, np.int32) or not s.flags.c_contiguous:
        out = s[img_idx[:, None], ray_idx]
    else:
        b, r = ray_idx.shape
        out = np.empty((b, r, s.shape[-1]), s.dtype)
        fn = lib.gather_pixels_f32 if s.dtype == np.float32 else lib.gather_pixels_i32
        fn(s, img_idx.astype(np.int64), ray_idx.astype(np.int64), out,
           b, r, s.shape[1], s.shape[2])
    return out[..., 0] if squeeze else out


def rle_decode(runs, h: int, w: int) -> np.ndarray:
    lib = _load()
    runs = np.asarray(runs, np.int64)
    if lib is None:
        from .formats.coco import _runs_to_mask
        return _runs_to_mask(list(runs), h, w)
    mask = np.zeros((h, w), np.uint8)
    lib.rle_decode(runs, runs.shape[0], h, w, mask)
    return mask
