"""Coarse-to-fine LoD annealing.

TPU-native equivalent of /root/reference/utils/lod_anneling.py: a tanh window over
per-LoD feature weights, stepped once per training iteration; the NeF multiplies grid
features by these weights (consumed at panoptic_nef.py:300). Here it is a pure
function of the global step — the trainer feeds the resulting [num_lods*feature_dim]
array into the jitted train step as data, so annealing never retraces.
"""
from __future__ import annotations

import numpy as np


def lod_weights(step: int, num_lods: int, feature_dim: int, epochs: int,
                steps_per_epoch: int, base_lod: int = 0, max_lod: int = -1,
                spread: float = 1.0) -> np.ndarray:
    """Per-feature LoD weights at ``step`` (reference LODAnneling.step,
    lod_anneling.py:27-39)."""
    max_lod = list(range(num_lods))[max_lod]
    num_levels = max_lod - base_lod
    total_steps = max(epochs * steps_per_epoch, 1)
    decay_pt = num_levels * step / total_steps
    x = np.arange(num_levels + 1, dtype=np.float64)
    window = 0.5 * (1.0 - np.tanh(4.0 * (x * spread - 0.5 - decay_pt)))
    w = np.ones(num_lods, dtype=np.float32)
    w[base_lod:] = window.astype(np.float32)
    return np.repeat(w, feature_dim)


def constant_lod_weights(num_lods: int, feature_dim: int) -> np.ndarray:
    """All-ones weights when annealing is disabled (best.yaml lod_anneling: false)."""
    return np.ones(num_lods * feature_dim, dtype=np.float32)
