"""Mean-shift clustering of instance embeddings.

Host-side equivalent of /root/reference/utils/clustering/mean_shift.py +
clustering_base.py + utils/embedding.py: per-GT-mask mean embeddings -> sklearn
MeanShift with estimated bandwidth, fitted at validation time; prediction maps
rendered embeddings to cluster ids. Runs on the host off the jit path (the reference
also runs it on CPU via sklearn)."""
from __future__ import annotations

from typing import Optional

import numpy as np


def mean_class_embedding(embeddings: np.ndarray, labels: np.ndarray) -> np.ndarray:
    """Class-wise mean embedding centres per batch sample
    (reference utils/embedding.py:3-25). embeddings [B, R, D], labels [B, R] ->
    [sum_b num_unique_labels_b, D]."""
    centers = []
    for x, l in zip(embeddings, labels):
        for lab in np.unique(l):
            centers.append(x[l == lab].mean(axis=0))
    if not centers:
        return np.zeros((0, embeddings.shape[-1]), embeddings.dtype)
    return np.stack(centers)


class MeanShift:
    """reference utils/clustering/mean_shift.py:12-35."""

    def __init__(self, num_workers: int = 1, **_):
        self.num_workers = num_workers
        self.ms = None

    def train_clustering(self, embeddings: np.ndarray, labels: np.ndarray):
        centers = mean_class_embedding(embeddings, labels)
        if centers.size == 0:
            return
        try:
            from sklearn.cluster import MeanShift as SkMeanShift, estimate_bandwidth
            bandwidth = estimate_bandwidth(centers, quantile=0.08)
            if not bandwidth or bandwidth <= 0:
                bandwidth = None
            self.ms = SkMeanShift(bandwidth=bandwidth, bin_seeding=False,
                                  n_jobs=self.num_workers).fit(centers)
        except ImportError:
            self.ms = _SimpleMeanShift().fit(centers)

    def predict_clusters(self, embeddings: np.ndarray) -> np.ndarray:
        """[..., D] -> [...] int cluster ids. Without a fitted model, falls back to
        argmax of normalised embeddings (mean_shift.py:26-29)."""
        shape = embeddings.shape[:-1]
        flat = embeddings.reshape(-1, embeddings.shape[-1])
        if self.ms is None:
            n = flat / (np.linalg.norm(flat, axis=-1, keepdims=True) + 1e-12)
            return np.argmax(n, axis=-1).reshape(shape)
        return self.ms.predict(flat).astype(np.int64).reshape(shape)


class _SimpleMeanShift:
    """Dependency-free fallback: flat-kernel mean shift on the (few) centres."""

    def __init__(self, bandwidth: Optional[float] = None, iters: int = 30):
        self.bandwidth = bandwidth
        self.iters = iters
        self.cluster_centers_ = None

    def fit(self, x: np.ndarray) -> "_SimpleMeanShift":
        if self.bandwidth is None:
            d = np.linalg.norm(x[:, None] - x[None, :], axis=-1)
            vals = d[d > 0]
            self.bandwidth = float(np.quantile(vals, 0.3)) if vals.size else 1.0
        pts = x.copy()
        for _ in range(self.iters):
            d = np.linalg.norm(pts[:, None] - x[None, :], axis=-1)
            w = (d < self.bandwidth).astype(np.float64)
            pts = (w @ x) / np.maximum(w.sum(1, keepdims=True), 1)
        # merge modes
        centers = []
        for p in pts:
            if not any(np.linalg.norm(p - c) < self.bandwidth / 2 for c in centers):
                centers.append(p)
        self.cluster_centers_ = np.stack(centers)
        return self

    def predict(self, x: np.ndarray) -> np.ndarray:
        d = np.linalg.norm(x[:, None] - self.cluster_centers_[None], axis=-1)
        return np.argmin(d, axis=-1)
