"""Regularizers.

TPU-native equivalents of /root/reference/loss/regularizers.py:
  * ``segment_consistency_regularizer`` (lines 5-35) — per-GT-segment majority-label
    NLL. The reference loops over unique segments (dynamic); here segments are
    identified by a static label-capacity one-hot matrix, so the per-segment
    statistics become two matmuls on the MXU.
  * ``sigma_sparsity_loss`` (lines 37-39) — Cauchy sparsity on densities.
  * ``grid_tv_l1_loss`` / ``grid_tv_l2_loss`` (lines 41-70) — total variation on a
    random sub-window of the feature grid.
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from .photometric import safe_prob_log


def segment_consistency_regularizer(probs: jnp.ndarray, labels: jnp.ndarray,
                                    num_segments: int) -> jnp.ndarray:
    """probs [B, R, C] (already softmaxed), labels [B, R] int segment ids in
    [0, num_segments). Returns scalar loss.

    For each GT segment: find its most-voted predicted id (excluding id 0); if
    background votes are > 2x the winner's votes, the target becomes 0; NLL of every
    segment pixel toward that target, averaged per segment, per image, per batch
    (reference loss/regularizers.py:5-35).
    """
    b, r, c = probs.shape

    def per_image(p, l):
        seg = jax.nn.one_hot(l, num_segments, dtype=p.dtype)       # [R, K]
        seg_counts = seg.sum(0)                                     # [K]
        present = seg_counts > 0
        pred = jnp.argmax(p, axis=-1)                               # [R]
        pred_oh = jax.nn.one_hot(pred, c, dtype=p.dtype)            # [R, C]
        bins = seg.T @ pred_oh                                      # [K, C] votes
        best = jnp.argmax(bins[:, 1:], axis=-1) + 1                 # [K]
        best_votes = jnp.take_along_axis(bins, best[:, None], axis=1)[:, 0]
        # background override (regularizers.py:29-31)
        best = jnp.where(bins[:, 0] * 0.5 > best_votes, 0, best)
        # per-segment mean NLL toward its majority label
        logp = safe_prob_log(p)                                     # [R, C]
        tgt_logp = seg.T @ logp                                     # [K, C] summed
        nll = -jnp.take_along_axis(tgt_logp, best[:, None], axis=1)[:, 0]
        nll = nll / jnp.maximum(seg_counts, 1.0)
        n_present = jnp.maximum(present.sum(), 1)
        return jnp.sum(jnp.where(present, nll, 0.0)) / n_present

    return jnp.mean(jax.vmap(per_image)(probs, labels))


def sigma_sparsity_loss(sigmas: jnp.ndarray) -> jnp.ndarray:
    """Cauchy sparsity on sigma values (regularizers.py:37-39)."""
    return jnp.log(1.0 + 2.0 * sigmas ** 2)


def _tv(values: jnp.ndarray, fn: Callable[[jnp.ndarray], jnp.ndarray]) -> jnp.ndarray:
    """TV over the first 3 (spatial) axes of values [S, S, S, C]
    (regularizers.py:41-49)."""
    loss = 0.0
    size = values.shape[0]
    for d in range(3):
        v = jnp.moveaxis(values, d, 0)
        loss = loss + fn(v[1:] - v[:-1]) / size
    return loss


def grid_tv_loss(encoder: Callable[[jnp.ndarray], jnp.ndarray], key: jax.Array,
                 fn: Callable[[jnp.ndarray], jnp.ndarray],
                 sample_size: float = 0.2, num_dim_samples: int = 50) -> jnp.ndarray:
    """TV of grid features over a random axis-aligned window (regularizers.py:58-70).
    ``encoder`` maps [N, 3] -> [N, C]."""
    min_vertex = jax.random.normal(key, (3,)) * 2.0 * (1.0 - sample_size) - 1.0
    steps = jnp.arange(num_dim_samples + 1, dtype=jnp.float32)
    edge = min_vertex[None, :] + steps[:, None] * (sample_size / num_dim_samples)
    grid = jnp.stack(jnp.meshgrid(edge[:, 0], edge[:, 1], edge[:, 2],
                                  indexing="ij"), axis=-1)          # [S, S, S, 3]
    s = num_dim_samples + 1
    values = encoder(grid.reshape(-1, 3)).reshape(s, s, s, -1)
    return _tv(values, fn)


def grid_tv_l1_loss(encoder, key, **kw) -> jnp.ndarray:
    return grid_tv_loss(encoder, key, lambda x: jnp.abs(x).sum(), **kw)


def grid_tv_l2_loss(encoder, key, **kw) -> jnp.ndarray:
    return grid_tv_loss(encoder, key, lambda x: (x ** 2).sum(), **kw)
