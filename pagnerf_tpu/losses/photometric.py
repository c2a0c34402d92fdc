"""Photometric and semantic losses.

Loss terms from the reference training step (/root/reference/pc_nerf/trainer.py:441-474):
  * L1 RGB loss (trainer.py:443-444)
  * semantic NLL (sem_softmax path: log of already-softmaxed probs / temperature) or
    cross-entropy on logits, optionally confidence-weighted (trainer.py:458-465)
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def rgb_l1_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Mean absolute error over rays and channels (trainer.py:443-444)."""
    return jnp.mean(jnp.abs(pred[..., :3] - target[..., :3]))


def safe_prob_log(p: jnp.ndarray) -> jnp.ndarray:
    """log(p + 1e-27) with p clamped to >= 0 first.

    Rendered probability channels are mathematically non-negative, but the
    packed tracer composites them as prefix-sum DIFFERENCES (ops/packed.py
    segment_sum) — where the true sum is ~0, fp32 cancellation noise can
    leave a tiny NEGATIVE value, and log(negative) is NaN. One NaN loss
    poisons the panoptic params permanently (observed: flagship 120v run,
    sem_loss NaN from the first panoptic epoch at 4096 rays/img). The clamp
    has zero gradient on the noise region and is the identity wherever the
    dense path is exact.
    """
    return jnp.log(jnp.maximum(p, 0.0) + 1e-27)


def semantic_loss(probs_or_logits: jnp.ndarray, targets: jnp.ndarray,
                  sem_softmax: bool, temperature: float = 1.0,
                  conf: jnp.ndarray | None = None) -> jnp.ndarray:
    """Per-pixel semantic loss, mean-reduced (trainer.py:458-465).

    probs_or_logits [N, C]; targets [N] int; conf [N] optional weights.

    Invalid targets (< 0 or >= C, e.g. -1 "unlabeled" pixels) contribute zero loss
    — a raw take_along_axis would wrap -1 to the last class and silently train on
    garbage labels the day a config runs without dense predictions.
    """
    if sem_softmax:
        logp = safe_prob_log(probs_or_logits) / temperature
    else:
        logp = jax.nn.log_softmax(probs_or_logits / temperature, axis=-1)
    num_classes = probs_or_logits.shape[-1]
    valid = (targets >= 0) & (targets < num_classes)
    safe_targets = jnp.where(valid, targets, 0)
    nll = -jnp.take_along_axis(logp, safe_targets[:, None], axis=1)[:, 0]
    nll = jnp.where(valid, nll, 0.0)
    if conf is not None:
        nll = nll * conf
    denom = jnp.maximum(jnp.sum(valid), 1)
    return jnp.sum(nll) / denom
