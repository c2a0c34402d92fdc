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


def semantic_loss(probs_or_logits: jnp.ndarray, targets: jnp.ndarray,
                  sem_softmax: bool, temperature: float = 1.0,
                  conf: jnp.ndarray | None = None) -> jnp.ndarray:
    """Per-pixel semantic loss, mean-reduced (trainer.py:458-465).

    probs_or_logits [N, C]; targets [N] int; conf [N] optional weights.
    """
    if sem_softmax:
        logp = jnp.log(probs_or_logits + 1e-27) / temperature
    else:
        logp = jax.nn.log_softmax(probs_or_logits / temperature, axis=-1)
    nll = -jnp.take_along_axis(logp, targets[:, None], axis=1)[:, 0]
    if conf is not None:
        nll = nll * conf
    return jnp.mean(nll)
