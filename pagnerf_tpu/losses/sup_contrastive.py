"""Supervised contrastive instance loss.

TPU-native equivalent of /root/reference/loss/sup_contrastive.py (SupCon, Khosla et
al. 2020, with the reference's positive/negative weighting via ``pn_ratio`` and
per-image anchor masking). The reference loops over images and dynamically selects
anchor pixels; here the anchor mask enters as multiplicative weights so shapes stay
static and the [R, R] similarity matrix is one MXU matmul per image.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def sup_contrastive_loss(features: jnp.ndarray, labels: jnp.ndarray,
                         anchor_mask: jnp.ndarray | None = None,
                         temperature: float = 0.07,
                         base_temperature: float = 0.07,
                         pn_ratio: float = 0.5) -> jnp.ndarray:
    """features [B, R, D], labels [B, R], anchor_mask [B, R] bool (pixels allowed as
    anchors/contrast elements; reference masks out undetected-things pixels,
    trainer.py:499-503). Returns scalar mean loss over valid anchors."""
    pos_w = min(1.0, pn_ratio * 2.0)
    neg_w = min(1.0, (1.0 - pn_ratio) * 2.0)
    if anchor_mask is None:
        anchor_mask = jnp.ones(labels.shape, bool)

    feats = features / (jnp.linalg.norm(features, axis=-1, keepdims=True) + 1e-12)

    def per_image(x, l, am):
        amf = am.astype(x.dtype)                                  # [R]
        sim = (x @ x.T) / temperature                             # [R, R] MXU
        # numerical stability: subtract row max over valid contrast elements
        neg_inf = jnp.finfo(x.dtype).min
        sim_valid = jnp.where(amf[None, :] > 0, sim, neg_inf)
        logits = sim - jax.lax.stop_gradient(jnp.max(sim_valid, axis=1, keepdims=True))
        same = (l[:, None] == l[None, :]).astype(x.dtype)
        eye = jnp.eye(l.shape[0], dtype=x.dtype)
        logits_mask = (1.0 - eye) * amf[None, :]                  # drop self + masked
        pos_mask = same * logits_mask
        exp_logits = jnp.exp(logits) * logits_mask
        log_prob = pos_w * logits - neg_w * jnp.log(exp_logits.sum(1, keepdims=True) + 1e-16)
        mean_log_prob_pos = (pos_mask * log_prob).sum(1) / (pos_mask.sum(1) + 1e-16)
        loss = -(temperature / base_temperature) * mean_log_prob_pos
        # only valid anchors with >= 1 positive contribute
        w = amf * (pos_mask.sum(1) > 0)
        return jnp.sum(loss * w), jnp.sum(w)

    sums, counts = jax.vmap(per_image)(feats, labels, anchor_mask)
    return jnp.sum(sums) / jnp.maximum(jnp.sum(counts), 1.0)
