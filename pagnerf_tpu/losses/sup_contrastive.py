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
        # numerical stability: subtract row max over valid contrast elements.
        # An all-masked image would give row_max = finfo.min -> logits ~ +3e38
        # -> exp = inf -> inf * 0 = NaN poisoning the whole batch; clamp the
        # max to a finite value so that image computes (gated-to-zero) finite
        # garbage instead — NaN would leak through jnp.where in the BACKWARD.
        neg_inf = jnp.finfo(x.dtype).min
        sim_valid = jnp.where(amf[None, :] > 0, sim, neg_inf)
        row_max = jnp.max(sim_valid, axis=1, keepdims=True)
        row_max = jnp.where(row_max <= neg_inf / 2, 0.0, row_max)
        logits = sim - jax.lax.stop_gradient(row_max)
        same = (l[:, None] == l[None, :]).astype(x.dtype)
        eye = jnp.eye(l.shape[0], dtype=x.dtype)
        logits_mask = (1.0 - eye) * amf[None, :]                  # drop self + masked
        pos_mask = same * logits_mask
        exp_logits = jnp.exp(logits) * logits_mask
        log_prob = pos_w * logits - neg_w * jnp.log(exp_logits.sum(1, keepdims=True) + 1e-16)
        mean_log_prob_pos = (pos_mask * log_prob).sum(1) / (pos_mask.sum(1) + 1e-16)
        loss = -(temperature / base_temperature) * mean_log_prob_pos
        # reference per-image gates (sup_contrastive.py:129-136): an image with
        # no anchors or < 2 unique masked-in labels contributes exactly 0
        diff_pair = (l[:, None] != l[None, :]) & (am[:, None] & am[None, :])
        img_ok = jnp.any(diff_pair).astype(x.dtype)
        # only valid anchors with >= 1 positive contribute to the sum
        w = amf * (pos_mask.sum(1) > 0) * img_ok
        return jnp.sum(loss * w), jnp.sum(amf)

    sums, counts = jax.vmap(per_image)(feats, labels, anchor_mask)
    # reference 'mean' reduction normalises by the TOTAL anchor count
    # (sup_contrastive.py:149-152), not by the positive-bearing subset
    return jnp.sum(sums) / jnp.maximum(jnp.sum(counts), 1.0)
