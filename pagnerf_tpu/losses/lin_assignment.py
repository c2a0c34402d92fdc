"""Linear-assignment instance losses.

TPU-native equivalents of /root/reference/loss/lin_assignment.py and
loss/lin_assignment_things.py: render per-pixel instance-slot probabilities, build a
(label x slot) cost matrix from mean per-slot probability under each GT label,
Hungarian-match labels to slots (host callback — the reference already runs scipy's
``linear_sum_assignment`` on CPU inside ``no_grad``), produce "virtual" GT labels and
take an NLL toward them. The "things" variant reserves slot 0 for stuff and supports
repeated-ID rejection via per-instance 3-D centres (utils/outlier_rejection.py in the
reference; here losses/outlier cost fused into the cost matrix on device).

TPU design: label statistics are one-hot matmuls (MXU); the Hungarian solve runs
ON DEVICE (ops/assignment.py — the axon runtime has no host callbacks). Cost rows
for labels absent from the batch are masked via ``present``, so all device shapes
stay static.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.assignment import lap_assign
from .photometric import safe_prob_log


def hungarian_host(cost: np.ndarray, present: np.ndarray) -> np.ndarray:
    """Host-side (scipy) Hungarian over present rows only — the golden reference for
    the device solver; NOT used in the jitted path (the axon TPU runtime has
    no host callbacks). Returns col assignment per row (absent rows -> 0)."""
    from scipy.optimize import linear_sum_assignment
    out = np.zeros(cost.shape[0], np.int32)
    rows = np.nonzero(present)[0]
    m = cost.shape[1]
    if rows.size == 0:
        return out
    rows = rows[:m]  # at most M labels can be matched (reference truncates labels[:M])
    r_idx, c_idx = linear_sum_assignment(np.nan_to_num(cost[rows]))
    out[rows[r_idx]] = c_idx.astype(np.int32)
    return out


def hungarian_assign(cost: jnp.ndarray, present: jnp.ndarray) -> jnp.ndarray:
    """Jittable device-side assignment (Jonker-Volgenant shortest augmenting
    paths, ops/assignment.py) standing in for the reference's host scipy
    Hungarian (lin_assignment_things.py:44) — the same algorithm scipy runs,
    so the matching cost is exact. Stays on-device: no host round-trip inside
    the train step.

    nan_to_num maps +/-inf to float32 max (~3.4e38), which would exceed the
    solver's 1e30 settled-column sentinel and corrupt its argmin — clip to
    +/-1e12 (far above the 1e4 rejection penalties, far below the sentinel)."""
    cost = jnp.clip(jnp.nan_to_num(cost.astype(jnp.float32)), -1e12, 1e12)
    return lap_assign(cost, present)


# ---------------------------------------------------------------------------
# repeated-ID rejection (reference utils/outlier_rejection.py:8-71)
# ---------------------------------------------------------------------------

def centers_from_points_with_labels(points: jnp.ndarray, labels: jnp.ndarray,
                                    weights: jnp.ndarray, num_labels: int) -> jnp.ndarray:
    """Mean 3-D position per label id (one-hot matmul version of
    centers_from_3d_points_with_ids, outlier_rejection.py:56-71).
    points [N, 3], labels [N], weights [N] validity -> centers [K, 3]."""
    oh = jax.nn.one_hot(labels, num_labels, dtype=points.dtype) * weights[:, None]
    counts = oh.sum(0)                                            # [K]
    sums = oh.T @ points                                          # [K, 3]
    return sums / jnp.maximum(counts[:, None], 1e-6)


def add_position_id_range_cost(cost: jnp.ndarray, centers_x: jnp.ndarray,
                               present: jnp.ndarray,
                               frame_min_length: float = 0.3,
                               max_num_inst_at_x: int = 30,
                               id_margin_at_frame_length: int = 30) -> jnp.ndarray:
    """Repeated-ID rejection: each instance's world-x position maps to a band of
    allowed slot ids; out-of-band (label, slot) pairs get a prohibitive cost
    (reference outlier_rejection.py:8-51). cost [K, M]; centers_x [K]."""
    m = cost.shape[1]
    slope = (max_num_inst_at_x + id_margin_at_frame_length) / frame_min_length
    x_limit = (m - id_margin_at_frame_length) / slope
    if x_limit <= 0:
        # fewer slots than the id margin: every slot is in-band anyway (the
        # reference degenerates to the same no-op for m < 30 and to a NaN mod
        # at exactly m == 30, outlier_rejection.py:26-28) — skip cleanly
        return cost
    x = (-centers_x + 1.0) / 2.0                                  # remap [1,-1]->[0,1]
    lo = jnp.clip(slope * jnp.mod(x, x_limit), 0, m - 1).astype(jnp.int32)
    hi = jnp.clip(lo + id_margin_at_frame_length, 0, m - 1)
    slots = jnp.arange(m)[None, :]
    allowed = (lo[:, None] <= slots) & (slots <= hi[:, None])
    penal = jnp.where(allowed | ~present[:, None], 0.0, 10000.0)
    return cost + penal


# ---------------------------------------------------------------------------
# losses
# ---------------------------------------------------------------------------

def _label_slot_cost(probs: jnp.ndarray, labels: jnp.ndarray, valid: jnp.ndarray,
                     num_labels: int):
    """cost[l, m] = -mean_{pixels with label l} probs[., m]
    (lin_assignment_things.py:30-33). Returns (cost [K, M], present [K])."""
    oh = jax.nn.one_hot(labels, num_labels, dtype=probs.dtype) * valid[:, None]
    counts = oh.sum(0)                                            # [K]
    cost = -(oh.T @ probs) / (counts[:, None] + 1e-4)             # [K, M]
    return cost, counts > 0


def lin_assignment_loss(probs: jnp.ndarray, labels: jnp.ndarray,
                        num_labels: int) -> jnp.ndarray:
    """Basic linear-assignment loss (reference loss/lin_assignment.py): per image,
    Hungarian-match GT labels to slots over ALL pixels, NLL toward virtual labels if
    any pixel disagrees. probs [B, R, M] (softmaxed), labels [B, R]."""

    def per_image(p, gt):
        # ids >= num_labels (dataset taxonomy wider than the head) would clamp
        # in assign[gt] and train toward an arbitrary slot — drop those pixels,
        # the same guard as semantic_loss (photometric.py)
        in_range = gt < num_labels
        valid = in_range.astype(p.dtype)
        # the reference builds this cost from softmax(scores) while the NLL
        # uses the raw (already-softmaxed) scores — i.e. the cost sees a
        # SECOND softmax (lin_assignment.py:18-22). Replicated: the extra
        # compression can change the Hungarian optimum in near-tie cases.
        cost, present = _label_slot_cost(jax.nn.softmax(p, axis=-1), gt,
                                         valid, num_labels)
        assign = hungarian_assign(cost, present)                  # [K]
        virt = assign[jnp.clip(gt, 0, num_labels - 1)]            # [N]
        pred = jnp.argmax(p, axis=-1)
        any_wrong = jnp.any((virt != pred) & in_range)
        nll = -jnp.take_along_axis(safe_prob_log(p), virt[:, None], axis=1)[:, 0]
        nll = jnp.where(in_range, nll, 0.0)
        denom = jnp.maximum(in_range.sum(), 1)
        return jnp.where(any_wrong, nll.sum() / denom, 0.0)

    return jnp.mean(jax.vmap(per_image)(probs, labels))


def lin_assignment_things_loss(probs: jnp.ndarray, labels: jnp.ndarray,
                               stuff_mask: jnp.ndarray, num_labels: int,
                               points_3d: jnp.ndarray | None = None,
                               outlier_rejection: bool = False) -> jnp.ndarray:
    """'Things' linear-assignment loss with slot 0 reserved for stuff and optional
    repeated-ID rejection (reference loss/lin_assignment_things.py:23-81).

    probs [B, R, M] softmaxed slot probabilities; labels [B, R] GT instance ids;
    stuff_mask [B, R] bool (GT semantic class is stuff); points_3d [B, R, 3] world
    points for the rejection cost. Returns per-pixel loss map [B, R] (the trainer
    multiplies by confidence then means, pc_nerf/trainer.py:549-552).
    """
    m = probs.shape[-1]

    def per_image(p, gt, stuff, pts):
        in_range = gt < num_labels      # same out-of-range guard as above
        things_mask = (gt > 0) & in_range
        valid = (stuff | things_mask) & in_range
        # things pixels vs slots 1..M-1 (slot 0 reserved, things.py:23-28)
        things_valid = things_mask.astype(p.dtype)
        cost, present = _label_slot_cost(p[:, 1:], gt, things_valid, num_labels)
        present = present & (jnp.arange(num_labels) > 0)
        if outlier_rejection:
            centers = centers_from_points_with_labels(pts, gt, things_valid, num_labels)
            cost = add_position_id_range_cost(cost, centers[:, 0], present)
        assign = hungarian_assign(cost, present)                  # [K] in [0, M-1)
        virt = jnp.where(things_mask,
                         assign[jnp.clip(gt, 0, num_labels - 1)] + 1, 0)  # [N]
        pred = jnp.argmax(p, axis=-1)
        any_wrong = jnp.any((virt != pred) & valid)
        nll = -jnp.take_along_axis(safe_prob_log(p), virt[:, None], axis=1)[:, 0]
        return jnp.where(valid & any_wrong, nll, 0.0)

    if points_3d is None:
        points_3d = jnp.zeros(probs.shape[:2] + (3,), probs.dtype)
    return jax.vmap(per_image)(probs, labels, stuff_mask, points_3d)
