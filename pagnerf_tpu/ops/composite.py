"""Volume-rendering compositing along the dense sample axis.

TPU-native replacement for the kaolin CUDA kernels ``exponential_integration``,
``sum_reduce`` and ``mark_pack_boundaries`` used by the reference tracer
(/root/reference/tracers/panoptic_packed_rf_tracer.py:114,135,138). In the dense
[R, S] layout the ragged per-pack scan becomes an exclusive cumulative sum along the
S axis — one fused XLA op chain (cumsum + exp + mul), no segment bookkeeping.
"""
from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp


def exponential_integration_weights(tau: jnp.ndarray, mask: jnp.ndarray
                                    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-sample compositing weights and per-ray opacity.

    tau:  [R, S] optical thickness (density * delta) per sample.
    mask: [R, S] sample validity.

    Returns (weights [R, S], alpha [R, 1]) where
      weights_i = T_i * (1 - exp(-tau_i)),  T_i = exp(-sum_{j<i} tau_j)
    — exactly kaolin ``exponential_integration(..., exclusive=True)`` followed by
    ``sum_reduce`` for alpha (reference tracer lines 134-141). Invalid samples
    contribute zero thickness and zero weight.
    """
    tau = jnp.where(mask, tau, 0.0)
    cum = jnp.cumsum(tau, axis=-1)
    transmittance = jnp.exp(-(cum - tau))          # exclusive cumsum
    weights = transmittance * (1.0 - jnp.exp(-tau))
    weights = jnp.where(mask, weights, 0.0)
    alpha = jnp.sum(weights, axis=-1, keepdims=True)
    return weights, alpha


def composite_channel(feats: jnp.ndarray, weights: jnp.ndarray) -> jnp.ndarray:
    """Weighted per-ray reduction of per-sample features.

    feats [R, S, C], weights [R, S] -> [R, C]. Equals kaolin
    ``sum_reduce(transmittance * feats, boundary)`` (reference tracer line 161/200).

    precision='highest': TPU einsums default to bf16 MXU multiplies even on f32
    operands; the composited values feed the loss/PSNR directly, and the
    contraction is tiny (C x R x S MACs), so full f32 costs nothing measurable
    (same guard as core/camera.py pose chains).
    """
    return jnp.einsum("rsc,rs->rc", feats, weights, precision="highest")


def composite_channel_T(featsT: jnp.ndarray, weights: jnp.ndarray) -> jnp.ndarray:
    """Feature-major compositing: featsT [C, R, S], weights [R, S] -> [R, C].
    The per-sample features keep the sample axes minor (TPU lane-padding — see
    ops/permuto_encoding.py); only the tiny per-ray output is sample-major."""
    return jnp.einsum("crs,rs->rc", featsT, weights, precision="highest")


def composite_scalar(vals: jnp.ndarray, weights: jnp.ndarray) -> jnp.ndarray:
    """vals [R, S], weights [R, S] -> [R, 1] (depth compositing, tracer line 173)."""
    return jnp.sum(vals * weights, axis=-1, keepdims=True)
