"""Panoptic radiance-field tracers (dense TPU layout).

TPU-native equivalents of the reference packed tracers:
  * ``PanopticTracerConfig`` + ``trace``     — tracers/panoptic_packed_rf_tracer.py
  * DD variant (``panoptic_density`` transmittance) — tracers/panoptic_dd_packed_rf_tracer.py

The packed (ragged) sample layout becomes a dense [rays, steps] grid with a validity
mask (see ops/raymarch.py); kaolin's exponential_integration / sum_reduce become a
cumsum-scan compositor (ops/composite.py). Everything traces into one XLA program: no
host sync, no dynamic shapes.

Behavioral contracts reproduced exactly:
  * panoptic channels integrate under *detached* tau/weights (tracer lines 148-156) —
    or under their own ``panoptic_density`` transmittance with detached deltas in the
    DD tracer (dd tracer lines 128-138);
  * background compositing: white bg -> color = (1-alpha) + alpha * ray_colors; other
    -> alpha * ray_colors (tracer lines 160-170). Note the reference multiplies the
    already-composited ray color by alpha — we match that behavior bit-for-bit;
  * panoptic channel output = panoptic_alpha * integrated features (tracer 197-205);
  * optional Cauchy ray-sparsity loss during training (tracer lines 127-130).
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Dict, FrozenSet, Optional

import jax
import jax.numpy as jnp

from ..core.rays import Rays
from ..core.render_buffer import RenderBuffer
from ..ops.composite import (composite_channel, composite_scalar,
                             exponential_integration_weights)
from ..ops.occupancy import OccupancyGrid
from ..ops.raymarch import raymarch

RENDER_CHANNELS = frozenset({"depth", "alpha", "hit"})
PANOPTIC_CHANNELS = frozenset({"semantics", "inst_embedding"})

NefFn = Callable[[jnp.ndarray, Optional[jnp.ndarray], FrozenSet[str]],
                 Dict[str, jnp.ndarray]]


@dataclasses.dataclass(frozen=True)
class TracerConfig:
    """Static tracer settings (reference tracer ctor + trace() kwargs; defaults from
    best.yaml renderer group: num_steps 512, ray_max_travel 2.0, bg white).

    ``sample_chunk``: the per-sample NeF evaluation is scanned in chunks of this many
    samples with rematerialisation — bounds peak HBM to one chunk's activations
    regardless of rays x steps (production scale is ~12.6M samples/step, far beyond
    what fits unchunked on a 16 GB chip). 0 disables chunking.
    """

    tracer_type: str = "PanopticPackedRFTracer"   # or PanopticDDensityPackedRFTracer
    num_steps: int = 512
    raymarch_type: str = "ray"
    bg_color: str = "white"
    ray_max_travel: float = 2.0
    ray_sparsity_reg: float = 0.0
    sample_chunk: int = 1 << 19

    @property
    def is_dd(self) -> bool:
        return "DDensity" in self.tracer_type


def _chunked_nef_eval(nef_fn: NefFn, coords: jnp.ndarray, ray_d: jnp.ndarray,
                      channels: FrozenSet[str], chunk: int) -> Dict[str, jnp.ndarray]:
    """Evaluate the NeF over [N, 3] samples in rematerialised chunks via lax.scan.

    Peak memory = one chunk's activations; backward recomputes each chunk's forward
    (jax.checkpoint), so residuals are just the sample coords. N is padded to a chunk
    multiple (masked samples are cheap — they recompute garbage that is discarded)."""
    n = coords.shape[0]
    if chunk <= 0 or n <= chunk:
        return nef_fn(coords, ray_d, channels)
    pad = (-n) % chunk
    c = jnp.concatenate([coords, jnp.zeros((pad, 3), coords.dtype)])
    d = jnp.concatenate([ray_d, jnp.ones((pad, 3), ray_d.dtype)])
    num_chunks = (n + pad) // chunk

    @jax.checkpoint
    def body(_, inp):
        cc, dd = inp
        return None, nef_fn(cc, dd, channels)

    _, outs = jax.lax.scan(
        body, None, (c.reshape(num_chunks, chunk, 3),
                     d.reshape(num_chunks, chunk, 3)))
    return {k: v.reshape(num_chunks * chunk, *v.shape[2:])[:n]
            for k, v in outs.items()}


def trace(nef_fn: NefFn, rays: Rays, occ: OccupancyGrid, cfg: TracerConfig,
          channels: FrozenSet[str], stage: str = "val",
          key: Optional[jax.Array] = None) -> RenderBuffer:
    """Trace rays against the neural field (reference trace(),
    panoptic_packed_rf_tracer.py:51-195)."""
    num_rays = rays.origins.shape[0]
    rm = raymarch(rays, occ, cfg.num_steps, cfg.raymarch_type,
                  cfg.ray_max_travel, key=key)
    r, s = rm.depths.shape

    coords = rm.positions.reshape(r * s, 3)
    ray_d = jnp.broadcast_to(rays.dirs[:, None, :], (r, s, 3)).reshape(r * s, 3)

    # Channels the NeF must evaluate per sample (tracer lines 121-124).
    sample_channels = frozenset(channels - RENDER_CHANNELS) | {"density"}
    if cfg.is_dd and (channels & PANOPTIC_CHANNELS):
        sample_channels = sample_channels | {"panoptic_density"}

    feats = _chunked_nef_eval(nef_fn, coords, ray_d, sample_channels,
                              cfg.sample_chunk)
    out: Dict[str, jnp.ndarray] = {}

    density = feats["density"].reshape(r, s)
    tau = density * rm.deltas
    weights, alpha = exponential_integration_weights(tau, rm.mask)

    out["alpha"] = alpha
    out["hit"] = alpha[..., 0] > 0.0

    if cfg.ray_sparsity_reg > 0.0 and stage == "train":
        # Cauchy sparsity on sigma (loss/regularizers.py:37-39), per-ray sum then mean
        spars = jnp.log(1.0 + 2.0 * density ** 2) * rm.mask
        out["ray_sparsity_loss"] = jnp.mean(jnp.sum(spars, axis=-1)) * cfg.ray_sparsity_reg

    # Panoptic transmittance: detached (delta tracer) or from panoptic_density with
    # detached deltas (DD tracer).
    if channels & PANOPTIC_CHANNELS:
        if cfg.is_dd:
            panop_tau = feats["panoptic_density"].reshape(r, s) * jax.lax.stop_gradient(rm.deltas)
        else:
            panop_tau = jax.lax.stop_gradient(tau)
        panop_weights, panop_alpha = exponential_integration_weights(panop_tau, rm.mask)
        out["panoptic_alpha"] = panop_alpha

    if "rgb" in channels:
        ray_colors = composite_channel(feats["rgb"].reshape(r, s, 3), weights)
        if cfg.bg_color == "white":
            out["rgb"] = (1.0 - alpha) + alpha * ray_colors
        else:
            out["rgb"] = alpha * ray_colors

    if "depth" in channels:
        out["depth"] = composite_scalar(rm.depths, weights)

    for ch in channels & PANOPTIC_CHANNELS:
        f = feats[ch].reshape(r, s, -1)
        out[ch] = panop_alpha * composite_channel(f, panop_weights)

    assert num_rays == r
    return RenderBuffer(**out)
