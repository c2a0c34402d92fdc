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
from ..ops.composite import (composite_channel_T, composite_scalar,
                             exponential_integration_weights)
from ..ops.occupancy import OccupancyGrid
from ..ops.packed import (pack_samples, packed_composite,
                          packed_integration_weights, segment_broadcast,
                          segment_sum)
from ..ops.raymarch import compact_samples, raymarch

RENDER_CHANNELS = frozenset({"depth", "alpha", "hit"})
PANOPTIC_CHANNELS = frozenset({"semantics", "inst_embedding"})

NefFn = Callable[[jnp.ndarray, Optional[jnp.ndarray], FrozenSet[str]],
                 Dict[str, jnp.ndarray]]


@dataclasses.dataclass(frozen=True)
class TracerConfig:
    """Static tracer settings (reference tracer ctor + trace() kwargs; defaults from
    best.yaml renderer group: num_steps 512, ray_max_travel 2.0, bg white).

    ``sample_chunk``: optionally scans the per-sample NeF evaluation in
    rematerialised chunks of this many samples. Default 0 (disabled): peak-memory
    control normally comes from the trainer's image-axis gradient accumulation
    (TrainerConfig.micro_batch_imgs), which keeps the compiled program flat — the
    nested chunk-scan is kept for single-shot full-frame renders that exceed HBM.

    ``ray_chunk``: rays are traced in rematerialised blocks of this size — march,
    NeF eval and compositing all happen per block inside a lax.scan, so per-sample
    channel tensors (e.g. the [200, rays*steps] instance-embedding activations) never
    materialise for the whole batch. Peak HBM = one block. 0 disables.
    """

    tracer_type: str = "PanopticPackedRFTracer"   # or PanopticDDensityPackedRFTracer
    num_steps: int = 512
    raymarch_type: str = "ray"
    bg_color: str = "white"
    ray_max_travel: float = 2.0
    ray_sparsity_reg: float = 0.0
    sample_chunk: int = 0
    # Default 0: the trainer's per-image gradient accumulation keeps the compiled
    # program flat (scan+remat nests compile pathologically slowly on the current
    # TPU toolchain); enable for single-shot renders that exceed HBM.
    ray_chunk: int = 0
    # Per-ray sample compaction (ops/raymarch.py compact_samples): evaluate the NeF
    # on at most this many valid samples per ray. 0 disables. The trainer enables
    # this after the prune epoch, when occupancy is sparse.
    compact_steps: int = 0
    # Cross-ray PACKED layout (ops/packed.py): flatten the block's valid samples
    # into one static [pack_steps * num_rays] buffer (ray-major, depth-ordered;
    # water-filling truncation on overflow). Sized for the batch MEAN valid
    # count instead of compact_steps' per-ray tail — the TPU equivalent of the
    # reference's ragged packed tensors. Takes precedence over compact_steps.
    # 0 disables.
    pack_steps: int = 0
    # Composite residual transmittance (1 - panoptic_alpha^2 — the rendered
    # probability mass is alpha^2, so this makes each ray an exact
    # distribution when the per-sample features are) into slot 0 of the
    # panoptic channels: semantics class 0 = stuff/background, instance slot 0
    # is reserved for stuff (reference loss/lin_assignment_things.py:23-28,
    # trainer "virt = 0" for stuff pixels). A no-op wherever alpha ~= 1 (the
    # reference's BUP20 frames have geometry at every pixel), but on scenes
    # with true empty space it makes empty rays predict background with p ~= 1
    # instead of rendering p = 0 for EVERY class — whose -log(p + 1e-27) loss
    # slope (reference pc_nerf/trainer.py:459) is unbounded and destabilised
    # the flagship synthetic run's panoptic phase. For non-DD tracers
    # panop_tau is detached, so the residual carries no density gradient.
    panoptic_bg_residual: bool = False
    # Per-channel gates: adding residual mass to slot 0 is only meaningful
    # when that head emits slot PROBABILITIES (softmax post-op). With
    # inst_sigmoid / raw-embedding configs the residual would silently
    # corrupt the embedding's first dimension; the factory sets these from
    # the NeF's sem_softmax / inst_softmax flags (config/factory.py).
    bg_residual_sem: bool = True
    bg_residual_inst: bool = True

    @property
    def is_dd(self) -> bool:
        return "DDensity" in self.tracer_type

    def bg_residual_on(self, channel: str) -> bool:
        gate = (self.bg_residual_inst if channel == "inst_embedding"
                else self.bg_residual_sem)
        return self.panoptic_bg_residual and gate


def _chunked_nef_eval(nef_fn: NefFn, coordsT: jnp.ndarray, ray_dT: jnp.ndarray,
                      channels: FrozenSet[str], chunk: int) -> Dict[str, jnp.ndarray]:
    """Evaluate the NeF over [3, N] samples in rematerialised chunks via lax.scan.

    Peak memory = one chunk's activations; backward recomputes each chunk's forward
    (jax.checkpoint), so residuals are just the sample coords. N is padded to a chunk
    multiple (masked samples are cheap — they recompute garbage that is discarded)."""
    n = coordsT.shape[1]
    if chunk <= 0 or n <= chunk:
        return nef_fn(coordsT, ray_dT, channels)
    pad = (-n) % chunk
    c = jnp.concatenate([coordsT, jnp.zeros((3, pad), coordsT.dtype)], axis=1)
    d = jnp.concatenate([ray_dT, jnp.ones((3, pad), ray_dT.dtype)], axis=1)
    num_chunks = (n + pad) // chunk

    @jax.checkpoint
    def body(_, inp):
        cc, dd = inp
        return None, nef_fn(cc, dd, channels)

    _, outs = jax.lax.scan(
        body, None, (c.reshape(3, num_chunks, chunk).transpose(1, 0, 2),
                     d.reshape(3, num_chunks, chunk).transpose(1, 0, 2)))
    # outs: {ch: [num_chunks, C, chunk]} -> [C, N]
    return {k: jnp.moveaxis(v, 0, 1).reshape(v.shape[1], num_chunks * chunk)[:, :n]
            for k, v in outs.items()}


def trace(nef_fn: NefFn, rays: Rays, occ: OccupancyGrid, cfg: TracerConfig,
          channels: FrozenSet[str], stage: str = "val",
          key: Optional[jax.Array] = None) -> RenderBuffer:
    """Trace rays against the neural field (reference trace(),
    panoptic_packed_rf_tracer.py:51-195). Rays are processed in rematerialised
    blocks of ``cfg.ray_chunk`` (see TracerConfig)."""
    n = rays.origins.shape[0]
    blk = cfg.ray_chunk

    def _finalize(rb: RenderBuffer) -> RenderBuffer:
        # per-ray sparsity -> scalar mean over the n REAL rays (pad rays from
        # the chunked path are already sliced off by unstack)
        if rb.ray_sparsity_loss is not None:
            return rb.replace(ray_sparsity_loss=jnp.mean(rb.ray_sparsity_loss))
        return rb

    if blk <= 0 or n <= blk:
        return _finalize(_trace_block(nef_fn, rays, occ, cfg, channels, stage,
                                      key))

    pad = (-n) % blk
    o = jnp.concatenate([rays.origins, jnp.zeros((pad, 3))])
    d = jnp.concatenate([rays.dirs,
                         jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (pad, 1))])
    num_blocks = (n + pad) // blk
    keys = (jax.random.split(key, num_blocks) if key is not None
            else jnp.zeros((num_blocks, 2), jnp.uint32))

    @jax.checkpoint
    def body(_, inp):
        ob, db, kb = inp
        rb = _trace_block(
            nef_fn,
            Rays(origins=ob, dirs=db, dist_min=rays.dist_min,
                 dist_max=rays.dist_max),
            occ, cfg, channels, stage, kb if key is not None else None)
        return None, rb

    _, stacked = jax.lax.scan(
        body, None, (o.reshape(num_blocks, blk, 3),
                     d.reshape(num_blocks, blk, 3), keys))

    def unstack(x):
        if x is None:
            return None
        return x.reshape(num_blocks * blk, *x.shape[2:])[:n]

    return _finalize(jax.tree.map(unstack, stacked,
                                  is_leaf=lambda v: v is None))


def _trace_block(nef_fn: NefFn, rays: Rays, occ: OccupancyGrid, cfg: TracerConfig,
                 channels: FrozenSet[str], stage: str = "val",
                 key: Optional[jax.Array] = None) -> RenderBuffer:
    if cfg.pack_steps:
        return _trace_block_packed(nef_fn, rays, occ, cfg, channels, stage, key)
    num_rays = rays.origins.shape[0]
    rm = raymarch(rays, occ, cfg.num_steps, cfg.raymarch_type,
                  cfg.ray_max_travel, key=key)
    if cfg.compact_steps:
        rm = compact_samples(rm, cfg.compact_steps)
    r, s = rm.depths.shape

    # feature-major samples: [3, R*S] (see RaymarchResult layout note)
    coordsT = rm.positionsT.reshape(3, r * s)
    ray_dT = jnp.broadcast_to(rays.dirs.T[:, :, None], (3, r, s)).reshape(3, r * s)

    # Channels the NeF must evaluate per sample (tracer lines 121-124).
    sample_channels = frozenset(channels - RENDER_CHANNELS) | {"density"}
    if cfg.is_dd and (channels & PANOPTIC_CHANNELS):
        sample_channels = sample_channels | {"panoptic_density"}

    feats = _chunked_nef_eval(nef_fn, coordsT, ray_dT, sample_channels,
                              cfg.sample_chunk)                  # {ch: [C, N]}
    out: Dict[str, jnp.ndarray] = {}

    density = feats["density"].reshape(r, s)
    tau = density * rm.deltas
    weights, alpha = exponential_integration_weights(tau, rm.mask)

    out["alpha"] = alpha
    out["hit"] = alpha[..., 0] > 0.0

    if cfg.ray_sparsity_reg > 0.0 and stage == "train":
        # Cauchy sparsity on sigma (loss/regularizers.py:37-39). Emitted PER RAY
        # [R]; trace() means over the real rays — a per-block mean here would
        # let the ray_chunk path's PADDING rays (which march through the scene)
        # contribute values and gradients.
        spars = jnp.log(1.0 + 2.0 * density ** 2) * rm.mask
        out["ray_sparsity_loss"] = jnp.sum(spars, axis=-1) * cfg.ray_sparsity_reg

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
        ray_colors = composite_channel_T(feats["rgb"].reshape(3, r, s), weights)
        if cfg.bg_color == "white":
            out["rgb"] = (1.0 - alpha) + alpha * ray_colors
        else:
            out["rgb"] = alpha * ray_colors

    if "depth" in channels:
        out["depth"] = composite_scalar(rm.depths, weights)

    for ch in channels & PANOPTIC_CHANNELS:
        f = feats[ch].reshape(-1, r, s)
        comp = panop_alpha * composite_channel_T(f, panop_weights)   # [R, C]
        if cfg.bg_residual_on(ch):
            # Rendered probability mass is alpha^2 (alpha x the unnormalized
            # Sum(w f), Sum(w) = alpha): the residual 1 - alpha^2 makes each
            # ray an exact distribution when the per-sample features are.
            comp = comp.at[:, 0].add(1.0 - panop_alpha[:, 0] ** 2)
        out[ch] = comp

    assert num_rays == r
    return RenderBuffer(**out)


def _trace_block_packed(nef_fn: NefFn, rays: Rays, occ: OccupancyGrid,
                        cfg: TracerConfig, channels: FrozenSet[str],
                        stage: str = "val",
                        key: Optional[jax.Array] = None) -> RenderBuffer:
    """Packed-layout trace: identical contracts to ``_trace_block`` (same
    channels, same stop-gradient structure, same bg compositing), but the NeF
    evaluates one cross-ray [3, B] buffer of (mostly) valid samples instead
    of the dense/per-ray-compacted grid — see ops/packed.py."""
    num_rays = rays.origins.shape[0]
    rm = raymarch(rays, occ, cfg.num_steps, cfg.raymarch_type,
                  cfg.ray_max_travel, key=key)
    ps = pack_samples(rm, rays.origins.T, rays.dirs.T,
                      budget=cfg.pack_steps * num_rays)

    ray_dT = segment_broadcast(rays.dirs.T, ps.ray_id, ps.offsets)   # [3, B]

    sample_channels = frozenset(channels - RENDER_CHANNELS) | {"density"}
    if cfg.is_dd and (channels & PANOPTIC_CHANNELS):
        sample_channels = sample_channels | {"panoptic_density"}

    feats = _chunked_nef_eval(nef_fn, ps.positionsT, ray_dT, sample_channels,
                              cfg.sample_chunk)                   # {ch: [C, B]}
    out: Dict[str, jnp.ndarray] = {}

    density = feats["density"].reshape(-1)                        # [B]
    tau = density * ps.deltas
    weights, alpha = packed_integration_weights(tau, ps)

    out["alpha"] = alpha
    out["hit"] = alpha[..., 0] > 0.0

    if cfg.ray_sparsity_reg > 0.0 and stage == "train":
        spars = jnp.log(1.0 + 2.0 * density ** 2) * ps.valid
        out["ray_sparsity_loss"] = (
            segment_sum(spars[None, :], ps.offsets)[0] * cfg.ray_sparsity_reg)

    if channels & PANOPTIC_CHANNELS:
        if cfg.is_dd:
            panop_tau = (feats["panoptic_density"].reshape(-1)
                         * jax.lax.stop_gradient(ps.deltas))
        else:
            panop_tau = jax.lax.stop_gradient(tau)
        panop_weights, panop_alpha = packed_integration_weights(panop_tau, ps)
        out["panoptic_alpha"] = panop_alpha

    if "rgb" in channels:
        ray_colors = packed_composite(feats["rgb"], weights, ps)
        if cfg.bg_color == "white":
            out["rgb"] = (1.0 - alpha) + alpha * ray_colors
        else:
            out["rgb"] = alpha * ray_colors

    if "depth" in channels:
        out["depth"] = packed_composite(ps.depths[None, :], weights, ps)

    for ch in channels & PANOPTIC_CHANNELS:
        comp = panop_alpha * packed_composite(feats[ch], panop_weights, ps)
        if cfg.bg_residual_on(ch):
            comp = comp.at[:, 0].add(1.0 - panop_alpha[:, 0] ** 2)
        out[ch] = comp

    return RenderBuffer(**out)
