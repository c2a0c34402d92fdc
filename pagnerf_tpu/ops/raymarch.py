"""Ray marching with occupancy skipping — dense [num_rays, num_steps] layout.

TPU-native replacement for kaolin/wisp ``OctreeAS.raymarch`` (consumed at
/root/reference/grids/occtree.py:85-91 and tracers/panoptic_packed_rf_tracer.py:85-86).
The reference produces a ragged "packed" sample tensor; on TPU the idiomatic layout is
a dense [R, S] grid of samples with a validity mask — static shapes jit/pjit can tile,
compositing as a scan along S. Occupancy skipping becomes masking; the ``voxel`` mode's
sample concentration is recovered by re-fitting the sample interval around the first
occupied hit (see ``raymarch``).

Supports both reference march modes (config ``raymarch_type`` 'ray'/'voxel', switched
at epoch 201 by the trainer, pc_nerf/trainer.py:362-366) and the ``ray_max_travel``
filter (tracers/panoptic_packed_rf_tracer.py:88-109).
"""
from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from ..core.rays import Rays
from .occupancy import OccupancyGrid

_BIG = 1e10


def _windowed_probe() -> bool:
    """Two-stage (mip + windowed fine) first-hit probe for voxel mode
    (PAGNERF_WINDOWED_PROBE). Default OFF pending the round-5 chip
    measurement (scripts/probe_post_fixed_costs.py) — the variant changes
    sample placement (conservative window anchor), so it must not flip under
    a training run resumed mid-flight."""
    import os
    return os.environ.get("PAGNERF_WINDOWED_PROBE", "0") == "1"


@struct.dataclass
class RaymarchResult:
    """Dense samples along rays.

    positionsT: [3, R, S] world-space sample positions, coordinate axis MAJOR —
                a [R, S, 3] layout would lane-pad 3 -> 128 on TPU (42x memory,
                see ops/permuto_encoding.py).
    depths:    [R, S] distance along ray.
    deltas:    [R, S] inter-sample step length.
    mask:      [R, S] bool validity (inside AABB, occupied cell, within max travel).
    """

    positionsT: jnp.ndarray
    depths: jnp.ndarray
    deltas: jnp.ndarray
    mask: jnp.ndarray
    # per-ray sampling interval (depths = t0 + u * span with u pose-independent):
    # carried for the packed layout (ops/packed.py), which recomputes sample
    # geometry in packed space so pose gradients avoid dense scatters
    t0: Optional[jnp.ndarray] = None     # [R]
    span: Optional[jnp.ndarray] = None   # [R]

    @property
    def positions(self) -> jnp.ndarray:
        """Sample-major view [R, S, 3] (tests / small hosts only)."""
        return jnp.transpose(self.positionsT, (1, 2, 0))


def aabb_intersect(rays: Rays, lo: float = -1.0, hi: float = 1.0
                   ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Slab test against the scene cube. Returns (t_near [R], t_far [R], hit [R])."""
    inv_d = 1.0 / jnp.where(jnp.abs(rays.dirs) < 1e-9,
                            jnp.where(rays.dirs >= 0, 1e-9, -1e-9), rays.dirs)
    t0 = (lo - rays.origins) * inv_d
    t1 = (hi - rays.origins) * inv_d
    t_near = jnp.max(jnp.minimum(t0, t1), axis=-1)
    t_far = jnp.min(jnp.maximum(t0, t1), axis=-1)
    t_near = jnp.maximum(t_near, 0.0)
    hit = t_far > t_near
    return t_near, t_far, hit


def _uniform_samples(t0: jnp.ndarray, t1: jnp.ndarray, num_steps: int,
                     key: Optional[jax.Array]) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Stratified (or midpoint) samples in [t0, t1] per ray -> depths, deltas [R, S]."""
    r = t0.shape[0]
    span = (t1 - t0)[:, None]
    step = span / num_steps
    frac = (jnp.arange(num_steps, dtype=jnp.float32)[None, :]) / num_steps
    if key is not None:
        jitter = jax.random.uniform(key, (r, num_steps))
    else:
        jitter = 0.5
    depths = t0[:, None] + (frac + jitter / num_steps) * span
    deltas = jnp.broadcast_to(step, depths.shape)
    return depths, deltas


def raymarch(rays: Rays, occ: OccupancyGrid, num_steps: int,
             raymarch_type: str = "ray", ray_max_travel: float = float("inf"),
             key: Optional[jax.Array] = None) -> RaymarchResult:
    """March rays through the occupancy grid.

    'ray' mode (reference: num_steps samples along each ray filtered by occupied
    cells): uniform samples in the ray/AABB interval, masked by occupancy.

    'voxel' mode (reference: num_samples per intersected voxel; used after the prune
    epoch when occupancy is sparse): a coarse probe locates the first occupied cell per
    ray, then the full sample budget is re-fit to the interval
    [t_hit, min(t_hit + max_travel, t_far)] — concentrating samples where the
    reference's packed voxel samples would be, while keeping a static [R, S] layout.

    The ``ray_max_travel`` filter (samples deeper than max_travel past the first hit
    are dropped) applies in 'voxel' mode ONLY, exactly like the reference
    (tracers/panoptic_packed_rf_tracer.py:88 gates on raymarch_type == 'voxel');
    'ray' mode keeps every occupied sample in the AABB interval.
    """
    t_near, t_far, hit_aabb = aabb_intersect(rays)
    t0 = jnp.maximum(t_near, rays.dist_min)
    t1 = jnp.maximum(jnp.minimum(t_far, rays.dist_max), t0)

    # feature-major ray geometry: [3, R] so positions come out [3, R, S]
    oT = rays.origins.T
    dT = rays.dirs.T

    def positions_at(depths):
        return oT[:, :, None] + dT[:, :, None] * depths[None, :, :]   # [3, R, S]

    if raymarch_type == "voxel":
        # Coarse occupancy probe to find the first-hit depth per ray. The probe
        # count is set by the GRID resolution, not num_steps: ceil(sqrt(3)*res)
        # midpoint probes bound the spacing by one cell on even the longest
        # cube diagonal (span <= 2*sqrt(3), cell = 2/res), so a 1-cell-thick
        # occupied wall cannot fall between probes — and a 512-step march no
        # longer pays a 512-wide second occupancy gather.
        probe_n = int(math.ceil(math.sqrt(3.0) * occ.res))
        windowed = False
        if _windowed_probe() and math.isfinite(ray_max_travel) \
                and occ.level >= 5:
            # Two-stage probe (default; opt out PAGNERF_WINDOWED_PROBE=0): a
            # res/4 max-pool mip locates a conservative window start (mip
            # occupancy is a superset, so the first mip hit is at or BEFORE
            # the fine first hit), then full-resolution probes cover only
            # [t_c, t_c + max_travel + margin] — the span the refit can use
            # anyway — instead of the whole AABB interval. Lookups per ray
            # fall from ceil(sqrt(3)*res) to ~sqrt(3)*res/4 + res*travel/2
            # (443 -> 192 at res=128, travel=2). A ray whose mip corridor has
            # no fine hit inside the window keeps the unrefit interval — the
            # mask still guarantees correctness; only that ray's sample
            # concentration is lost, exactly like a probe miss on the
            # single-stage path.
            clevel = occ.level - 2
            cres = 1 << clevel
            pn1 = int(math.ceil(math.sqrt(3.0) * cres))
            cell_c = 2.0 / cres
            w_max = ray_max_travel + 2.0 * cell_c
            pn2 = int(math.ceil(occ.res * w_max / 2.0))
            windowed = pn1 + pn2 < probe_n
        if windowed:
            mip = occ.mask.reshape(cres, 4, cres, 4, cres, 4).any(
                axis=(1, 3, 5)).reshape(-1)
            occ_c = OccupancyGrid(occupancy=jnp.zeros((1,), jnp.float32),
                                  mask=mip, level=clevel)
            d1, _ = _uniform_samples(t0, t1, pn1, None)
            o1 = occ_c.occupied_at_T(positions_at(d1))
            tc = jnp.min(jnp.where(o1, d1, _BIG), axis=-1)
            coarse_hit = tc < _BIG
            tc = jnp.where(coarse_hit,
                           jnp.maximum(tc - (t1 - t0) / pn1, t0), t0)
            w = jnp.minimum(t1 - tc, w_max)
            d2, _ = _uniform_samples(tc, tc + w, pn2, None)
            o2 = occ.occupied_at_T(positions_at(d2))
            first = jnp.min(jnp.where(o2, d2, _BIG), axis=-1)
            has_hit = first < _BIG
            first = jnp.maximum(first - w / pn2, t0)
        else:
            probe_depths, _ = _uniform_samples(t0, t1, probe_n, None)
            probe_occ = occ.occupied_at_T(positions_at(probe_depths))
            first = jnp.min(jnp.where(probe_occ, probe_depths, _BIG), axis=-1)
            has_hit = first < _BIG
            # back off one probe step: `first` is an occupied-cell MIDPOINT;
            # the cell's front face (where surface density lives) starts up to
            # a step earlier. Samples landing in the empty backoff get masked
            # anyway.
            first = jnp.maximum(first - (t1 - t0) / probe_n, t0)
        t0 = jnp.where(has_hit, first, t0)
        if ray_max_travel != float("inf"):
            t1 = jnp.where(has_hit, jnp.minimum(t0 + ray_max_travel, t1), t1)

    depths, deltas = _uniform_samples(t0, t1, num_steps, key)
    positionsT = positions_at(depths)
    mask = occ.occupied_at_T(positionsT) & hit_aabb[:, None]

    return RaymarchResult(positionsT=positionsT, depths=depths, deltas=deltas,
                          mask=mask, t0=t0, span=t1 - t0)


def compact_samples(rm: RaymarchResult, keep_steps: int) -> RaymarchResult:
    """Per-ray sample compaction: stable-sort each ray's samples valid-first (depth
    order preserved among the valid) and truncate to ``keep_steps``.

    The TPU equivalent of the reference's packed layout benefit (kaolin raymarch
    emits only occupied samples): after the prune epoch most of the dense [R, S]
    grid is masked, so the NeF evaluates keep_steps/S of the samples. Rays with more
    than ``keep_steps`` occupied samples lose their deepest ones (same spirit as the
    ray_max_travel cutoff). A single multi-operand sort keeps everything aligned; no
    scatter-back is needed because per-ray ordering survives."""
    if keep_steps <= 0 or keep_steps >= rm.depths.shape[-1]:
        return rm
    key = (~rm.mask).astype(jnp.int32)                    # valid first, stable
    sorted_ops = jax.lax.sort(
        (key, rm.depths, rm.deltas, rm.positionsT[0], rm.positionsT[1],
         rm.positionsT[2]),
        dimension=-1, num_keys=1, is_stable=True)
    key_s, depths, deltas, x, y, z = sorted_ops
    sl = slice(0, keep_steps)
    return RaymarchResult(
        positionsT=jnp.stack([x[:, sl], y[:, sl], z[:, sl]]),
        depths=depths[:, sl], deltas=deltas[:, sl],
        mask=key_s[:, sl] == 0, t0=rm.t0, span=rm.span)
