"""Dense occupancy acceleration grid.

TPU-native replacement for the reference's kaolin SPC octree BLAS
(/root/reference/grids/occtree.py:59-91, pc_nerf/panoptic_nef.py:207-237): a dense
volume at ``2^level`` resolution over the [-1, 1]^3 scene cube. On TPU there is no
benefit to a pointer-chasing octree — a dense bitmask supports O(1) vectorised lookup
inside jit, and "pruning" is a pure functional update with no topology rebuild.

Two pieces of state mirror the reference's split between the octree BLAS and the
float occupancy vector:
  * ``mask``      — cell visibility used by the raymarcher (the octree: starts fully
                    dense, shrinks at prune epochs when rebuilt from surviving points,
                    panoptic_delta_nef.py:94-104);
  * ``occupancy`` — the float density accumulator (decay + max with sampled density,
                    panoptic_delta_nef.py:74-92) from which the mask is re-thresholded.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

# Reference prune constants (panoptic_delta_nef.py:74-75).
DENSITY_DECAY = 0.6
MIN_DENSITY = (0.01 * 512) / (3.0 ** 0.5)


@struct.dataclass
class OccupancyGrid:
    """Flattened [res^3] cell state; ``level`` gives res = 2^level
    (reference blas_level default 7 -> 128^3, grids/occtree.py:59)."""

    occupancy: jnp.ndarray   # float accumulator
    mask: jnp.ndarray        # bool visibility
    level: int = struct.field(pytree_node=False)

    @property
    def res(self) -> int:
        return 1 << self.level

    @staticmethod
    def create(level: int = 7) -> "OccupancyGrid":
        """Fully-visible grid with a zero accumulator (the reference starts with a
        dense octree over the whole cube and zero occupancy)."""
        res = 1 << level
        return OccupancyGrid(occupancy=jnp.zeros((res ** 3,), jnp.float32),
                             mask=jnp.ones((res ** 3,), bool), level=level)

    def cell_indices(self, coords: jnp.ndarray) -> jnp.ndarray:
        """Map coords [..., 3] in [-1, 1] to flat cell indices [...]."""
        res = self.res
        ijk = jnp.clip(((coords + 1.0) * 0.5 * res).astype(jnp.int32), 0, res - 1)
        return (ijk[..., 0] * res + ijk[..., 1]) * res + ijk[..., 2]

    def cell_indices_T(self, coordsT: jnp.ndarray) -> jnp.ndarray:
        """Feature-major variant: coordsT [3, ...] -> flat cell indices [...]
        (no lane-padded [N, 3] intermediate — see ops/permuto_encoding.py)."""
        res = self.res
        ijk = jnp.clip(((coordsT + 1.0) * 0.5 * res).astype(jnp.int32), 0, res - 1)
        return (ijk[0] * res + ijk[1]) * res + ijk[2]

    def _lookup(self, idx: jnp.ndarray) -> jnp.ndarray:
        """Mask lookup by flat cell index.

        TPU note: XLA lowers scalar gathers from a 1-D array to an element-at-a-time
        loop (catastrophic compile and run time). Instead gather along the minor
        axis of a [res^2, res] view with ``take_along_axis``-style row indexing:
        idx -> (row, col) with col on lanes.
        """
        shape = idx.shape
        flat = idx.reshape(-1)
        m = self.mask.astype(jnp.uint8)
        pad = (-m.size) % 128                 # levels < 3 have res^3 < 128 cells
        if pad:
            m = jnp.pad(m, (0, pad))
        # promise_in_bounds skips the bounds-check select (cell_indices clips to
        # [0, res^3)); the barrier keeps the row gather standalone — fused into
        # the lane select it degrades to element-at-a-time addressing
        # (ops/table_gather.py:46-50, CLAUDE.md rule 2)
        rows = m.reshape(-1, 128).at[flat >> 7].get(
            mode="promise_in_bounds")                                   # [N, 128]
        rows = jax.lax.optimization_barrier(rows)
        lane = (flat & 127)[:, None]
        sel = jax.lax.broadcasted_iota(jnp.int32, rows.shape, 1) == lane
        return jnp.sum(rows * sel.astype(jnp.uint8), axis=-1).astype(bool).reshape(shape)

    def occupied_at(self, coords: jnp.ndarray) -> jnp.ndarray:
        """Boolean visibility lookup at world coords [..., 3]."""
        return self._lookup(self.cell_indices(coords))

    def occupied_at_T(self, coordsT: jnp.ndarray) -> jnp.ndarray:
        """Boolean visibility lookup at world coords [3, ...]."""
        return self._lookup(self.cell_indices_T(coordsT))

    def cell_centers_jittered_T(self, key: jax.Array) -> jnp.ndarray:
        """One uniformly-jittered point per cell, FEATURE-MAJOR [3, res^3] in
        [-1, 1]^3 — the prune sampling pattern of the reference
        (panoptic_delta_nef.py:79-86), ordered to match ``cell_indices``
        flattening. [3, N] keeps the 2.1M-point array off the [N, 3] lane-pad
        cliff (42x HBM, CLAUDE.md rule 1)."""
        res = self.res
        ijk = jnp.stack([g.reshape(-1) for g in
                         jnp.meshgrid(jnp.arange(res), jnp.arange(res),
                                      jnp.arange(res), indexing="ij")])   # [3, N]
        jitter = jax.random.uniform(key, ijk.shape)
        return (ijk.astype(jnp.float32) + jitter) / res * 2.0 - 1.0

    def cell_centers_jittered(self, key: jax.Array) -> jnp.ndarray:
        """Sample-major [res^3, 3] view of ``cell_centers_jittered_T`` (tests /
        small grids — at flagship resolution prefer the _T variant)."""
        return self.cell_centers_jittered_T(key).T

    def update_from_density(self, density: jnp.ndarray,
                            decay: float = DENSITY_DECAY,
                            min_density: float = MIN_DENSITY,
                            dilate: int = 0,
                            monotone: bool = False) -> "OccupancyGrid":
        """Prune step: occ <- max(density_at_jittered_cell_points, occ * decay);
        mask <- occ > min_density (reference panoptic_delta_nef.py:74-92).
        ``density`` is [res^3], ordered to match ``cell_centers_jittered``.

        ``dilate``: optional morphological expansion of the mask by N cells
        (3^3 max-pool per step). A thin surface whose jittered sample lands in
        the cell's empty part gets pruned and can never recover (marching skips
        dead cells) — a 1-cell margin keeps surface neighbourhoods alive so the
        field can keep refining surface positions after the prune. The reference
        has no dilation (its prune fires late enough that surfaces are dense
        through whole cells); disabled when 0.

        ``monotone``: AND the thresholded candidate with the CURRENT mask
        before dilating — the reference's kaolin-SPC octree prune can only
        REMOVE cells (wisp accelstruct semantics), whereas a free-revival dense
        grid re-admits dead regions whose density drifts upward with zero
        supervision (marching skips them, but fine-level hash collisions keep
        nudging their tables: a measured flagship run's occupancy 'grew' from
        a 31.5% seed to 95.4% at the real prune). Dilation runs AFTER the AND,
        so the mask can still re-expand by ``dilate`` cells per prune to track
        surface drift — bounded revival instead of free revival."""
        new_occ = jnp.maximum(self.occupancy * decay, density.reshape(-1))
        mask = new_occ > min_density
        if monotone:
            mask = jnp.logical_and(mask, self.mask)
        if dilate > 0:
            res = self.res
            m = mask.reshape(res, res, res).astype(jnp.float32)[None, ..., None]
            for _ in range(dilate):
                m = jax.lax.reduce_window(
                    m, -jnp.inf, jax.lax.max, (1, 3, 3, 3, 1), (1, 1, 1, 1, 1),
                    "SAME")
            mask = (m[0, ..., 0] > 0).reshape(-1)
        return OccupancyGrid(occupancy=new_occ, mask=mask, level=self.level)
