"""Ray pytree.

TPU-native equivalent of ``wisp.core.Rays`` (consumed throughout the reference, e.g.
/root/reference/pc_nerf/ba_pipeline.py:92, /root/reference/datasets/formats/bup20.py:251-287).

Design: a ``flax.struct`` dataclass so rays flow through ``jit`` / ``shard_map`` as a
pytree. All shapes are static; the ray axis is the data-parallel axis sharded over the
device mesh.
"""
from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
from flax import struct


@struct.dataclass
class Rays:
    """A bundle of rays.

    Attributes:
      origins: [..., 3] ray origins.
      dirs:    [..., 3] ray directions (unit norm by convention).
      dist_min: scalar (or broadcastable) near clipping distance.
      dist_max: scalar (or broadcastable) far clipping distance.
    """

    origins: jnp.ndarray
    dirs: jnp.ndarray
    dist_min: jnp.ndarray
    dist_max: jnp.ndarray

    @property
    def shape(self) -> Tuple[int, ...]:
        return self.origins.shape[:-1]

    @property
    def num_rays(self) -> int:
        n = 1
        for s in self.shape:
            n *= s
        return n

    def reshape(self, *shape) -> "Rays":
        """Reshape the ray axes. A trailing 3 is treated as the vector axis (wisp
        convention, e.g. ``reshape(-1, 3)``) only when the requested element count
        including it matches num_rays * 3; otherwise all dims are ray axes."""
        if len(shape) == 1 and isinstance(shape[0], (tuple, list)):
            shape = tuple(shape[0])
        if shape and shape[-1] == 3:
            known = 1
            for s in shape:
                if s != -1:
                    known *= s
            has_wildcard = any(s == -1 for s in shape)
            total = self.num_rays * 3
            if (has_wildcard and total % known == 0) or known == total:
                shape = shape[:-1]
        return Rays(
            origins=self.origins.reshape(*shape, 3),
            dirs=self.dirs.reshape(*shape, 3),
            dist_min=self.dist_min,
            dist_max=self.dist_max,
        )

    def flatten(self) -> "Rays":
        return self.reshape(-1)

    def __getitem__(self, idx) -> "Rays":
        return Rays(
            origins=self.origins[idx],
            dirs=self.dirs[idx],
            dist_min=self.dist_min,
            dist_max=self.dist_max,
        )

    @staticmethod
    def concatenate(rays_list) -> "Rays":
        return Rays(
            origins=jnp.concatenate([r.origins for r in rays_list], axis=0),
            dirs=jnp.concatenate([r.dirs for r in rays_list], axis=0),
            dist_min=rays_list[0].dist_min,
            dist_max=rays_list[0].dist_max,
        )

    @staticmethod
    def stack(rays_list) -> "Rays":
        return Rays(
            origins=jnp.stack([r.origins for r in rays_list], axis=0),
            dirs=jnp.stack([r.dirs for r in rays_list], axis=0),
            dist_min=rays_list[0].dist_min,
            dist_max=rays_list[0].dist_max,
        )
