"""Pipelines: NeF + tracer (+ learnable camera extrinsics for bundle adjustment).

TPU-native equivalent of wisp ``Pipeline`` and the reference ``BAPipeline``
(/root/reference/pc_nerf/ba_pipeline.py). The torch BAPipeline mutates a camera
database module; here camera extrinsics are just a ``[num_cams, 9]`` entry in the
parameter pytree (key ``"extrinsics"``) so pose optimisation is an optimizer label,
and the anchor-frame gradient mask (ba_pipeline.py:56-61) is a ``stop_gradient``
select inside the jitted forward — no hooks.
"""
from __future__ import annotations

from typing import FrozenSet, Optional, Sequence

import jax
import jax.numpy as jnp

from ..core.camera import extrinsics_params_from_view_matrix, transform_rays
from ..core.rays import Rays
from ..core.render_buffer import RenderBuffer
from ..ops.occupancy import OccupancyGrid
from .tracer import TracerConfig, trace


class Pipeline:
    """nef module + tracer config. ``params`` layout: {"nef": <flax params>}."""

    def __init__(self, nef, tracer_cfg: TracerConfig):
        self.nef = nef
        self.tracer_cfg = tracer_cfg

    def init(self, key: jax.Array, sample_count: int = 8) -> dict:
        coordsT = jnp.zeros((3, sample_count))
        dirsT = jnp.ones((3, sample_count)) / jnp.sqrt(3.0)
        nef_params = self.nef.init(key, coordsT, dirsT,
                                   self.nef.supported_channels())
        return {"nef": nef_params["params"]}

    def nef_fn(self, params: dict, lod_weights: Optional[jnp.ndarray] = None):
        """Feature-major NeF closure: (coordsT [3,N], ray_dT [3,N], channels) ->
        {channel: [C, N]} (see models/nefs.py layout note)."""
        def fn(coordsT, ray_dT, channels):
            return self.nef.apply({"params": params["nef"]}, coordsT, ray_dT,
                                  frozenset(channels), lod_weights)
        return fn

    def query_nef(self, params: dict, coords, ray_d, channels,
                  lod_weights: Optional[jnp.ndarray] = None):
        """Direct sample-major NeF query (prune, TV regularizers, tests):
        coords [N, 3] -> {channel: [N, C]}."""
        ray_dT = ray_d.T if ray_d is not None else None
        out = self.nef_fn(params, lod_weights)(coords.T, ray_dT,
                                               frozenset(channels))
        return {k: v.T for k, v in out.items()}

    def __call__(self, params: dict, rays: Rays, channels: FrozenSet[str],
                 occ: OccupancyGrid, lod_weights: Optional[jnp.ndarray] = None,
                 stage: str = "val", key: Optional[jax.Array] = None,
                 tracer_cfg: Optional[TracerConfig] = None) -> RenderBuffer:
        cfg = tracer_cfg or self.tracer_cfg
        return trace(self.nef_fn(params, lod_weights), rays, occ, cfg,
                     frozenset(channels), stage, key)


class BAPipeline(Pipeline):
    """Bundle-adjustment pipeline: per-camera learnable 6-DoF extrinsics applied to
    camera-space base rays each forward (reference ba_pipeline.py:64-92)."""

    def __init__(self, nef, tracer_cfg: TracerConfig,
                 view_matrices: jnp.ndarray,
                 anchor_frame_idxs: Sequence[int] = ()):
        super().__init__(nef, tracer_cfg)
        self._init_extrinsics = extrinsics_params_from_view_matrix(view_matrices)
        self.num_cameras = int(view_matrices.shape[0])
        anchor = jnp.zeros((self.num_cameras,), bool)
        for i in anchor_frame_idxs:
            anchor = anchor.at[i].set(True)
        self.anchor_mask = anchor

    def init(self, key: jax.Array, sample_count: int = 8) -> dict:
        params = super().init(key, sample_count)
        params["extrinsics"] = self._init_extrinsics
        return params

    def camera_params(self, params: dict) -> jnp.ndarray:
        """Extrinsics with anchor-frame gradients masked (ba_pipeline.py:56-61)."""
        p = params["extrinsics"]
        return jnp.where(self.anchor_mask[:, None], jax.lax.stop_gradient(p), p)

    def transform_rays(self, params: dict, base_rays: Rays,
                       cam_idx: jnp.ndarray) -> Rays:
        """Camera-space base rays [B, R] -> world rays [B*R] under current poses
        (reference transform_rays, ba_pipeline.py:85-92)."""
        world = transform_rays(self.camera_params(params), base_rays, cam_idx)
        return world.reshape(-1)

    def __call__(self, params: dict, rays: Rays, channels: FrozenSet[str],
                 occ: OccupancyGrid, lod_weights: Optional[jnp.ndarray] = None,
                 stage: str = "val", key: Optional[jax.Array] = None,
                 cam_idx: Optional[jnp.ndarray] = None,
                 tracer_cfg: Optional[TracerConfig] = None) -> RenderBuffer:
        if cam_idx is not None:
            rays = self.transform_rays(params, rays, cam_idx)
        return super().__call__(params, rays, channels, occ, lod_weights, stage, key,
                                tracer_cfg)
