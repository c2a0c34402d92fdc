"""3-D fruit point-cloud map export.

Equivalent of /root/reference/utils/render_map.py (+ the ``save_map_only`` dispatch at
main_interactive.py:109-129): render depth / density / rgb / instance embeddings from
every camera, unproject rays at their rendered depth, filter by density / alpha /
depth-band, and return the point cloud dict that the reference pickles to
``nerf_pc.pkl``."""
from __future__ import annotations

from typing import Dict

import jax.numpy as jnp
import numpy as np

from ..core.camera import rays_to_3d_points
from ..core.rays import Rays
from ..models.pipeline import BAPipeline


def generate_pc_map_from_views(trainer, mip: int = 2,
                               density_threshold: float = 40.0,
                               alpha_threshold: float = 0.9,
                               depth_range=(0.6, 0.8)) -> Dict[str, np.ndarray]:
    """Point-cloud map from all cameras (reference render_map.py:82-124; filters at
    render_map.py:107-114: density > 40, alpha > 0.9, hit, 0.6 < depth < 0.8)."""
    ds = trainer.dataset
    is_ba = isinstance(trainer.pipeline, BAPipeline)
    s = 1 << mip
    channels = {"rgb", "depth", "alpha", "inst_embedding"}
    if "inst_embedding" not in trainer.pipeline.nef.supported_channels():
        channels = {"rgb", "depth", "alpha"}

    pts, colors, embeds = [], [], []
    all_idxs = np.concatenate([ds.train_idxs, ds.val_idxs])
    for idx in np.unique(all_idxs):
        if is_ba:
            o = ds.data["base_rays_origins"][::s, ::s].reshape(-1, 3)
            d = ds.data["base_rays_dirs"][::s, ::s].reshape(-1, 3)
        else:
            o = ds.data["rays_origins"][idx][::s, ::s].reshape(-1, 3)
            d = ds.data["rays_dirs"][idx][::s, ::s].reshape(-1, 3)
        rays = Rays(origins=jnp.asarray(o), dirs=jnp.asarray(d),
                    dist_min=jnp.float32(0.0), dist_max=jnp.float32(6.0))
        rb = trainer.batch_render(rays, channels,
                                  cam_idx=int(idx) if is_ba else None)
        if is_ba:
            world = trainer.pipeline.transform_rays(
                trainer.params, rays.reshape(1, -1), jnp.asarray([int(idx)]))
        else:
            world = rays
        depth = np.asarray(rb.depth)[:, 0]
        alpha = np.asarray(rb.alpha)[:, 0]
        p3d = np.asarray(rays_to_3d_points(world, jnp.asarray(depth)))
        keep = (alpha > alpha_threshold) & (depth > depth_range[0]) & \
               (depth < depth_range[1]) & np.asarray(rb.hit)
        pts.append(p3d[keep])
        colors.append(np.asarray(rb.rgb)[keep])
        if rb.inst_embedding is not None:
            embeds.append(np.asarray(rb.inst_embedding)[keep])

    out = {"points": np.concatenate(pts) if pts else np.zeros((0, 3)),
           "color": np.concatenate(colors) if colors else np.zeros((0, 3))}
    if embeds:
        out["inst_embedding"] = np.concatenate(embeds)
    return out
