"""Cameras: pinhole intrinsics, SE(3) extrinsics with a learnable 6-DoF backend, ray
generation, and coordinate-convention helpers.

TPU-native equivalent of ``kaolin.render.camera.Camera`` as consumed by the reference:
  * learnable ``matrix_6dof_rotation`` extrinsics backend for online bundle adjustment
    (/root/reference/pc_nerf/ba_pipeline.py:44-51),
  * ``inv_transform_rays`` camera->world ray transform (ba_pipeline.py:85-92,
    utils/outlier_rejection.py:74-97),
  * pinhole ray pre-generation (``wisp.ops.raygen.generate_pinhole_rays`` /
    ``generate_centered_pixel_coords`` at datasets/formats/bup20.py:251-287),
  * cv->gl pose flip (datasets/utils.py:35-42).

Design notes (TPU-first): extrinsics are a flat ``[num_cams, 9]`` parameter array
(6-D continuous rotation + translation, Zhou et al. CVPR'19 — the same representation
kaolin's ``matrix_6dof_rotation`` backend uses), living directly in the train-state
param pytree so pose optimisation is just another parameter group under ``jit`` —
no pipeline-level mutation as in the torch reference.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from .rays import Rays


@struct.dataclass
class PinholeIntrinsics:
    """Pinhole intrinsics. Width/height are static Python ints (shapes must be static
    under jit); focal/principal point are arrays so they can be rescaled per mip."""

    fx: jnp.ndarray
    fy: jnp.ndarray
    cx: jnp.ndarray
    cy: jnp.ndarray
    width: int = struct.field(pytree_node=False)
    height: int = struct.field(pytree_node=False)
    near: float = struct.field(pytree_node=False, default=0.0)
    far: float = struct.field(pytree_node=False, default=6.0)

    def rescaled(self, scale: float, new_width: int, new_height: int) -> "PinholeIntrinsics":
        """Intrinsics rescale for mip levels (reference: bup20.py:237-242)."""
        return PinholeIntrinsics(
            fx=self.fx * scale, fy=self.fy * scale,
            cx=self.cx * scale, cy=self.cy * scale,
            width=new_width, height=new_height,
            near=self.near, far=self.far)


# ---------------------------------------------------------------------------
# Rotation parameterisation: 6-D continuous representation (Zhou et al.).
# ---------------------------------------------------------------------------

def r6_to_rotmat(r6: jnp.ndarray) -> jnp.ndarray:
    """[..., 6] -> [..., 3, 3] rotation via Gram-Schmidt of the first two columns."""
    a1, a2 = r6[..., 0:3], r6[..., 3:6]
    b1 = a1 / (jnp.linalg.norm(a1, axis=-1, keepdims=True) + 1e-12)
    a2p = a2 - jnp.sum(b1 * a2, axis=-1, keepdims=True) * b1
    b2 = a2p / (jnp.linalg.norm(a2p, axis=-1, keepdims=True) + 1e-12)
    b3 = jnp.cross(b1, b2)
    return jnp.stack([b1, b2, b3], axis=-1)  # columns


def rotmat_to_r6(rot: jnp.ndarray) -> jnp.ndarray:
    """[..., 3, 3] -> [..., 6]: first two columns, flattened."""
    return jnp.concatenate([rot[..., :, 0], rot[..., :, 1]], axis=-1)


def extrinsics_params_from_view_matrix(view: jnp.ndarray) -> jnp.ndarray:
    """Pack world->camera view matrices [N, 4, 4] into learnable params [N, 9]
    (6-D rotation + translation)."""
    rot = view[..., :3, :3]
    t = view[..., :3, 3]
    return jnp.concatenate([rotmat_to_r6(rot), t], axis=-1)


def view_matrix_from_extrinsics_params(params: jnp.ndarray) -> jnp.ndarray:
    """Unpack [N, 9] params into world->camera view matrices [N, 4, 4]."""
    rot = r6_to_rotmat(params[..., :6])
    t = params[..., 6:9]
    n = params.shape[:-1]
    view = jnp.zeros(n + (4, 4), dtype=params.dtype)
    view = view.at[..., :3, :3].set(rot)
    view = view.at[..., :3, 3].set(t)
    view = view.at[..., 3, 3].set(1.0)
    return view


# ---------------------------------------------------------------------------
# Ray generation and transforms.
# ---------------------------------------------------------------------------

def generate_centered_pixel_coords(width: int, height: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Pixel-centre coordinate grids [h, w] (wisp raygen equivalent, bup20.py:260-261)."""
    x = jnp.arange(width, dtype=jnp.float32) + 0.5
    y = jnp.arange(height, dtype=jnp.float32) + 0.5
    return jnp.meshgrid(x, y, indexing="xy")


def generate_pinhole_rays(intr: PinholeIntrinsics, dist_min: float = 0.0,
                          dist_max: float = 6.0) -> Rays:
    """Camera-space pinhole rays at pixel centres, GL convention (camera looks down -z,
    y up). These are the ``base_rays`` the BA pipeline transforms per-pose each forward
    (reference: bup20.py:251-287 pre-generates them once per dataset load).

    Returns rays with shape [h, w].
    """
    px, py = generate_centered_pixel_coords(intr.width, intr.height)
    x = (px - intr.cx) / intr.fx
    y = (py - intr.cy) / intr.fy
    dirs = jnp.stack([x, -y, -jnp.ones_like(x)], axis=-1)
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    origins = jnp.zeros_like(dirs)
    return Rays(origins=origins, dirs=dirs,
                dist_min=jnp.asarray(dist_min, jnp.float32),
                dist_max=jnp.asarray(dist_max, jnp.float32))


def inv_transform_rays(params: jnp.ndarray, origins: jnp.ndarray,
                       dirs: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Transform camera-space rays to world space under per-camera extrinsics.

    ``params``: [num_cams, 9]; ``origins``/``dirs``: [num_cams, rays_per_cam, 3].
    Equivalent to kaolin ``CameraExtrinsics.inv_transform_rays`` as used at
    ba_pipeline.py:85-92. x_cam = R x_world + t  =>  x_world = R^T (x_cam - t).
    """
    rot = r6_to_rotmat(params[..., :6])          # [N, 3, 3]
    t = params[..., 6:9]                          # [N, 3]
    # R^T (o - t) ; R^T d. Tiny 3x3 contractions: force full fp32 precision — pose
    # math must not run in the TPU's default bf16 matmul mode.
    hi = jax.lax.Precision.HIGHEST
    o_w = jnp.einsum("nij,nri->nrj", rot, origins - t[:, None, :], precision=hi)
    d_w = jnp.einsum("nij,nri->nrj", rot, dirs, precision=hi)
    return o_w, d_w


def transform_rays(params: jnp.ndarray, base_rays: Rays, cam_idx: jnp.ndarray) -> Rays:
    """Apply current (possibly learnable) extrinsics of cameras ``cam_idx`` [B] to
    camera-space base rays [B, R] (reference BAPipeline.transform_rays,
    ba_pipeline.py:85-92). Directions are re-normalised as in the reference."""
    cam_params = params[cam_idx]                  # [B, 9]
    o_w, d_w = inv_transform_rays(cam_params, base_rays.origins, base_rays.dirs)
    d_w = d_w / (jnp.linalg.norm(d_w, axis=-1, keepdims=True) + 1e-12)
    return Rays(origins=o_w.astype(jnp.float32), dirs=d_w.astype(jnp.float32),
                dist_min=base_rays.dist_min, dist_max=base_rays.dist_max)


def rays_to_3d_points(rays: Rays, depth: jnp.ndarray) -> jnp.ndarray:
    """Unproject world-space rays at rendered depth to 3-D world points.

    The reference (utils/outlier_rejection.py:74-97) unprojects *camera-space* rays and
    then applies extrinsics; here rays are already world-space (transform_rays output),
    so the unprojection is just origin + depth * dir.
    """
    return rays.origins + rays.dirs * depth.reshape(depth.shape[0], 1)


# ---------------------------------------------------------------------------
# Pose conventions.
# ---------------------------------------------------------------------------

def cv_to_gl_pose(pose: np.ndarray) -> np.ndarray:
    """Flip a camera-to-world pose from OpenCV (x right, y down, z forward) to OpenGL
    (x right, y up, z backward) convention (reference: datasets/utils.py:35-42)."""
    flip = np.diag([1.0, -1.0, -1.0, 1.0]).astype(pose.dtype)
    return pose @ flip


def view_from_c2w(c2w: np.ndarray) -> np.ndarray:
    """Invert a camera-to-world pose into a world->camera view matrix."""
    rot = c2w[..., :3, :3]
    t = c2w[..., :3, 3]
    view = np.zeros_like(c2w)
    rt = np.swapaxes(rot, -1, -2)
    view[..., :3, :3] = rt
    view[..., :3, 3] = -np.einsum("...ij,...j->...i", rt, t)
    view[..., 3, 3] = 1.0
    return view
