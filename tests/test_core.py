"""Core layer tests: rays, render buffer, camera math."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pagnerf_tpu.core.camera import (PinholeIntrinsics, cv_to_gl_pose,
                                     extrinsics_params_from_view_matrix,
                                     generate_pinhole_rays, inv_transform_rays,
                                     r6_to_rotmat, rotmat_to_r6, transform_rays,
                                     view_from_c2w,
                                     view_matrix_from_extrinsics_params)
from pagnerf_tpu.core.rays import Rays
from pagnerf_tpu.core.render_buffer import RenderBuffer


def random_rotation(rng):
    a = rng.standard_normal((3, 3))
    q, _ = np.linalg.qr(a)
    if np.linalg.det(q) < 0:
        q[:, 0] *= -1
    return q


def test_rays_reshape_roundtrip():
    r = Rays(origins=jnp.zeros((4, 5, 3)), dirs=jnp.ones((4, 5, 3)),
             dist_min=jnp.float32(0.0), dist_max=jnp.float32(6.0))
    flat = r.flatten()
    assert flat.origins.shape == (20, 3)
    back = flat.reshape(4, 5)
    assert back.dirs.shape == (4, 5, 3)
    assert r.num_rays == 20


def test_render_buffer_concat_and_reshape():
    b1 = RenderBuffer(rgb=jnp.ones((10, 3)), alpha=jnp.zeros((10, 1)))
    b2 = RenderBuffer(rgb=jnp.zeros((6, 3)), alpha=jnp.ones((6, 1)))
    cat = RenderBuffer.concatenate([b1, b2])
    assert cat.rgb.shape == (16, 3)
    assert cat.depth is None
    r = cat.reshape(4, 4)
    assert r.rgb.shape == (4, 4, 3)


def test_r6_rotation_roundtrip():
    rng = np.random.default_rng(0)
    rot = jnp.asarray(np.stack([random_rotation(rng) for _ in range(5)]))
    r6 = rotmat_to_r6(rot)
    back = r6_to_rotmat(r6)
    np.testing.assert_allclose(np.asarray(back), np.asarray(rot), atol=1e-5)


def test_view_matrix_params_roundtrip():
    rng = np.random.default_rng(1)
    views = []
    for _ in range(3):
        v = np.eye(4)
        v[:3, :3] = random_rotation(rng)
        v[:3, 3] = rng.standard_normal(3)
        views.append(v)
    views = jnp.asarray(np.stack(views), jnp.float32)
    params = extrinsics_params_from_view_matrix(views)
    assert params.shape == (3, 9)
    back = view_matrix_from_extrinsics_params(params)
    np.testing.assert_allclose(np.asarray(back), np.asarray(views), atol=1e-5)


def test_pinhole_rays_center_points_forward():
    intr = PinholeIntrinsics(fx=jnp.float32(100.0), fy=jnp.float32(100.0),
                             cx=jnp.float32(32.0), cy=jnp.float32(24.0),
                             width=64, height=48)
    rays = generate_pinhole_rays(intr)
    assert rays.dirs.shape == (48, 64, 3)
    # centre pixel looks down -z
    center = np.asarray(rays.dirs[24, 32])
    assert center[2] < -0.99
    np.testing.assert_allclose(np.linalg.norm(np.asarray(rays.dirs), axis=-1), 1.0,
                               atol=1e-5)


def test_inv_transform_rays_matches_matrix_inverse():
    rng = np.random.default_rng(2)
    v = np.eye(4)
    v[:3, :3] = random_rotation(rng)
    v[:3, 3] = rng.standard_normal(3)
    params = extrinsics_params_from_view_matrix(jnp.asarray(v[None], jnp.float32))
    o_c = jnp.asarray(rng.standard_normal((1, 7, 3)), jnp.float32)
    d_c = jnp.asarray(rng.standard_normal((1, 7, 3)), jnp.float32)
    o_w, d_w = inv_transform_rays(params, o_c, d_c)
    c2w = np.linalg.inv(v)
    expected_o = (c2w[:3, :3] @ np.asarray(o_c)[0].T).T + c2w[:3, 3]
    expected_d = (c2w[:3, :3] @ np.asarray(d_c)[0].T).T
    np.testing.assert_allclose(np.asarray(o_w)[0], expected_o, atol=1e-4)
    np.testing.assert_allclose(np.asarray(d_w)[0], expected_d, atol=1e-4)


def test_transform_rays_identity_pose_is_noop():
    params = extrinsics_params_from_view_matrix(jnp.eye(4)[None])
    base = Rays(origins=jnp.zeros((1, 10, 3)),
                dirs=jnp.tile(jnp.array([[0.0, 0.0, -1.0]]), (10, 1))[None],
                dist_min=jnp.float32(0.0), dist_max=jnp.float32(6.0))
    out = transform_rays(params, base, jnp.array([0]))
    np.testing.assert_allclose(np.asarray(out.origins), 0.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out.dirs)[0, :, 2], -1.0, atol=1e-6)


def test_cv_gl_and_view_inverse():
    rng = np.random.default_rng(3)
    c2w = np.eye(4)
    c2w[:3, :3] = random_rotation(rng)
    c2w[:3, 3] = rng.standard_normal(3)
    gl = cv_to_gl_pose(c2w)
    # double flip is identity
    np.testing.assert_allclose(cv_to_gl_pose(gl), c2w, atol=1e-6)
    v = view_from_c2w(c2w)
    np.testing.assert_allclose(v @ c2w, np.eye(4), atol=1e-6)
