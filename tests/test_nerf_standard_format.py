"""nerf_standard (instant-ngp transforms.json) format tests on a generated fixture
(reference datasets/formats/nerf_standard.py:142-283): camera_angle_x vs fl_x/cx/cy
intrinsics, alpha-to-background compositing, blender->GL pose convention."""
import json

import numpy as np
import pytest

W, H = 16, 12


def _write_rgba(path, rgba):
    from PIL import Image
    Image.fromarray(rgba.astype(np.uint8), mode="RGBA").save(path)


@pytest.fixture(scope="module")
def nerf_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("nerf_scene")
    frames = []
    rng = np.random.default_rng(0)
    for i in range(3):
        rgba = rng.integers(0, 255, (H, W, 4))
        rgba[..., 3] = 0                 # fully transparent background
        rgba[4:8, 4:12, 3] = 255         # opaque object block
        _write_rgba(root / f"r_{i}.png", rgba)
        c2w = np.eye(4)
        c2w[0, 3] = 0.1 * i
        frames.append({"file_path": f"r_{i}", "transform_matrix": c2w.tolist()})
    with open(root / "transforms_train.json", "w") as f:
        json.dump({"camera_angle_x": 0.8, "frames": frames}, f)
    return root


def test_load_with_camera_angle(nerf_root):
    from pagnerf_tpu.data.formats.nerf_standard import load_nerf_standard
    data = load_nerf_standard(str(nerf_root), split="train", bg_color="white")
    assert data["imgs"].shape == (3, H, W, 3)
    # transparent pixels composited onto white background
    np.testing.assert_allclose(data["imgs"][0, 0, 0], [1.0, 1.0, 1.0], atol=1e-5)
    fx = data["intrinsics"].fx
    np.testing.assert_allclose(fx, 0.5 * W / np.tan(0.4), rtol=1e-5)
    d = data["rays_dirs"].reshape(-1, 3)
    np.testing.assert_allclose(np.linalg.norm(d, axis=-1), 1.0, atol=1e-4)


def test_black_background_compositing(nerf_root):
    from pagnerf_tpu.data.formats.nerf_standard import load_nerf_standard
    data = load_nerf_standard(str(nerf_root), split="train", bg_color="black")
    np.testing.assert_allclose(data["imgs"][0, 0, 0], [0.0, 0.0, 0.0], atol=1e-5)


def test_fl_x_intrinsics(tmp_path):
    from PIL import Image
    from pagnerf_tpu.data.formats.nerf_standard import load_nerf_standard
    Image.fromarray(np.zeros((H, W, 3), np.uint8)).save(tmp_path / "f.png")
    with open(tmp_path / "transforms.json", "w") as f:
        json.dump({"fl_x": 25.0, "fl_y": 26.0, "cx": 7.0, "cy": 5.0,
                   "frames": [{"file_path": "f",
                               "transform_matrix": np.eye(4).tolist()}]}, f)
    data = load_nerf_standard(str(tmp_path))
    intr = data["intrinsics"]
    assert (intr.fx, intr.fy, intr.cx, intr.cy) == (25.0, 26.0, 7.0, 5.0)


def test_identity_pose_rays_look_down_minus_z(nerf_root):
    from pagnerf_tpu.data.formats.nerf_standard import load_nerf_standard
    data = load_nerf_standard(str(nerf_root), split="train")
    # blender/GL convention: camera looks along -z; central ray of the identity
    # pose must have a dominant negative z component
    d = data["rays_dirs"][0].reshape(H, W, 3)[H // 2, W // 2]
    assert d[2] < -0.9
    np.testing.assert_allclose(data["rays_origins"][0, 0, 0], [0, 0, 0], atol=1e-5)


def test_pose_normalisation_aabb_scale_and_offset(nerf_root, tmp_path):
    """Reference nerf_standard.py:229-236: translations /= aabb_scale
    (default 1.25), *= scale, += offset."""
    from pagnerf_tpu.data.formats.nerf_standard import load_nerf_standard
    data = load_nerf_standard(str(nerf_root), split="train")
    # default aabb_scale = 1.25: frame i's x translation 0.1*i / 1.25
    # view_matrices are w2c: camera position = -R^T t = c2w translation
    cam_x = [-data["view_matrices"][i][0, 3] for i in range(3)]
    np.testing.assert_allclose(cam_x, [0.0, 0.08, 0.16], atol=1e-5)

    from PIL import Image
    Image.fromarray(np.zeros((H, W, 3), np.uint8)).save(tmp_path / "g.png")
    c2w = np.eye(4); c2w[:3, 3] = [1.0, 2.0, 3.0]
    with open(tmp_path / "transforms.json", "w") as f:
        json.dump({"camera_angle_x": 0.8, "scale": 0.5, "offset": [1, 0, 0],
                   "aabb_scale": 2.0,
                   "frames": [{"file_path": "g",
                               "transform_matrix": c2w.tolist()}]}, f)
    d2 = load_nerf_standard(str(tmp_path))
    np.testing.assert_allclose(-d2["view_matrices"][0][:3, 3],
                               np.array([1.0, 2.0, 3.0]) / 2.0 * 0.5 + [1, 0, 0],
                               atol=1e-5)


def test_explicit_val_split_loaded(tmp_path):
    """With transforms_train.json + transforms_val.json, BOTH splits load and
    train_idxs/val_idxs are exposed — the even/odd interleave must not
    withhold half the train frames."""
    from PIL import Image
    from pagnerf_tpu.data.formats.nerf_standard import load_nerf_standard
    from pagnerf_tpu.data.multiview import MultiviewDataset

    def write_split(name, n, off):
        frames = []
        for i in range(n):
            Image.fromarray(np.zeros((H, W, 3), np.uint8)).save(
                tmp_path / f"{name}_{i}.png")
            c2w = np.eye(4); c2w[0, 3] = off + i
            frames.append({"file_path": f"{name}_{i}",
                           "transform_matrix": c2w.tolist()})
        with open(tmp_path / f"transforms_{name}.json", "w") as f:
            json.dump({"camera_angle_x": 0.8, "frames": frames}, f)

    write_split("train", 4, 0.0)
    write_split("val", 2, 100.0)
    data = load_nerf_standard(str(tmp_path), split="train")
    assert data["imgs"].shape[0] == 6
    assert data["train_idxs"].tolist() == [0, 1, 2, 3]
    assert data["val_idxs"].tolist() == [4, 5]
    ds = MultiviewDataset(data)
    assert ds.train_idxs.tolist() == [0, 1, 2, 3]   # all 4 train frames train
