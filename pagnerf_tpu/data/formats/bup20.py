"""BUP20 sweet-pepper dataset format.

TPU-native equivalent of /root/reference/datasets/formats/bup20.py: loads a frame
window around a labelled centre frame through the agrobot sequence loader, converts
odometry poses cv->gl, rescales intrinsics per mip, scales/offsets poses into the
unit cube, and pre-generates camera-space base rays plus per-pose world rays
(bup20.py:88-315). Output is the framework's standard data dict (see
data/synthetic.py for the schema).

Pose handling note: the reference routes poses through kaolin's Camera
(extrinsics.update + change_coordinate_system to OpenCV axes, bup20.py:264-272);
here the equivalent axis change is a fixed basis flip applied to the view matrix.
"""
from __future__ import annotations

from pathlib import Path
from typing import Dict, List, Optional

import numpy as np

from ...core.camera import PinholeIntrinsics, cv_to_gl_pose
from .agrobot_base import BUP20InferenceDataset, BUP20SequenceDataset

DEFAULT_CLASS_LABELS = ["bg", "pepper"]

# kaolin change_coordinate_system(opencv_coords) equivalent (bup20.py:264-272)
_CV_BASIS = np.diag([-1.0, -1.0, 1.0, 1.0]).astype(np.float32)


def get_semantic_info(class_labels: Optional[List[str]] = None) -> Dict:
    """reference BUP20.get_semantic_info (bup20.py:49-73)."""
    class_labels = class_labels or DEFAULT_CLASS_LABELS
    info = {}
    info["class_id_to_name"] = {i: l for i, l in enumerate(class_labels)}
    info["num_classes"] = len(class_labels)
    info["classes_present"] = list(range(len(class_labels)))
    info["num_present_classes"] = len(class_labels)
    info["stuff_ids"] = [0]
    info["things_ids"] = list(range(1, len(class_labels)))
    info["num_instances"] = 200
    return info


def load_scale_and_offset(root, model_rescaling="snap_to_bottom"):
    """Scene scale/offset from a PLY mesh if present, else BUP20 defaults
    (bup20.py:76-86)."""
    scale, offset = None, None
    mesh_files = list(Path(root).expanduser().glob("../*.ply"))
    if mesh_files:
        try:
            from ..utils_ply import get_scale_from_ply_mesh
            scale, offset = get_scale_from_ply_mesh(mesh_files[0], model_rescaling)
        except ImportError:
            pass
    if scale is None:
        scale = 1.0
    if offset is None:
        offset = [0.0, 0.0, -1.4]
    return scale, offset


def _resize(img: np.ndarray, h: int, w: int, nearest: bool) -> np.ndarray:
    import cv2
    interp = cv2.INTER_NEAREST if nearest else cv2.INTER_LINEAR
    return cv2.resize(img.astype(np.float32) if not nearest else img,
                      (w, h), interpolation=interp)


def load_data(root, split="train", bg_color="white", mip: int = 0,
              load_modes=None, scale=None, offset=None,
              add_noise_to_train_poses=False, pose_noise_strength=0.01,
              dataset_center_idx=0, pose_src="odom", max_depth=-1.0,
              mode="label_window", class_labels=None,
              robot_mask_path=None) -> Dict:
    """reference BUP20.load_data (bup20.py:88-315), producing the framework's data
    dict with both train and val frames (interleaved split indices)."""
    class_labels = class_labels or DEFAULT_CLASS_LABELS
    load_modes = load_modes or ["imgs", "semantics", "instance",
                                "preds_mask2former"]
    # Honour load_modes the way the reference does (bup20.py load_modes
    # handling): a run WITHOUT a preds source in load_modes loads no
    # predictions at all, and the trainer's batch.get("semantics_pred",
    # batch["semantics"]) precedence then supervises on the GT labels.
    preds_name = next((m for m in load_modes if "preds" in m), None)
    root = Path(root).expanduser()

    cls = BUP20SequenceDataset if mode == "label_window" else BUP20InferenceDataset
    frames = []
    cams = []
    for sub in ("train", "val"):
        ds = cls(root / "BUP_20.json", subset=sub, seq_num_frames=40,
                 odom_src=pose_src, preds_rel_path=preds_name,
                 max_depth=max_depth, class_labels=class_labels,
                 robot_mask_path=robot_mask_path)
        data = ds[dataset_center_idx]
        for d in data:
            d["split"] = sub
        frames.extend(data)

    if scale is None or offset is None:
        s, o = load_scale_and_offset(root)
        scale = scale if scale is not None else s
        offset = offset if offset is not None else o
    offset = np.asarray(offset, np.float32)

    resize_factor = 1 << mip
    h0, w0 = frames[0]["rgb"].shape[:2]
    h, w = h0 // resize_factor, w0 // resize_factor

    imgs, sems, sems_p, insts, insts_p = [], [], [], [], []
    sem_confs, inst_confs, depths, views, ts = [], [], [], [], []
    filenames, splits = [], []
    rng = np.random.default_rng(0)
    have_preds = preds_name is not None
    for i, d in enumerate(frames):
        imgs.append(_resize(d["rgb"], h, w, nearest=False))
        sems.append(_resize(d["semantics"], h, w, nearest=True).astype(np.int32))
        insts.append(_resize(d["imap"], h, w, nearest=True).astype(np.int32))
        if have_preds:
            sems_p.append(_resize(d["semantics_pred"], h, w,
                                  nearest=True).astype(np.int32))
            insts_p.append(_resize(d["imap_pred"], h, w,
                                   nearest=True).astype(np.int32))
            sem_confs.append(_resize(d["sem_conf"], h, w, nearest=False))
            inst_confs.append(_resize(d["inst_conf"], h, w, nearest=False))
        depths.append(_resize(d["depth"], h, w, nearest=False))

        pose = cv_to_gl_pose(d["odom"].astype(np.float64)).astype(np.float32)
        pose[:3, 3] *= scale
        pose[:3, 3] += offset
        if d["split"] == "train" and add_noise_to_train_poses and i > 0:
            # rotation + translation noise, first frame kept clean as the BA anchor
            # (reference bup20.py:276-279: rot in ±strength*pi/2, trans in ±strength)
            from scipy.spatial.transform import Rotation
            ang = pose_noise_strength * (2 * rng.random(3) - 1) * np.pi / 2
            pose[:3, :3] = pose[:3, :3] @ Rotation.from_euler(
                "xyz", ang).as_matrix().astype(np.float32)
            pose[:3, 3] += pose_noise_strength * (2 * rng.random(3) - 1)
        views.append(_CV_BASIS @ pose)
        ts.append(d["odom_ts"])
        filenames.append(d["file_names"])
        splits.append(d["split"])

    intr_mat = frames[0]["intrinsics"] / resize_factor
    intr = PinholeIntrinsics(
        fx=np.float32(intr_mat[0, 0]), fy=np.float32(intr_mat[1, 1]),
        cx=np.float32(intr_mat[0, 2]), cy=np.float32(intr_mat[1, 2]),
        width=w, height=h, near=0.0, far=2.0)

    # base rays (camera space) + per-pose world rays
    import jax.numpy as jnp
    from ...core.camera import (extrinsics_params_from_view_matrix,
                                generate_pinhole_rays, inv_transform_rays)
    base = generate_pinhole_rays(intr, dist_min=0.0, dist_max=2.0)
    views_np = np.stack(views)
    params = extrinsics_params_from_view_matrix(jnp.asarray(views_np))
    bo = jnp.broadcast_to(base.origins.reshape(1, -1, 3),
                          (len(views), h * w, 3))
    bd = jnp.broadcast_to(base.dirs.reshape(1, -1, 3), (len(views), h * w, 3))
    wo, wd = inv_transform_rays(params, bo, bd)
    wd = wd / (jnp.linalg.norm(wd, axis=-1, keepdims=True) + 1e-12)

    splits = np.asarray(splits)
    extra = {}
    if "robot_mask" in frames[0]:
        # per-sequence robot self-occlusion mask: attached by the window loader
        # (reference agrobot_base.py:120-155); consumed by MultiviewDataset to
        # exclude robot pixels from ray sampling
        extra["robot_mask"] = _resize(frames[0]["robot_mask"], h, w,
                                      nearest=True).astype(np.uint8)
    if have_preds:
        extra.update({
            "semantics_pred": np.stack(sems_p),
            "instance_pred": np.stack(insts_p),
            "sem_conf": np.stack(sem_confs).astype(np.float32),
            "inst_conf": np.stack(inst_confs).astype(np.float32),
        })
    return {
        **extra,
        "imgs": np.stack(imgs).astype(np.float32),
        "semantics": np.stack(sems),
        "instance": np.stack(insts),
        "depths": np.stack(depths).astype(np.float32),
        "rays_origins": np.asarray(wo).reshape(-1, h, w, 3),
        "rays_dirs": np.asarray(wd).reshape(-1, h, w, 3),
        "base_rays_origins": np.asarray(base.origins),
        "base_rays_dirs": np.asarray(base.dirs),
        "view_matrices": views_np,
        "cameras_ts": np.asarray(ts),
        "filenames": filenames,
        "intrinsics": intr,
        "train_idxs": np.nonzero(splits == "train")[0],
        "val_idxs": np.nonzero(splits == "val")[0],
        "semantic_info": get_semantic_info(class_labels),
    }


def load_bup20(args) -> Dict:
    """Factory adapter: build from a parsed config namespace."""
    return load_data(
        args.dataset_path, bg_color=args.bg_color, mip=args.mip or 0,
        load_modes=args.load_modes or None,
        scale=args.scale[0] if args.scale else None,
        offset=args.offset, add_noise_to_train_poses=args.add_noise_to_train_poses,
        pose_noise_strength=args.pose_noise_strength,
        dataset_center_idx=args.dataset_center_idx, pose_src=args.pose_src,
        max_depth=args.max_depth, mode=args.dataset_mode,
        class_labels=args.class_labels or None,
        robot_mask_path=getattr(args, "mask_robot_path", None))
