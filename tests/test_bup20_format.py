"""BUP20 / agrobot data-format tests on a generated on-disk fixture.

Exercises the full reference loading behaviour (SURVEY.md §3.3): COCO annotation
rasterisation, odometry-CSV poses, train/val frame interleave around the labelled
centre frame, Mask2Former prediction pickles with confidences, depth-based mask
filtering, cv->gl + unit-cube pose conversion and base-ray pre-generation
(reference datasets/formats/bup20.py:88-315, agrobot_base.py:110-461)."""
import csv
import json
import pickle

import numpy as np
import pytest
import yaml

W, H = 16, 12
NUM_FRAMES = 85          # seq_num_frames=40 needs >= 2*(40+1)+1 frames
CENTER = 42


def _write_png16(path, arr):
    from PIL import Image
    Image.fromarray(arr.astype(np.uint16)).save(path)


def _write_rgb(path, arr):
    from PIL import Image
    Image.fromarray(arr.astype(np.uint8), mode="RGB").save(path)


@pytest.fixture(scope="module")
def bup20_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("data") / "BUP_20"
    seq = root / "seqA"
    (seq / "depth").mkdir(parents=True)
    (seq / "preds_mask2former").mkdir()

    ts_names = [f"{1000 + i}" for i in range(NUM_FRAMES)]
    rng = np.random.default_rng(0)
    odom_rows = []
    for i, ts in enumerate(ts_names):
        rgb = rng.integers(0, 255, (H, W, 3))
        _write_rgb(seq / f"{ts}.png", rgb)
        # depth in mm: close blob region at 0.5 m, background at 3 m
        depth = np.full((H, W), 3000, np.uint16)
        depth[2:8, 2:10] = 500
        _write_png16(seq / "depth" / f"{ts}.png", depth)
        # mask2former predictions: one close instance + one far (depth-filtered)
        sem = np.zeros((H, W), np.int32)
        imap = np.zeros((H, W), np.int32)
        sem[3:7, 3:9] = 1
        imap[3:7, 3:9] = 1          # inside the 0.5 m depth blob
        sem[9:11, 12:15] = 1
        imap[9:11, 12:15] = 2       # at 3 m -> dropped when max_depth=1.2
        conf = np.full((H, W), 2.0, np.float32)
        with open(seq / "preds_mask2former" / f"{ts}.pkl", "wb") as f:
            pickle.dump((sem, imap, conf), f)
        # odometry: forward motion along x, identity rotation
        odom_rows.append([ts, 0.01 * i, 0.0, 0.0, 0.0, 0.0, 0.0, 1.0])

    with open(seq / "odometry.csv", "w", newline="") as f:
        wr = csv.writer(f)
        wr.writerow(["#ts", "tx", "ty", "tz", "qx", "qy", "qz", "qw"])
        wr.writerows(odom_rows)

    with open(seq / "params.yaml", "w") as f:
        yaml.safe_dump({
            "intrinsics": [[20.0, 0.0, W / 2], [0.0, 20.0, H / 2], [0.0, 0.0, 1.0]],
            "extrinsics": np.eye(4).tolist(),
        }, f)

    # COCO annotations: the centre frame is the only labelled (eval) image
    images = [{"id": i + 1, "path": f"x/y/BUP_20/seqA/{ts}.png",
               "height": H, "width": W, "file_name": f"{ts}.png"}
              for i, ts in enumerate(ts_names)]
    center_id = CENTER + 1
    annotations = [{
        "id": 1, "image_id": center_id, "category_id": 1, "iscrowd": 0,
        "segmentation": [[3.0, 3.0, 9.0, 3.0, 9.0, 7.0, 3.0, 7.0]],
        "area": 24.0, "bbox": [3, 3, 6, 4],
    }]
    cats = [{"id": 1, "name": "pepper", "supercategory": "pepper"}]
    with open(root / "BUP_20.json", "w") as f:
        json.dump({"images": images, "annotations": annotations,
                   "categories": cats}, f)
    with open(root / "BUP_20.yaml", "w") as f:
        yaml.safe_dump({"image_sets": {"eval": [center_id], "train": []}}, f)
    return root


def test_sequence_dataset_window(bup20_root):
    from pagnerf_tpu.data.formats.agrobot_base import BUP20SequenceDataset
    ds = BUP20SequenceDataset(bup20_root / "BUP_20.json", subset="val",
                              seq_num_frames=40, odom_src="odom",
                              preds_rel_path="preds_mask2former")
    assert len(ds) == 1           # only the centre frame survives edge trimming
    frames = ds[0]
    # val window = even offsets including the labelled centre
    names = [f["file_names"] for f in frames]
    assert f"{1000 + CENTER}.png" in names
    center = frames[names.index(f"{1000 + CENTER}.png")]
    # GT labels only on the centre frame, rasterised from the COCO polygon
    assert (center["semantics"] == 1).sum() > 0
    assert center["imap"].max() == 1
    others = [f for f in frames if f is not center]
    assert all((f["semantics"] == -1).all() for f in others)
    # centre frame pose is the window anchor: identity odometry
    np.testing.assert_allclose(center["odom"], np.eye(4), atol=1e-6)

    ds_train = BUP20SequenceDataset(bup20_root / "BUP_20.json", subset="train",
                                    seq_num_frames=40, odom_src="odom",
                                    preds_rel_path="preds_mask2former")
    train_names = {f["file_names"] for f in ds_train[0]}
    # train = odd offsets: disjoint from the val window (agrobot_base.py:110-116)
    assert not (train_names & set(names))


def test_depth_mask_filtering(bup20_root):
    from pagnerf_tpu.data.formats.agrobot_base import BUP20SequenceDataset
    ds = BUP20SequenceDataset(bup20_root / "BUP_20.json", subset="val",
                              seq_num_frames=40, odom_src="odom",
                              preds_rel_path="preds_mask2former", max_depth=1.2)
    frames = ds[0]
    for f in frames:
        assert (f["imap_pred"] == 2).sum() == 0   # far instance dropped
        assert (f["imap_pred"] == 1).sum() > 0    # close instance kept


def test_load_data_full(bup20_root):
    from pagnerf_tpu.data.formats.bup20 import load_data
    data = load_data(bup20_root, dataset_center_idx=0, max_depth=1.2)
    n = data["imgs"].shape[0]
    assert data["imgs"].shape == (n, H, W, 3)
    assert data["rays_origins"].shape == (n, H, W, 3)
    assert data["base_rays_origins"].reshape(-1, 3).shape == (H * W, 3)
    assert len(data["train_idxs"]) > 0 and len(data["val_idxs"]) > 0
    assert set(data["train_idxs"]) & set(data["val_idxs"]) == set()
    assert data["semantic_info"]["num_instances"] == 200
    assert data["semantic_info"]["things_ids"] == [1]
    # ray dirs unit-norm; poses scaled into the unit-cube convention
    d = data["rays_dirs"].reshape(-1, 3)
    np.testing.assert_allclose(np.linalg.norm(d, axis=-1), 1.0, atol=1e-4)
    # the default BUP20 offset [0, 0, -1.4] applied to translations (bup20.py:76-86)
    tz = data["view_matrices"][:, 2, 3]
    assert np.all(np.abs(tz + 1.4) < 0.5)


def test_multiview_dataset_over_bup20(bup20_root):
    from pagnerf_tpu.data.formats.bup20 import load_data
    from pagnerf_tpu.data.multiview import MultiviewDataset
    ds = MultiviewDataset(load_data(bup20_root, dataset_center_idx=0))
    batch = ds.sample_batch(np.random.default_rng(0), 2, 8)
    assert batch["imgs"].shape == (2, 8, 3)
    assert batch["base_rays_origins"].shape == (2, 8, 3)
    assert "semantics_pred" in batch


def test_inference_dataset_sliding_window(bup20_root):
    # sliding-window whole-sequence variant (reference agrobot_base.py:559-682)
    from pagnerf_tpu.data.formats.agrobot_base import BUP20InferenceDataset
    ds = BUP20InferenceDataset(bup20_root / "BUP_20.json", subset="val",
                               seq_num_frames=40, num_rm_frames=10,
                               odom_src="odom",
                               preds_rel_path="preds_mask2former")
    assert len(ds) == 2
    frames = ds[0]
    assert len(frames) > 0
    # inference frames never carry GT labels (agrobot_base.py:681-682)
    assert all((f["semantics"] == -1).all() for f in frames)
    assert all("imap_pred" in f for f in frames)
    # consecutive windows advance through the sequence
    c0 = ds.center_path_for_index(0).name
    c1 = ds.center_path_for_index(1).name
    assert c0 != c1
