"""Auxiliary subsystem tests: visualization, logging, native bindings,
postprocessing, map export, orbit renderer."""
import json
import os

import jax.numpy as jnp
import numpy as np

from pagnerf_tpu.utils.logging_utils import PerfTimer, SummaryWriter
from pagnerf_tpu.utils.postprocess import (center_of_mass_outlier_rejection,
                                           clean_instance_map)
from pagnerf_tpu.utils.visualization import (depth2rgb, label2rgb,
                                             label_colormap, write_png)


def test_label_colormap_and_label2rgb():
    cmap = label_colormap(10)
    assert cmap.shape == (10, 3)
    assert (cmap[0] == 0).all()  # background is black
    lab = np.array([[0, 1], [2, 3]])
    rgb = label2rgb(lab, colormap=cmap)
    assert rgb.shape == (2, 2, 3) and rgb.dtype == np.uint8
    img = np.ones((2, 2, 3), np.uint8) * 200
    blend = label2rgb(lab, colormap=cmap, image=img)
    assert (blend[0, 0] == img[0, 0]).all()  # label 0 keeps image


def test_depth2rgb_range():
    d = np.linspace(0, 1, 16).reshape(4, 4)
    rgb = depth2rgb(d)
    assert rgb.shape == (4, 4, 3) and rgb.dtype == np.uint8


def test_write_png(tmp_path):
    p = str(tmp_path / "x.png")
    write_png(p, np.zeros((4, 4, 3), np.uint8))
    assert os.path.exists(p)


def test_summary_writer(tmp_path):
    w = SummaryWriter(str(tmp_path))
    w.add_scalar("loss", 1.5, 0)
    w.add_scalar("loss", 1.0, 1)
    w.close()
    lines = open(tmp_path / "events.jsonl").read().strip().split("\n")
    assert len(lines) == 2
    assert json.loads(lines[0])["tag"] == "loss"


def test_perf_timer():
    t = PerfTimer(activate=True)
    t.check("phase_a")
    assert "phase_a" in t.records
    t2 = PerfTimer(activate=False)
    t2.check("noop")
    assert not t2.records


def test_com_outlier_rejection_strips_outliers():
    mask = np.zeros((1, 20, 20), np.int32)
    mask[0, 8:12, 8:12] = 1      # compact blob
    mask[0, 0, 19] = 1           # far outlier pixel
    out = center_of_mass_outlier_rejection(mask, std_threshold=2.0)
    assert out[0, 0, 19] == 0
    assert out[0, 9, 9] == 1


def test_clean_instance_map_drops_small():
    inst = np.zeros((40, 40), np.int32)
    inst[5:25, 5:25] = 1          # 400 px, survives
    inst[30, 30] = 2              # 1 px, dropped
    cleaned, masks, ids = clean_instance_map(inst, num_dilations=0,
                                             outlier_rejection=False)
    assert set(np.unique(cleaned)) == {0, 1}


def test_native_bindings_fallback_consistency():
    from pagnerf_tpu.data import native
    src = np.arange(2 * 50 * 3, dtype=np.float32).reshape(2, 50, 3)
    img_idx = np.array([1, 0])
    ray_idx = np.array([[0, 5, 49], [1, 2, 3]])
    out = native.gather_pixels(src, img_idx, ray_idx)
    ref = src[img_idx[:, None], ray_idx]
    np.testing.assert_allclose(out, ref)
    idx = native.sample_ray_indices(4, 16, 100, 123)
    assert idx.shape == (4, 16)
    for row in idx:
        assert len(set(row.tolist())) == 16
        assert (row >= 0).all() and (row < 100).all()


def test_native_rle_roundtrip():
    from pagnerf_tpu.data import native
    from pagnerf_tpu.data.formats.coco import _runs_to_mask
    runs = [3, 4, 2, 5, 6]
    m_native = native.rle_decode(runs, 4, 5)
    m_py = _runs_to_mask(runs, 4, 5)
    np.testing.assert_array_equal(m_native, m_py)


def make_tiny_trainer():
    from pagnerf_tpu.data.multiview import MultiviewDataset
    from pagnerf_tpu.data.synthetic import make_dataset
    from pagnerf_tpu.models.nefs import GridConfig, PanopticDeltaNeF
    from pagnerf_tpu.models.pipeline import BAPipeline
    from pagnerf_tpu.models.tracer import TracerConfig
    from pagnerf_tpu.train.trainer import PanopticTrainer, TrainerConfig

    data = make_dataset(num_views=4, width=16, height=12, num_spheres=2)
    ds = MultiviewDataset(data)
    si = ds.semantic_info
    nef = PanopticDeltaNeF(
        grid=GridConfig(grid_type="HashGrid", num_lods=2, feature_dim=2,
                        log2_table_size=8, base_resolution=4, finest_resolution=8),
        num_classes=si["num_classes"], num_instances=si["num_instances"],
        hidden_dim=8, panoptic_features_type="delta")
    pipe = BAPipeline(nef, TracerConfig(num_steps=8),
                      jnp.asarray(data["view_matrices"]))
    cfg = TrainerConfig(epochs=1, batch_size=2, num_rays_sampled_per_img=16,
                        sem_epoch_start=0, inst_epoch_start=0, prune_every=-1,
                        optimize_val_extrinsics=False, inst_outlier_rejection=False,
                        render_batch=96, inst_num_dilations=0)
    return PanopticTrainer(pipe, ds, cfg, occ_level=3)


def test_map_export_runs():
    from pagnerf_tpu.utils.render_map import generate_pc_map_from_views
    trainer = make_tiny_trainer()
    out = generate_pc_map_from_views(trainer, mip=1, density_threshold=0.0,
                                     alpha_threshold=0.0, depth_range=(0.0, 10.0))
    assert "points" in out and "color" in out
    assert out["points"].shape[1] == 3


def test_orbit_renderer(tmp_path):
    from pagnerf_tpu.app.orbit_renderer import render_orbit
    trainer = make_tiny_trainer()
    frames = render_orbit(trainer, str(tmp_path), views=[0, 1])
    assert "rgb" in frames and len(frames["rgb"]) == 2
    assert frames["rgb"][0].shape == (12, 16, 3)


def test_validation_media_saved(tmp_path):
    from pagnerf_tpu.train.validation import validate
    trainer = make_tiny_trainer()
    metrics = validate(trainer, epoch=0, log_dir=str(tmp_path))
    assert "val/psnr" in metrics
    media = tmp_path / "val" / "epoch_0"
    assert (media / "rgb.mp4").exists() or any(media.glob("rgb_*.png"))
    assert (tmp_path / "metrics.csv").exists()


def test_validation_log_2d_writes_tb_images(tmp_path):
    """--log-2d mirrors the saved validation frames to the SummaryWriter
    (reference config_parser.py:365): one image event per saved frame/channel
    in events.jsonl (and TensorBoard when installed)."""
    import dataclasses

    from pagnerf_tpu.train.validation import validate

    trainer = make_tiny_trainer()
    trainer.cfg = dataclasses.replace(trainer.cfg, log_2d=True)
    w = SummaryWriter(str(tmp_path / "tb"))
    validate(trainer, epoch=0, log_dir=str(tmp_path), writer=w)
    w.close()
    events = [json.loads(l) for l in
              open(tmp_path / "tb" / "events.jsonl").read().strip().split("\n")]
    img_events = [e for e in events if "image_shape" in e]
    assert img_events and img_events[0]["tag"].startswith("val/")
    assert len(img_events[0]["image_shape"]) == 3


def test_perf_flag_activates_trainer_timer():
    # --perf threads an active PerfTimer through the trainer loop (reference
    # config_parser.py:56 + PerfTimer at pc_nerf/trainer.py:393)
    from pagnerf_tpu.config.config import parse_options
    from pagnerf_tpu.config.factory import get_modules_from_config
    shrink = ["--multiview-dataset-format", "synthetic", "--capacity-log-2", "8",
              "--delta-capacity-log-2", "8", "--hidden-dim", "8",
              "--num-steps", "4", "--epochs", "1", "--batch-size", "2",
              "--num-rays-sampled-per-img", "8"]
    _, _, tr = get_modules_from_config(parse_options(shrink + ["--perf"]))
    assert tr.timer.activate is True
    _, _, tr = get_modules_from_config(parse_options(shrink))
    assert tr.timer.activate is False


def test_clean_instance_map_no_background_frame():
    """A frame with NO background pixels must keep every instance as
    foreground — id 0 is background by the decode contract, not 'the lowest
    id present' (documented deviation from reference trainer.py:753)."""
    from pagnerf_tpu.utils.postprocess import clean_instance_map

    inst = np.zeros((20, 20), np.int32)
    inst[:, :10] = 1          # two instances tile the whole frame
    inst[:, 10:] = 3
    cleaned, masks, fg_ids = clean_instance_map(
        inst, num_dilations=0, outlier_rejection=False, min_mask_px=1)
    assert fg_ids.tolist() == [1, 3]
    assert masks.shape[0] == 2
    np.testing.assert_array_equal(cleaned, inst)   # nothing treated as bg


def test_append_metrics_csv_appends_without_rewrite(tmp_path):
    """Same-column rows append in place (a crash mid-validation must not be
    able to erase the whole history); new columns rewrite atomically."""
    import csv

    from pagnerf_tpu.train.validation import append_metrics_csv

    p = str(tmp_path / "metrics.csv")
    append_metrics_csv(p, {"epoch": 1, "val/psnr": 10.0})
    ino = os.stat(p).st_ino
    append_metrics_csv(p, {"epoch": 2, "val/psnr": 11.0})
    assert os.stat(p).st_ino == ino        # appended, not rewritten
    append_metrics_csv(p, {"epoch": 3, "val/psnr": 12.0, "val/iou": 0.5})
    with open(p, newline="") as f:
        rows = list(csv.DictReader(f))
    assert [r["epoch"] for r in rows] == ["1", "2", "3"]
    assert rows[0]["val/iou"] == "" and rows[2]["val/iou"] == "0.5"
