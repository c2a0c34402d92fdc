"""Config system tests: YAML schema parity, parent inheritance, CLI overrides,
factory wiring."""
import os

import pytest

from pagnerf_tpu.config.config import (build_parser, config_to_yaml,
                                       parse_options, parse_yaml_config,
                                       register_class, str2mod)


def test_defaults_match_reference_shape():
    args = parse_options([])
    # spot-check reference defaults (config_parser.py extraction)
    assert args.num_steps == 128
    assert args.ray_max_travel == 6.0
    assert args.grid_lr_weight == 100.0
    assert args.capacity_log_2 == 18
    assert args.sem_detach is True
    assert args.inst_loss == "sup_contrastive"
    assert args.raymarch_type == "voxel"


def test_best_yaml_parses():
    args = parse_options(["--config", "configs/bup20/best.yaml"])
    assert args.nef_type == "PanopticDeltaNeF"
    assert args.grid_type == "PermutoGrid"
    assert args.num_lods == 24
    assert args.inst_weight == 1000.0
    assert args.epochs == 800
    assert args.tracer_type == "PanopticPackedRFTracer"
    assert args.optimize_extrinsics is True
    assert args.voxel_raymarch_epoch_start == 201


def test_cli_overrides_yaml():
    args = parse_options(["--config", "configs/bup20/best.yaml",
                          "--epochs", "10", "--lr", "0.01"])
    assert args.epochs == 10 and args.lr == 0.01


def test_unknown_yaml_field_rejected(tmp_path):
    p = tmp_path / "bad.yaml"
    p.write_text("trainer:\n  epochz: 5\n")
    with pytest.raises(ValueError, match="epochz"):
        parse_options(["--config", str(p)])


def test_parent_inheritance(tmp_path):
    parent = tmp_path / "parent.yaml"
    parent.write_text("trainer:\n  epochs: 42\noptimizer:\n  lr: 0.5\n")
    child = tmp_path / "child.yaml"
    child.write_text(f"parent: {parent}\noptimizer:\n  lr: 0.25\n")
    args = parse_options(["--config", str(child)])
    assert args.epochs == 42      # inherited
    assert args.lr == 0.25        # overridden by child


def test_two_level_parent_rejected(tmp_path):
    a = tmp_path / "a.yaml"; a.write_text("trainer:\n  epochs: 1\n")
    b = tmp_path / "b.yaml"; b.write_text(f"parent: {a}\n")
    c = tmp_path / "c.yaml"; c.write_text(f"parent: {b}\n")
    with pytest.raises(Exception, match="1 level"):
        parse_options(["--config", str(c)])


def test_registry():
    class Dummy:
        pass
    register_class(Dummy, "DummyNeF")
    assert str2mod["DummyNeF"] is Dummy


def test_config_snapshot_roundtrip(tmp_path):
    args = parse_options(["--epochs", "7"])
    text = config_to_yaml(build_parser(), args)
    snap = tmp_path / "snap.yaml"
    snap.write_text(text)
    args2 = parse_options(["--config", str(snap)])
    assert args2.epochs == 7


def test_factory_builds_synthetic_stack():
    from pagnerf_tpu.config.factory import get_modules_from_config
    args = parse_options([
        "--multiview-dataset-format", "synthetic",
        "--nef-type", "PanopticDeltaNeF", "--grid-type", "HashGrid",
        "--num-lods", "2", "--feature-dim", "2", "--codebook-bitwidth", "8",
        "--hidden-dim", "8", "--num-steps", "8", "--epochs", "1",
        "--batch-size", "2", "--num-rays-sampled-per-img", "16",
        "--optimize-extrinsics", "--tracer-type", "PanopticPackedRFTracer",
        "--panoptic-features-type", "delta",
    ])
    pipeline, dataset, trainer = get_modules_from_config(args)
    from pagnerf_tpu.models.pipeline import BAPipeline
    assert isinstance(pipeline, BAPipeline)
    assert trainer.cfg.epochs == 1
    assert pipeline.tracer_cfg.num_steps == 8


def test_load_dataset_honors_synthetic_res_override():
    # scripts/ablate_instance_decode.py --res re-renders a checkpoint's
    # validation views at a different resolution by overriding synthetic_res
    # post-parse; the factory must honor it, and the focal must scale with
    # width (constant FOV) so the frustum is unchanged (data/synthetic.py:271).
    from pagnerf_tpu.config.factory import load_dataset
    args = parse_options(["--multiview-dataset-format", "synthetic",
                          "--synthetic-num-views", "4"])
    args.synthetic_res = [80, 60]
    ds = load_dataset(args)
    data = ds.get_images(split="val", mip=0)
    assert data["imgs"].shape[1:3] == (60, 80)
    intr = ds.data["intrinsics"]
    assert float(intr.fx) == pytest.approx(0.9 * 80)
