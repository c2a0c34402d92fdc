"""Multi-device sharding and checkpoint round-trip tests (8 virtual CPU devices)."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pagnerf_tpu.parallel.sharding import (make_mesh, ray_sharding, replicate_tree,
                                           shard_ray_batch,
                                           shard_ray_batch_host_local)


def test_host_local_batch_sharding_single_process():
    """shard_ray_batch_host_local: on a single-process mesh it must produce
    arrays identical (values AND shardings) to the device_put path — the API
    contract real pods rely on, degraded to one host."""
    mesh = make_mesh(8)
    batch = {
        "imgs": np.random.rand(2, 64, 3).astype(np.float32),
        "semantics": np.random.randint(0, 3, (2, 64)),
        "cam_idx": np.array([0, 1], np.int32),
    }
    a = shard_ray_batch(batch, mesh)
    b = shard_ray_batch_host_local(batch, mesh)
    for k in batch:
        assert a[k].shape == b[k].shape, k
        assert a[k].sharding == b[k].sharding, k
        np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]))
    # mis-sized ray axis raises (31 global rays on an 8-way mesh)
    bad = {"imgs": np.random.rand(2, 31, 3).astype(np.float32)}
    with pytest.raises(ValueError):
        shard_ray_batch_host_local(bad, mesh)


def test_mesh_and_batch_sharding():
    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    mesh = make_mesh(8)
    batch = {
        "imgs": np.random.rand(2, 64, 3).astype(np.float32),
        "semantics": np.random.randint(0, 3, (2, 64)),
        "cam_idx": np.array([0, 1], np.int32),
    }
    sharded = shard_ray_batch(batch, mesh)
    # ray axis split 8 ways
    assert sharded["imgs"].sharding.num_devices == 8
    shard_shape = sharded["imgs"].sharding.shard_shape(sharded["imgs"].shape)
    assert shard_shape == (2, 8, 3)
    # cam_idx replicated
    assert sharded["cam_idx"].sharding.is_fully_replicated


def test_sharded_train_step_runs_and_matches_single_device():
    """The jitted train step under an 8-way ray sharding produces the same losses
    as unsharded execution (psum-equivalence of the mean reductions)."""
    import jax.numpy as jnp

    from pagnerf_tpu.data.multiview import MultiviewDataset
    from pagnerf_tpu.data.synthetic import make_dataset
    from pagnerf_tpu.models.nefs import GridConfig, PanopticDeltaNeF
    from pagnerf_tpu.models.pipeline import BAPipeline
    from pagnerf_tpu.models.tracer import TracerConfig
    from pagnerf_tpu.train.trainer import PanopticTrainer, TrainerConfig

    data = make_dataset(num_views=4, width=16, height=12, num_spheres=2)
    ds = MultiviewDataset(data)
    si = ds.semantic_info

    def build():
        nef = PanopticDeltaNeF(
            grid=GridConfig(grid_type="HashGrid", num_lods=2, feature_dim=2,
                            log2_table_size=8, base_resolution=4,
                            finest_resolution=8),
            num_classes=si["num_classes"], num_instances=si["num_instances"],
            hidden_dim=8, panoptic_features_type="delta")
        pipe = BAPipeline(nef, TracerConfig(num_steps=8),
                          jnp.asarray(data["view_matrices"]))
        cfg = TrainerConfig(epochs=1, batch_size=2, num_rays_sampled_per_img=32,
                            sem_epoch_start=0, inst_epoch_start=0, prune_every=-1,
                            optimize_val_extrinsics=False,
                            inst_outlier_rejection=False, micro_batch_imgs=2)
        return PanopticTrainer(pipe, ds, cfg, occ_level=3)

    rng = np.random.default_rng(0)
    batch = None
    t1 = build()
    stage = t1.stage_for_epoch(0)
    batch = t1.dataset.sample_batch(rng, 2, 32)
    losses_plain = t1.train_step(stage, batch)

    t2 = build()
    mesh = make_mesh(8)
    with mesh:
        t2.params = replicate_tree(t2.params, mesh)
        t2.opt_state = replicate_tree(t2.opt_state, mesh)
        t2.occ = replicate_tree(t2.occ, mesh)
        t2.lod_w = replicate_tree(t2.lod_w, mesh)
        sharded = shard_ray_batch(batch, mesh)
        losses_sharded = t2.train_step(stage, sharded)

    for k in losses_plain:
        np.testing.assert_allclose(float(losses_plain[k]),
                                   float(losses_sharded[k]), rtol=2e-3,
                                   err_msg=k)


def test_dryrun_multichip_self_contained():
    """``dryrun_multichip(8)`` must set up its own virtual CPU mesh — the driver
    runs it in a fresh process on a 1-chip host with NO env help (round-1 failure:
    MULTICHIP_r01.json rc=1 'need 8 devices, have 1')."""
    import subprocess
    import sys

    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS", "JAX_NUM_CPU_DEVICES")}
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__; __graft_entry__.dryrun_multichip(8)"],
        cwd=repo, env=env, capture_output=True, text=True, timeout=540)
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "dryrun_multichip(8): ok" in proc.stdout


def test_checkpoint_roundtrip(tmp_path):
    from pagnerf_tpu.train import checkpoint
    from tests.test_train_e2e import make_trainer

    trainer, ds = make_trainer(epochs=1)
    rng = np.random.default_rng(1)
    stage = trainer.stage_for_epoch(0)
    trainer.train_step(stage, trainer.dataset.sample_batch(rng, 2, 64))
    path = checkpoint.save_checkpoint(str(tmp_path / "m.ckpt"), trainer)

    trainer2, _ = make_trainer(epochs=1)
    checkpoint.load_checkpoint(path, trainer2, "full")
    diffs = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                         trainer.params, trainer2.params)
    assert max(jax.tree.leaves(diffs)) == 0.0
    assert trainer2.global_step == trainer.global_step

    # partial / mismatch-tolerant load (reference config_parser.py:753-776)
    trainer3, _ = make_trainer(epochs=1)
    checkpoint.load_checkpoint(path, trainer3, "params_only_ignore_missmatch")


def test_shard_ray_batch_rejects_indivisible_ray_axis():
    """A pixel-mode array whose ray axis does not divide the mesh must fail
    LOUDLY, not silently replicate (round-2 weak point #5)."""
    mesh = make_mesh(8)
    batch = {"imgs": np.random.rand(2, 7, 3).astype(np.float32),
             "cam_idx": np.array([0, 1], np.int32)}
    with pytest.raises(ValueError, match="not divisible"):
        shard_ray_batch(batch, mesh)


def test_checkpoint_persists_prune_regime(tmp_path):
    """stage_for_epoch keys post-prune sample compaction off _pruned/_occ_frac;
    a resumed post-prune checkpoint must restore them (ADVICE r2 medium #1)."""
    from pagnerf_tpu.train import checkpoint
    from tests.test_train_e2e import make_trainer

    trainer, _ = make_trainer(epochs=1)
    trainer._pruned = True
    trainer._occ_frac = 0.125
    path = checkpoint.save_checkpoint(str(tmp_path / "m.ckpt"), trainer)

    trainer2, _ = make_trainer(epochs=1)
    assert not getattr(trainer2, "_pruned", False)
    checkpoint.load_checkpoint(path, trainer2, "full")
    assert trainer2._pruned is True
    assert trainer2._occ_frac == 0.125


def test_sharded_fused_step_matches_host_loop(monkeypatch):
    """The single-dispatch fused step (scan over microbatches + in-program Adam)
    under an 8-way ray sharding matches the unsharded host-loop step: GSPMD must
    propagate the ray-axis sharding through the in-program microbatch reshape."""
    import jax.numpy as jnp

    # the env var would override BOTH configs and make the A/B vacuous
    monkeypatch.delenv("PAGNERF_FUSED_STEP", raising=False)

    from pagnerf_tpu.data.multiview import MultiviewDataset
    from pagnerf_tpu.data.synthetic import make_dataset
    from pagnerf_tpu.models.nefs import GridConfig, PanopticDeltaNeF
    from pagnerf_tpu.models.pipeline import BAPipeline
    from pagnerf_tpu.models.tracer import TracerConfig
    from pagnerf_tpu.train.trainer import PanopticTrainer, TrainerConfig

    data = make_dataset(num_views=4, width=16, height=12, num_spheres=2)
    ds = MultiviewDataset(data)
    si = ds.semantic_info

    def build(fused):
        nef = PanopticDeltaNeF(
            grid=GridConfig(grid_type="HashGrid", num_lods=2, feature_dim=2,
                            log2_table_size=8, base_resolution=4,
                            finest_resolution=8),
            num_classes=si["num_classes"], num_instances=si["num_instances"],
            hidden_dim=8, panoptic_features_type="delta")
        pipe = BAPipeline(nef, TracerConfig(num_steps=8),
                          jnp.asarray(data["view_matrices"]))
        cfg = TrainerConfig(epochs=1, batch_size=2, num_rays_sampled_per_img=32,
                            sem_epoch_start=0, inst_epoch_start=0, prune_every=-1,
                            optimize_val_extrinsics=False,
                            inst_outlier_rejection=False, micro_batch_imgs=1,
                            fused_micro_step=fused)
        return PanopticTrainer(pipe, ds, cfg, occ_level=3)

    rng = np.random.default_rng(0)
    t1 = build(False)
    stage = t1.stage_for_epoch(0)
    batch = t1.dataset.sample_batch(rng, 2, 32)   # 2 imgs, mb=1 -> scan of 2
    losses_plain = t1.train_step(stage, batch)

    t2 = build(True)
    mesh = make_mesh(8)
    with mesh:
        t2.params = replicate_tree(t2.params, mesh)
        t2.opt_state = replicate_tree(t2.opt_state, mesh)
        t2.occ = replicate_tree(t2.occ, mesh)
        t2.lod_w = replicate_tree(t2.lod_w, mesh)
        sharded = shard_ray_batch(batch, mesh)
        losses_fused = t2.train_step(stage, sharded)

    for k in losses_plain:
        np.testing.assert_allclose(float(losses_plain[k]),
                                   float(losses_fused[k]), rtol=2e-3,
                                   err_msg=k)


def test_make_mesh_rejects_too_few_devices():
    """Requesting more devices than exist must raise, not silently build a
    smaller mesh (which would train at reduced parallelism with no signal)."""
    with pytest.raises(ValueError, match="only"):
        make_mesh(1000)


def test_shard_ray_batch_replicates_per_image_matrices():
    """Per-image metadata of rank >= 2 (e.g. [B, 4, 4] view matrices) must be
    replicated, not mistaken for a mis-sized ray axis."""
    mesh = make_mesh(8)
    batch = {"imgs": np.random.rand(2, 16, 3).astype(np.float32),
             "view_mats": np.eye(4, dtype=np.float32)[None].repeat(2, 0),
             "cam_idx": np.array([0, 1], np.int32)}
    sharded = shard_ray_batch(batch, mesh)
    assert sharded["imgs"].sharding == ray_sharding(mesh)
    assert sharded["view_mats"].sharding.is_fully_replicated


def test_legacy_checkpoint_derives_real_pruned(tmp_path):
    """Checkpoints written before the round-4 ``real_pruned`` field must derive
    it from the prune schedule on load: restoring False past the real prune
    re-enters shrink-only seed refreshes that mutate the post-prune mask
    (ADVICE r4 #3 — observed to degrade the flagship 120v run on resume)."""
    import dataclasses

    import flax.serialization as flax_ser

    from pagnerf_tpu.train import checkpoint
    from pagnerf_tpu.train.checkpoint import derive_real_pruned
    from tests.test_train_e2e import make_trainer

    trainer, _ = make_trainer(epochs=1)
    trainer._pruned = True
    trainer._real_pruned = True
    trainer.epoch = 220
    path = checkpoint.save_checkpoint(str(tmp_path / "m.ckpt"), trainer)

    # strip the round-4 field to simulate a legacy checkpoint
    state = flax_ser.msgpack_restore(open(path, "rb").read())
    assert state["real_pruned"] == 1
    del state["real_pruned"]
    open(path, "wb").write(flax_ser.msgpack_serialize(state))

    trainer2, _ = make_trainer(epochs=1)
    trainer2.cfg = dataclasses.replace(trainer2.cfg, prune_every=100)
    checkpoint.load_checkpoint(path, trainer2, "full")
    assert trainer2._real_pruned is True  # epoch 220 > first real prune (100)

    # same checkpoint, schedule whose first real prune lies ahead -> False
    trainer3, _ = make_trainer(epochs=1)
    trainer3.cfg = dataclasses.replace(trainer3.cfg, prune_every=300,
                                       prune_at_epoch=-1, prune_at_start=False)
    checkpoint.load_checkpoint(path, trainer3, "full")
    assert trainer3._real_pruned is False

    # pure-schedule unit checks, incl. the exact-boundary epoch (prune fires
    # at END of epoch P, so epoch == P must NOT claim it already ran)
    cfg = trainer2.cfg
    assert derive_real_pruned(cfg, 100, True) is False
    assert derive_real_pruned(cfg, 101, True) is True
    assert derive_real_pruned(cfg, 500, False) is False


def test_shard_dispatch_is_by_key_not_shape():
    """ADVICE r4: replicated per-image metadata whose axis-1 COINCIDENTALLY
    equals the ray count (e.g. a [B, R, ...] pose/aux array not in the pixel
    modes) must replicate, not be assembled from process-local shards; a
    listed pixel mode with a mis-sized ray axis must raise."""
    from pagnerf_tpu.parallel.sharding import shard_ray_batch_host_local

    mesh = make_mesh(8)
    r = 64
    batch = {
        "imgs": np.random.rand(2, r, 3).astype(np.float32),
        # same second dim as the ray axis, but NOT a pixel mode
        "aux_per_image": np.random.rand(2, r, 4).astype(np.float32),
        "cam_idx": np.array([0, 1], np.int32),
    }
    for fn in (shard_ray_batch, shard_ray_batch_host_local):
        out = fn(batch, mesh)
        assert out["imgs"].sharding == ray_sharding(mesh)
        assert out["aux_per_image"].sharding.is_fully_replicated
        assert out["aux_per_image"].shape == (2, r, 4)

    bad = {"imgs": np.random.rand(2, r, 3).astype(np.float32),
           "semantics": np.random.randint(0, 3, (2, r + 8))}
    for fn in (shard_ray_batch, shard_ray_batch_host_local):
        with pytest.raises(ValueError):
            fn(bad, mesh)
