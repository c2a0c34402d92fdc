"""End-to-end training smoke tests on the synthetic sphere scene (SURVEY.md §4:
CPU-runnable 'minimum end-to-end slice')."""
import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from pagnerf_tpu.data.multiview import MultiviewDataset
from pagnerf_tpu.data.synthetic import make_dataset
from pagnerf_tpu.models.nefs import GridConfig, PanopticDeltaNeF
from pagnerf_tpu.models.pipeline import BAPipeline
from pagnerf_tpu.models.tracer import TracerConfig
from pagnerf_tpu.train.optimizer import OptimizerConfig
from pagnerf_tpu.train.trainer import PanopticTrainer, TrainerConfig

GRID = GridConfig(grid_type="HashGrid", num_lods=4, feature_dim=2,
                  log2_table_size=12, base_resolution=4, finest_resolution=32)


def make_trainer(**cfg_kw):
    data = make_dataset(num_views=4, width=24, height=18, num_spheres=2)
    ds = MultiviewDataset(data)
    si = ds.semantic_info
    nef = PanopticDeltaNeF(grid=GRID, num_classes=si["num_classes"],
                           num_instances=si["num_instances"], hidden_dim=16,
                           panoptic_features_type="delta")
    pipe = BAPipeline(nef, TracerConfig(num_steps=24, ray_max_travel=2.0),
                      jnp.asarray(data["view_matrices"]), anchor_frame_idxs=[0])
    defaults = dict(epochs=4, batch_size=2, num_rays_sampled_per_img=64,
                    sem_epoch_start=1, inst_epoch_start=1, valid_every=1000,
                    prune_every=-1, voxel_raymarch_epoch_start=1000,
                    optimize_val_extrinsics=False, inst_outlier_rejection=False,
                    render_batch=256)
    defaults.update(cfg_kw)
    cfg = TrainerConfig(**defaults)
    opt = OptimizerConfig(lr=5e-3, grid_lr_weight=20, delta_grid_lr_weight=20)
    return PanopticTrainer(pipe, ds, cfg, opt, occ_level=3), ds


def test_rgb_only_loss_decreases():
    trainer, ds = make_trainer(sem_epoch_start=1000, inst_epoch_start=1000)
    stage = trainer.stage_for_epoch(0)
    assert stage.channels == frozenset({"rgb"})
    rng = np.random.default_rng(0)
    losses = []
    for _ in range(12):
        batch = trainer.dataset.sample_batch(rng, 2, 64)
        out = trainer.train_step(stage, batch)
        losses.append(float(out["rgb_loss"]))
    assert losses[-1] < losses[0], f"rgb loss did not decrease: {losses}"


def test_full_panoptic_step_runs_and_stays_finite():
    trainer, ds = make_trainer()
    stage = trainer.stage_for_epoch(2)
    assert stage.use_sem and stage.use_inst
    rng = np.random.default_rng(1)
    for _ in range(2):
        batch = trainer.dataset.sample_batch(rng, 2, 64)
        out = trainer.train_step(stage, batch)
    for k, v in out.items():
        assert np.isfinite(float(v)), f"{k} not finite"
    # extrinsics moved (pose optimization active from epoch 0)
    assert float(jnp.abs(trainer.params["extrinsics"]
                         - trainer.pipeline._init_extrinsics).sum()) > 0.0


def test_val_pose_stage_freezes_nef():
    trainer, ds = make_trainer(optimize_val_extrinsics=True,
                               val_extrinsics_start=0, val_extrinsics_every=2)
    stage = trainer.stage_for_epoch(2)
    assert stage.training_val_poses
    assert not trainer.stage_for_epoch(1).training_val_poses
    import jax as _jax

    def state_by_path(state):
        from pagnerf_tpu.train.optimizer import _kp_str
        flat = _jax.tree_util.tree_flatten_with_path(state)[0]
        return {_kp_str(kp): np.asarray(leaf) for kp, leaf in flat
                if hasattr(leaf, "shape")}

    # warm the optimizer state with one unfrozen step so moments are nonzero
    rng = np.random.default_rng(2)
    trainer.train_step(trainer.stage_for_epoch(1),
                       trainer.dataset.sample_batch(rng, 2, 64))
    nef_before = _jax.tree.map(lambda x: x.copy(), trainer.params["nef"])
    ext_before = trainer.params["extrinsics"].copy()
    opt_before = state_by_path(trainer.opt_state)
    batch = trainer.dataset.sample_batch(rng, 2, 64, split="val")
    trainer.train_step(stage, batch)
    # nef params bit-identical; extrinsics of sampled val cameras moved
    diffs = _jax.tree.map(lambda a, b: float(jnp.abs(a - b).sum()),
                          nef_before, trainer.params["nef"])
    assert sum(_jax.tree.leaves(diffs)) == 0.0
    assert float(jnp.abs(ext_before - trainer.params["extrinsics"]).sum()) > 0.0
    # optimizer STATE for frozen leaves is bit-identical too (exact torch
    # requires_grad=False semantics, reference trainer.py:308,318-326): Adam
    # moments must not decay on the zeroed gradients during the frozen stage.
    opt_after = state_by_path(trainer.opt_state)
    nef_keys = [k for k in opt_before if "/nef/" in k and "count" not in k]
    assert nef_keys, "expected nef moment leaves in the optimizer state"
    warmed = any(np.abs(opt_before[k]).sum() > 0 for k in nef_keys)
    assert warmed, "warm-up step left all nef moments zero"
    for k in nef_keys:
        np.testing.assert_array_equal(
            opt_before[k], opt_after[k],
            err_msg=f"frozen optimizer state changed: {k}")


def test_prune_shrinks_occupancy():
    trainer, ds = make_trainer()
    rng = np.random.default_rng(3)
    stage = trainer.stage_for_epoch(0)
    batch = trainer.dataset.sample_batch(rng, 2, 64)
    trainer.train_step(stage, batch)
    full = int(trainer.occ.mask.sum())
    trainer.prune()
    after = int(trainer.occ.mask.sum())
    assert after < full  # untrained density ~1 < threshold -> almost all pruned


def test_batch_render_full_image():
    trainer, ds = make_trainer()
    imgs = ds.get_images("val", mip=0)
    from pagnerf_tpu.core.rays import Rays
    rays = Rays(origins=jnp.asarray(imgs["base_rays_origins"]),
                dirs=jnp.asarray(imgs["base_rays_dirs"]),
                dist_min=jnp.float32(0.0), dist_max=jnp.float32(6.0))
    rb = trainer.batch_render(rays, {"rgb", "depth"}, cam_idx=int(imgs["cam_idx"][0]))
    h, w = imgs["imgs"].shape[1:3]
    assert rb.rgb.shape == (h * w, 3)
    assert np.isfinite(np.asarray(rb.rgb)).all()


import jax  # noqa: E402


def test_masked_update_suffix_collision():
    """A non-frozen param whose path is a path-SUFFIX of a frozen one (e.g.
    frozen 'grid/tables' vs param 'ema/grid/tables') must keep updating its
    Adam moments — the frozen-state restore is anchored at moment-tree roots,
    not raw suffix matching (ADVICE r2 low #1)."""
    import optax

    from pagnerf_tpu.train.optimizer import masked_update

    params = {"grid": {"tables": jnp.ones((3,))},
              "ema": {"grid": {"tables": jnp.ones((3,))}}}
    tx = optax.adam(1e-2)
    state = tx.init(params)
    grads = jax.tree.map(jnp.ones_like, params)

    frozen_fn = lambda p: p == "grid/tables"
    updates, new_state = masked_update(tx, grads, state, params, frozen_fn)

    # frozen leaf: zero update, moments unchanged
    assert float(jnp.abs(updates["grid"]["tables"]).max()) == 0.0
    # suffix-collision leaf: nonzero update AND advanced moments
    assert float(jnp.abs(updates["ema"]["grid"]["tables"]).max()) > 0.0
    mu_new = new_state[0].mu["ema"]["grid"]["tables"]
    mu_old = state[0].mu["ema"]["grid"]["tables"]
    assert float(jnp.abs(mu_new - mu_old).max()) > 0.0
    # frozen leaf's moments restored exactly
    np.testing.assert_array_equal(np.asarray(new_state[0].mu["grid"]["tables"]),
                                  np.asarray(state[0].mu["grid"]["tables"]))


def test_seed_prune_conservative_and_enables_compaction():
    """Early occupancy seeding: trainer.prune(seed=True) on an unconverged field
    must keep at least ~seed_keep_frac of cells (never wipe the scene), leave
    the optimizer state untouched, and enable sample compaction in the next
    stage (the pre-prune regime lever, VERDICT r2 #2a)."""
    import dataclasses as _dc

    trainer, ds = make_trainer()
    trainer.cfg = _dc.replace(trainer.cfg, seed_prune_epoch=1, seed_keep_frac=0.2,
                              compact_steps_after_prune=-1,
                              packed_compaction=False)   # compact rule under test
    rng = np.random.default_rng(4)
    trainer.train_step(trainer.stage_for_epoch(0),
                       trainer.dataset.sample_batch(rng, 2, 64))
    opt_before = jax.tree.leaves(trainer.opt_state)
    trainer.prune(seed=True)
    frac = float(trainer.occ.mask.mean())
    # conservative: keep floor holds even on an unconverged density field
    assert frac >= 0.2 * 0.9, f"seed prune kept only {frac:.1%} of cells"
    assert frac < 1.0
    assert trainer._pruned
    # no optimizer re-init on seed (moments preserved)
    opt_after = jax.tree.leaves(trainer.opt_state)
    assert all(a is b or np.array_equal(np.asarray(a), np.asarray(b))
               for a, b in zip(opt_before, opt_after))
    # at this toy scale the dilated seed covers most of the 8^3 grid, and the
    # auto formula correctly declines to compact a dense field; at a
    # flagship-like sparsity the next stage must compact
    assert trainer.stage_for_epoch(2).compact_steps == 0
    trainer._occ_frac = 0.1
    stage = trainer.stage_for_epoch(2)
    assert 0 < stage.compact_steps < stage.num_steps


def test_run_epoch_triggers_seed_prune():
    import dataclasses as _dc

    trainer, ds = make_trainer(epochs=3)
    trainer.cfg = _dc.replace(trainer.cfg, seed_prune_epoch=1)
    trainer.run_epoch(0)
    assert not getattr(trainer, "_pruned", False)
    trainer.run_epoch(1)
    assert trainer._pruned


def test_fused_micro_step_matches_host_loop(monkeypatch):
    """The single-dispatch fused step (scan over microbatches + in-program
    Adam) must produce the same parameters and losses as the host-side
    microbatch loop: same accumulation order, same per-microbatch rng keys."""
    import jax

    # the env var would override BOTH configs and make the A/B vacuous
    monkeypatch.delenv("PAGNERF_FUSED_STEP", raising=False)

    def run(fused):
        trainer, ds = make_trainer(batch_size=4, micro_batch_imgs=2,
                                   fused_micro_step=fused)
        stage = trainer.stage_for_epoch(2)
        rng = np.random.default_rng(7)
        losses = None
        for _ in range(3):
            batch = trainer.dataset.sample_batch(rng, 4, 64)
            losses = trainer.train_step(stage, batch)
        return trainer.params, {k: float(v) for k, v in losses.items()}

    p_loop, l_loop = run(False)
    p_fused, l_fused = run(True)
    assert set(l_loop) == set(l_fused)
    for k in l_loop:
        np.testing.assert_allclose(l_fused[k], l_loop[k], rtol=1e-5, atol=1e-6)
    flat_a = jax.tree_util.tree_leaves(p_loop)
    flat_b = jax.tree_util.tree_leaves(p_fused)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-5, atol=1e-6)


def test_fused_micro_step_val_pose_stage_freezes_nef(monkeypatch):
    """On a frozen val-pose epoch (training_val_poses) the fused step's
    in-program masked Adam must behave exactly like the host loop's: only
    extrinsics move, nef params and their optimizer moments stay untouched."""
    import jax

    monkeypatch.delenv("PAGNERF_FUSED_STEP", raising=False)

    def run(fused):
        trainer, ds = make_trainer(batch_size=2, micro_batch_imgs=1,
                                   fused_micro_step=fused,
                                   optimize_val_extrinsics=True,
                                   val_extrinsics_start=2,
                                   val_extrinsics_every=2)
        stage = trainer.stage_for_epoch(2)
        assert stage.training_val_poses
        nef_before = jax.tree_util.tree_leaves(trainer.params["nef"])
        rng = np.random.default_rng(11)
        for _ in range(2):
            batch = trainer.dataset.sample_batch(rng, 2, 64, split="val")
            losses = trainer.train_step(stage, batch)
        nef_after = jax.tree_util.tree_leaves(trainer.params["nef"])
        for a, b in zip(nef_before, nef_after):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        return (np.asarray(trainer.params["extrinsics"]),
                {k: float(v) for k, v in losses.items()})

    ext_loop, l_loop = run(False)
    ext_fused, l_fused = run(True)
    for k in l_loop:
        np.testing.assert_allclose(l_fused[k], l_loop[k], rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(ext_fused, ext_loop, rtol=1e-5, atol=1e-7)


def test_fused_micro_step_single_microbatch():
    """num_micro == 1 skips the scan but still fuses grad + Adam in one call."""
    trainer, ds = make_trainer(batch_size=2, micro_batch_imgs=2,
                               fused_micro_step=True)
    stage = trainer.stage_for_epoch(0)
    rng = np.random.default_rng(3)
    losses = []
    for _ in range(6):
        batch = trainer.dataset.sample_batch(rng, 2, 64)
        losses.append(float(trainer.train_step(stage, batch)["rgb_loss"]))
    assert losses[-1] < losses[0]


def test_dispatch_ahead_matches_per_step_sync():
    """Pipelined loss readback (dispatch_ahead > 0) must yield the same epoch
    totals as the old per-step float() sync: readback depth only changes WHEN
    the host reads losses, never the params/loss dependency chain."""
    def run(depth):
        trainer, ds = make_trainer(epochs=2, dispatch_ahead=depth)
        return trainer.run_epoch(0), trainer.run_epoch(1)

    t0_sync, t1_sync = run(0)
    t0_pipe, t1_pipe = run(3)
    assert t0_sync.keys() == t0_pipe.keys()
    for k in t0_sync:
        np.testing.assert_allclose(t0_pipe[k], t0_sync[k], rtol=1e-6,
                                   err_msg=f"epoch-0 {k}")
        np.testing.assert_allclose(t1_pipe[k], t1_sync[k], rtol=1e-6,
                                   err_msg=f"epoch-1 {k}")


def test_packed_render_never_truncates_dense_chunks():
    """ADVICE r4 (medium): render chunks are CONTIGUOUS image rays, so a
    geometry-dense chunk can exceed the training pack budget (a CLT bound that
    only holds for iid random batches) — batch_render must grow the chunk's
    buffer from its own valid count instead of letting the water-fill silently
    drop occupied samples. Packed render output must equal the dense render
    bit-for-bit in every channel (the reference's ragged layout never drops
    occupied samples, panoptic_packed_rf_tracer.py:85-114)."""
    import dataclasses as dc

    from pagnerf_tpu.core.rays import Rays
    from pagnerf_tpu.train.trainer import StageConfig

    trainer, ds = make_trainer(render_batch=64)
    # a couple of steps so density is non-trivial
    rng = np.random.default_rng(7)
    stage = trainer.stage_for_epoch(0)
    for _ in range(3):
        trainer.train_step(stage, trainer.dataset.sample_batch(rng, 2, 64))

    imgs = ds.get_images("val", mip=0)
    rays = Rays(origins=jnp.asarray(imgs["base_rays_origins"]),
                dirs=jnp.asarray(imgs["base_rays_dirs"]),
                dist_min=jnp.float32(0.0), dist_max=jnp.float32(6.0))
    chans = {"rgb", "depth", "semantics"}

    def mk_stage(pack):
        return StageConfig(channels=frozenset(chans), raymarch_type="ray",
                           num_steps=24, compact_steps=0, pack_steps=pack,
                           use_sem=True, use_inst=False,
                           use_inst_segment_reg=False,
                           training_val_poses=False, extrinsics_on=False)

    cam = int(imgs["cam_idx"][0])
    dense = trainer.batch_render(rays, chans, cam_idx=cam,
                                 stage_cfg=mk_stage(0))
    # pack budget of 8/24 steps: without count-driven growth, full-occupancy
    # chunks (every ray marches the whole scene pre-prune) would truncate
    # 2/3 of their valid samples
    packed = trainer.batch_render(rays, chans, cam_idx=cam,
                                  stage_cfg=mk_stage(8))
    for ch in ("rgb", "depth", "semantics"):
        np.testing.assert_allclose(
            np.asarray(getattr(packed, ch)), np.asarray(getattr(dense, ch)),
            rtol=3e-5, atol=3e-6,
            err_msg=f"packed render diverged from dense on {ch}")


def test_prune_reinit_preserves_lr_schedule_count():
    """The optimizer re-init after a real prune must reset the Adam moments
    (reference trainer.py:357-358) but NOT the optax update count — schedules
    read the count from the optimizer state, so a plain tx.init would
    silently re-raise every decayed LR to its epoch-0 value at each prune
    (measured on the flagship 120v run: the epoch-200 prune re-raised lr 4x
    and the panoptic phase degraded monotonically afterwards)."""
    from pagnerf_tpu.train.optimizer import OptimizerConfig

    trainer, ds = make_trainer()
    trainer.opt_cfg = dataclasses.replace(
        trainer.opt_cfg, use_lr_scheduler=True, lr_scheduler_type="step",
        lr_step_size=1, lr_step_gamma=0.5)
    from pagnerf_tpu.train.optimizer import build_optimizer
    trainer.tx = build_optimizer(trainer.opt_cfg, trainer.params)
    trainer.opt_state = trainer.tx.init(trainer.params)

    rng = np.random.default_rng(11)
    stage = trainer.stage_for_epoch(0)
    for _ in range(5):
        trainer.train_step(stage, trainer.dataset.sample_batch(rng, 2, 64))

    def counts_and_moments(state):
        flat = jax.tree_util.tree_flatten_with_path(state)[0]
        counts, mom = [], 0.0
        for kp, leaf in flat:
            keys = [str(getattr(k, "name", getattr(k, "key", ""))) for k in kp]
            if keys[-1] == "count":
                counts.append(int(leaf))
            elif "mu" in keys or "nu" in keys:
                mom += float(jnp.abs(leaf).sum())
        return counts, mom

    before_counts, before_mom = counts_and_moments(trainer.opt_state)
    assert before_counts and max(before_counts) == 5
    assert before_mom > 0.0

    trainer.prune()
    after_counts, after_mom = counts_and_moments(trainer.opt_state)
    assert after_counts and all(c == 5 for c in after_counts), after_counts
    assert after_mom == 0.0   # moments DID reset (reference semantics)
