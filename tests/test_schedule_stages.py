"""The compressed full-schedule config (configs/synthetic/schedule.yaml) must
exercise every stage transition of the reference's best.yaml regime
(reference pc_nerf/trainer.py:302-366): prune epochs, the ray->voxel raymarch
switch, post-prune sample compaction, sem/inst head activation, alternating
frozen val-pose epochs, and LoD annealing."""
import numpy as np

from pagnerf_tpu.config.config import parse_options
from pagnerf_tpu.config.factory import get_modules_from_config

SHRINK = [  # keep the stage *schedule* but shrink the compute for CPU
    "--capacity-log-2", "10", "--delta-capacity-log-2", "10",
    "--num-lods", "4", "--hidden-dim", "16",
    "--num-rays-sampled-per-img", "16", "--render-batch", "64",
    "--synthetic-res", "24", "18", "--synthetic-num-views", "6",
]


def build():
    args = parse_options(["--config", "configs/synthetic/schedule.yaml"] + SHRINK)
    _, _, trainer = get_modules_from_config(args)
    return trainer


def test_schedule_exercises_every_transition():
    trainer = build()
    cfg = trainer.cfg
    stages = {e: trainer.stage_for_epoch(e) for e in range(cfg.epochs)}

    # 1. rgb-only warmup on ray marching, no compaction
    assert stages[0].channels == frozenset({"rgb"})
    assert stages[0].raymarch_type == "ray" and stages[0].compact_steps == 0

    # 2. prune epochs fire (prune_every), incl. before the voxel switch — the
    #    first prune lands 1/3 through, matching the reference's 201/800 pacing
    #    (pruning an unconverged density field wipes the scene)
    prune_epochs = [e for e in range(cfg.epochs) if trainer.should_prune(e)]
    assert prune_epochs and prune_epochs[0] == cfg.prune_every
    assert len(prune_epochs) >= 2
    assert cfg.prune_every >= cfg.epochs // 4

    # 3. ray->voxel switch right after the first prune
    sw = cfg.voxel_raymarch_epoch_start
    assert sw == cfg.prune_every
    assert stages[sw].raymarch_type == "ray"
    assert stages[sw + 1].raymarch_type == "voxel"
    assert stages[sw + 1].num_steps == cfg.samples_per_voxel * 128
    # regression: the SDF-only --samples-per-voxel flag (default 256) must NOT
    # leak into voxel marching (256*128 steps/ray was a 34 GB program)
    assert cfg.samples_per_voxel == 2 and stages[sw + 1].num_steps == 256

    # 4a. post-prune PACKED layout (the round-4 default) activates in stages
    #     built after a prune, budgeted at the batch-mean valid count
    #     (1.15 * occ * S rounded up to 8) — ops/packed.py
    import dataclasses as _dc
    trainer._pruned = True
    trainer._occ_frac = 0.10
    post = trainer.stage_for_epoch(sw + 1)
    assert post.pack_steps == 32 and post.compact_steps == 0
    trainer._occ_frac = 0.45
    post = trainer.stage_for_epoch(sw + 1)
    assert post.pack_steps == 136 and post.compact_steps == 0
    trainer._occ_frac = 0.95
    post = trainer.stage_for_epoch(sw + 1)
    # degenerate pack budget falls through to the compact rule, which also
    # declines on a 95%-dense field: no truncation of any kind
    assert post.pack_steps == 0 and post.compact_steps == 0

    # 4b. with packing disabled, per-ray compaction applies, with a static
    #     budget scaled to the measured occupancy (a dense field must not
    #     truncate rays; a sparse one compacts aggressively)
    trainer.cfg = _dc.replace(trainer.cfg, packed_compaction=False)
    trainer._occ_frac = 0.10
    post = trainer.stage_for_epoch(sw + 1)
    assert post.compact_steps == post.num_steps // 4          # sparse: floor S/4
    assert post.pack_steps == 0
    trainer._occ_frac = 0.45
    post = trainer.stage_for_epoch(sw + 1)
    assert post.num_steps // 4 < post.compact_steps < post.num_steps
    trainer._occ_frac = 0.95
    post = trainer.stage_for_epoch(sw + 1)
    assert post.compact_steps == 0                            # dense: no benefit
    trainer.cfg = _dc.replace(trainer.cfg, packed_compaction=True)
    trainer._pruned = False
    del trainer._occ_frac

    # 5. sem/inst heads activate after sem_epoch_start (a val-pose epoch
    #    suppresses the heads, so take the first eligible non-val-pose epoch)
    s0 = cfg.sem_epoch_start
    first_pan = next(e for e in range(s0, cfg.epochs)
                     if not stages[e].training_val_poses)
    assert not stages[s0 - 1].use_sem and not stages[s0 - 1].use_inst
    assert stages[first_pan].use_sem and stages[first_pan].use_inst
    assert {"rgb", "semantics", "inst_embedding",
            "depth"} <= set(stages[first_pan].channels)

    # 6. alternating frozen val-pose epochs
    val_pose_epochs = [e for e, s in stages.items() if s.training_val_poses]
    expect = [e for e in range(cfg.val_extrinsics_start, cfg.epochs)
              if e % cfg.val_extrinsics_every == 0]
    assert val_pose_epochs == expect and len(val_pose_epochs) >= 3
    for e in val_pose_epochs:
        assert stages[e].channels == frozenset({"rgb"})  # heads off while frozen

    # 7. LoD annealing enabled and produces evolving weights across the schedule
    assert cfg.lod_anneling
    from pagnerf_tpu.utils.lod_annealing import lod_weights
    g = trainer.pipeline.nef.grid
    w_early = lod_weights(0, g.num_lods, g.feature_dim,
                          cfg.lod_annel_epochs, trainer.steps_per_epoch)
    w_late = lod_weights(cfg.lod_annel_epochs * trainer.steps_per_epoch,
                         g.num_lods, g.feature_dim,
                         cfg.lod_annel_epochs, trainer.steps_per_epoch)
    assert np.sum(w_early) < np.sum(w_late)  # coarse-to-fine ramp
    assert np.all(w_late > 0.95)  # tanh window is asymptotic, not exactly 1

    # 8. final epochs: voxel marching, all heads, full channel set
    last = stages[cfg.epochs - 1]
    assert last.raymarch_type == "voxel" and last.use_sem and last.use_inst


def test_seed_refresh_schedule():
    """seed_refresh_every re-runs the conservative seed prune on its cadence
    between the first seed and the reference's real prune — with the tighter
    refresh keep floor — then stops forever once the real prune fires
    (trainer.maybe_seed_prune)."""
    import dataclasses

    trainer = build()
    trainer.cfg = dataclasses.replace(trainer.cfg, seed_prune_epoch=4,
                                      seed_refresh_every=10,
                                      seed_refresh_keep_frac=0.03)
    calls = []

    def fake_prune(seed=False, keep_frac=None, chunk=65536, refresh=False):
        calls.append((seed, keep_frac, refresh))
        trainer._pruned = True
        if not seed:
            trainer._real_pruned = True

    trainer.prune = fake_prune
    for e in range(40):
        trainer.maybe_seed_prune(e)
        if e == 30:   # the reference's real prune
            trainer.prune(seed=False)
    # first seed at 4 (default floor + dilation margin), refreshes at 14 and
    # 24 (tight floor, refresh=True -> NO re-dilation: re-adding the shell
    # each refresh ratchets occupancy up instead of tracking it down);
    # 34 is suppressed by the real prune at 30
    assert calls == [(True, None, False), (True, 0.03, True),
                     (True, 0.03, True), (False, None, False)]

    # refresh results drive the packed budget through stage_for_epoch
    trainer._occ_frac = 0.25
    wide = trainer.stage_for_epoch(trainer.cfg.voxel_raymarch_epoch_start + 1)
    trainer._occ_frac = 0.05
    tight = trainer.stage_for_epoch(trainer.cfg.voxel_raymarch_epoch_start + 1)
    assert 0 < tight.pack_steps < wide.pack_steps

    # off by default: the flag must be opt-in (schedule parity with round 3)
    t2 = build()
    assert t2.cfg.seed_refresh_every == 0


def test_rgb_only_stage_never_touches_panoptic_params():
    """The schedule-weighted benchmark credits rgb-only epochs (the reference's
    epochs < sem/inst_epoch_start — 600 of 801) with skipping the delta grid
    and panoptic heads entirely. Guard that claim: an rgb-only stage's gradient
    is EXACTLY zero for the delta grid and sem/inst decoders, and nonzero for
    them once the heads are on."""
    import jax
    import jax.numpy as jnp

    trainer = build()
    rng = np.random.default_rng(0)
    batch = trainer.dataset.sample_batch(rng, 2, 16)
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    key = jax.random.PRNGKey(0)

    def grads_for(stage):
        def loss_fn(p):
            return trainer._compute_losses(p, batch, stage, key, trainer.occ,
                                           trainer.lod_w)
        return jax.grad(loss_fn, has_aux=True)(trainer.params)[0]

    def leaf_norms(grads, substr):
        flat = jax.tree_util.tree_flatten_with_path(grads)[0]
        vals = [float(jnp.abs(v).sum()) for path, v in flat
                if substr in jax.tree_util.keystr(path)]
        assert vals, f"no params matching {substr!r}"
        return vals

    rgb_stage = trainer.stage_for_epoch(0)
    assert rgb_stage.channels == frozenset({"rgb"})
    g = grads_for(rgb_stage)
    for name in ("delta_grid", "decoder_sem", "decoder_inst"):
        assert all(v == 0.0 for v in leaf_norms(g, name)), name
    assert any(v > 0.0 for v in leaf_norms(g, "grid"))

    pan_stage = trainer.stage_for_epoch(trainer.cfg.epochs - 1)
    assert pan_stage.use_sem and pan_stage.use_inst
    gp = grads_for(pan_stage)
    for name in ("delta_grid", "decoder_sem", "decoder_inst"):
        assert any(v > 0.0 for v in leaf_norms(gp, name)), name
