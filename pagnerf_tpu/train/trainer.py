"""Panoptic trainer.

TPU-native equivalent of the reference ``PanopticTrainer``
(/root/reference/pc_nerf/trainer.py) and the wisp BaseTrainer epoch loop it extends.

Architecture: all epoch-dependent behaviour (channel sets, loss gating, raymarch mode
switch, val-pose-only epochs — reference trainer.py:302-327,362-366,400-432) is folded
into a hashable ``StageConfig``. The train step is jitted once per distinct stage
(a handful across an 800-epoch run) and is otherwise a single fused XLA program:
pose transform -> raymarch -> NeF -> compositing -> losses -> grads -> Adam. There is
NO host round-trip in the hot path: where the reference leaves the GPU for scipy's
Hungarian solve (SURVEY.md §3.1), the assignment runs as a device-side exact
Jonker-Volgenant solver (ops/assignment.py) — axon's PJRT runtime has no host
callbacks (CLAUDE.md rule 3).
"""
from __future__ import annotations

import dataclasses
import logging
import os
import time
from functools import partial
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..core.camera import rays_to_3d_points
from ..core.rays import Rays
from ..data.multiview import MultiviewDataset
from ..losses.lin_assignment import (lin_assignment_loss,
                                     lin_assignment_things_loss)
from ..losses.photometric import rgb_l1_loss, semantic_loss
from ..losses.regularizers import (grid_tv_l1_loss, grid_tv_l2_loss,
                                   segment_consistency_regularizer)
from ..losses.sup_contrastive import sup_contrastive_loss
from ..models.pipeline import BAPipeline, Pipeline
from ..models.tracer import TracerConfig
from ..ops.occupancy import OccupancyGrid
from ..ops.raymarch import raymarch
from ..train.optimizer import OptimizerConfig, build_optimizer, masked_update
from ..utils.lod_annealing import constant_lod_weights, lod_weights

log = logging.getLogger(__name__)


@dataclasses.dataclass(frozen=True)
class TrainerConfig:
    """Reference 'trainer'/'optimizer' config groups (defaults = best.yaml)."""

    epochs: int = 800
    batch_size: int = 6
    num_rays_sampled_per_img: int = 4096

    rgb_weight: float = 10.0
    sem_weight: float = 0.1
    sem_epoch_start: int = 601
    sem_conf_enable: bool = False
    sem_temperature: float = 1.0
    sem_softmax: bool = True
    sem_segment_reg_weight: float = 0.0
    contrast_sem_weight: float = 0.0

    inst_loss: str = "linear_assignment_things"
    inst_weight: float = 1000.0
    inst_epoch_start: int = 601
    inst_conf_enable: bool = False
    inst_outlier_rejection: bool = True
    inst_segment_reg_weight: float = 1.0
    inst_temperature: float = 0.07
    base_temperature: float = 0.07
    inst_pn_ratio: float = 0.5

    optimize_extrinsics: bool = True
    extrinsics_epoch_start: int = 0
    extrinsics_epoch_end: int = -1
    optimize_val_extrinsics: bool = True
    val_extrinsics_start: int = 1
    val_extrinsics_end: int = -1
    val_extrinsics_every: int = 10

    prune_every: int = 201
    prune_at_epoch: int = -1
    prune_at_start: bool = False
    # robustness over the reference's single-sample prune (see prune()): max of
    # K jittered density samples per cell, then a 1-cell mask dilation margin
    prune_samples_per_cell: int = 4
    prune_dilate: int = 1
    # shrink-only prune masks (reference kaolin-SPC parity; see prune()):
    # dead cells can only re-enter through the post-AND dilation margin
    prune_monotone: bool = True
    voxel_raymarch_epoch_start: int = 201
    samples_per_voxel: int = 2

    grid_tvl1_reg: float = 0.0
    grid_tvl2_reg: float = 0.0
    delta_grid_tvl1_reg: float = 0.0
    delta_grid_tvl2_reg: float = 0.0
    tv_window_size: float = 0.0001
    tv_edge_num_samples: int = 100

    lod_anneling: bool = False
    lod_annel_epochs: int = 400
    lod_annel_epoch_start: int = 0

    # Per-ray sample compaction once occupancy is sparse (after the first prune):
    # -1 = auto (num_steps // 4), 0 = disabled (see TracerConfig.compact_steps).
    compact_steps_after_prune: int = -1

    # Cross-ray PACKED sample layout after the prune (TracerConfig.pack_steps,
    # ops/packed.py): replaces per-ray compaction with one [B] buffer sized
    # for the batch MEAN valid count (1.15 x occ_frac x num_steps per ray,
    # rounded up to 8) instead of compact's per-ray tail budget. Default ON
    # since round 4: TPU-validated at flagship scale (scripts/
    # packed_parity_tpu.py — loss trajectories match the compacted path
    # step-for-step within 2.3%, throughput 1.54x at the deployed 25%
    # occupancy and larger at sparse fields; BENCH_r04). This is the TPU
    # equivalent of the reference's ragged packed tensors
    # (tracers/panoptic_packed_rf_tracer.py:85-114).
    # Env override: PAGNERF_PACKED=0/1.
    packed_compaction: bool = True

    # Early occupancy seeding: a CONSERVATIVE prune (extra mask dilation, no
    # optimizer re-init, generous keep floor) after a few warm-up epochs, so
    # sample compaction covers most of the long pre-prune regime too. The
    # packed CUDA reference gets empty-space skipping from its ragged layout
    # for the whole schedule (panoptic_packed_rf_tracer.py:85-109); the dense
    # TPU layout recovers it through occupancy + compaction, which otherwise
    # only start at the reference's late prune epoch (201 of 800). -1 = off.
    seed_prune_epoch: int = -1
    # floor on the kept-cell fraction for the seed prune: if thresholding keeps
    # fewer cells (unconverged density field), keep the top seed_keep_frac
    # densest instead — a too-aggressive early prune wipes the scene
    # (docs/convergence diagnosis #2)
    seed_keep_frac: float = 0.2
    # Refresh the seeded occupancy every N epochs until the reference's real
    # prune fires: the CUDA reference's instant-ngp-style occupancy bitfield
    # updates every few steps (kaolin-wisp accelstructs), so a one-shot seed
    # that freezes occupancy at its epoch-20 estimate for 180 epochs is LESS
    # faithful than tracking the converging field — and it strands the packed
    # layout's sample budget at the seed-time occupied fraction (~25%) when
    # the field may have converged to a few percent. Each refresh re-runs the
    # conservative seed prune (revival-safe: density is re-evaluated at ALL
    # cells, occupancy.update_from_density); the pack/compact budgets follow
    # the measured occupancy into the next stage. 0 = off.
    seed_refresh_every: int = 0
    # keep floor for REFRESHES (the first seed's generous seed_keep_frac floor
    # protects an unconverged field; by refresh time thresholding is
    # trustworthy, so only a scene-wipe guard remains)
    seed_refresh_keep_frac: float = 0.02

    # wisp-stock multi-LoD training: zero the feature weights of levels above a
    # random cutoff each step (reference --random-lod flag). Implemented through the
    # lod_weights input, so it never retraces.
    random_lod: bool = False

    # Gradient accumulation: the step is compiled per image-microbatch and grads are
    # accumulated across microbatches. Bounds peak HBM to one microbatch's
    # activations with a simple (non-nested) program structure; per-image losses
    # (linear assignment, segment reg) stay exact because microbatching is along the
    # image axis. 0 = whole batch in one program.
    micro_batch_imgs: int = 1

    # Fuse the whole optimisation step (all microbatches + grad accumulation +
    # Adam) into ONE jitted program: the microbatch loop becomes a lax.scan
    # whose carry is the gradient pytree, so peak HBM stays at one microbatch
    # while the per-dispatch overhead (significant on the remote axon tunnel:
    # num_micro grad dispatches + accum + apply per step) collapses to a single
    # dispatch. Bit-equivalent to the host loop (same accumulation order, same
    # per-microbatch rng keys). Env override: PAGNERF_FUSED_STEP=0/1.
    fused_micro_step: bool = False

    # Pipelined loss readback in run_epoch: keep up to this many steps'
    # loss dicts in flight before forcing a host read, so batch sampling and
    # step dispatch overlap with device execution (each step depends on the
    # previous params, so the device still executes strictly in order — this
    # only hides host time and the axon tunnel round-trip behind it).
    # 0 = read every step's losses immediately (old behaviour; useful when
    # hunting NaNs, since errors surface at the offending step).
    dispatch_ahead: int = 4

    valid_every: int = 100
    render_batch: int = 8000
    val_mip: int = 2
    inst_num_dilations: int = 1
    # validation cleanup small-mask threshold (reference hardcodes 100 px for
    # 1280x720; scale with resolution — see config.py inst-min-mask-px)
    inst_min_mask_px: int = 100
    num_val_frames_to_save: int = 1
    render_val_labels: bool = True
    # --log-2d: mirror saved validation frames to TensorBoard images
    # (reference config_parser.py:365; validation.evaluate_metrics)
    log_2d: bool = False
    save_preds: bool = False
    save_grid: bool = False
    num_clustering_samples: int = 20000
    low_res_val: bool = False
    seed: int = 0


def snap_microbatch(batch_size: int, micro_batch_imgs: int) -> int:
    """Largest divisor of ``batch_size`` that is <= ``micro_batch_imgs``.

    Microbatches must tile the batch exactly: a wrapped remainder slice would
    re-include (double-count) images under the uniform 1/num_micro grad average,
    and a different-sized remainder program would double the (expensive on axon)
    compile. Snapping keeps gradients exact with one compiled program."""
    mb = max(1, min(micro_batch_imgs, batch_size))
    while batch_size % mb != 0:
        mb -= 1
    return mb


@dataclasses.dataclass(frozen=True)
class StageConfig:
    """Static per-epoch snapshot keying the jitted step."""

    channels: frozenset
    raymarch_type: str
    num_steps: int
    compact_steps: int
    pack_steps: int
    use_sem: bool
    use_inst: bool
    use_inst_segment_reg: bool
    training_val_poses: bool
    extrinsics_on: bool


class PanopticTrainer:
    """Epoch-driven trainer over a (BA)Pipeline and a MultiviewDataset."""

    def __init__(self, pipeline: Pipeline, dataset: MultiviewDataset,
                 cfg: TrainerConfig = TrainerConfig(),
                 opt_cfg: OptimizerConfig = OptimizerConfig(),
                 occ_level: int = 7):
        self.pipeline = pipeline
        self.dataset = dataset
        self.cfg = cfg
        steps = dataset.steps_per_epoch(cfg.batch_size)
        self.opt_cfg = dataclasses.replace(opt_cfg, num_epochs=cfg.epochs,
                                           steps_per_epoch=steps)
        self.steps_per_epoch = steps

        self.rng = np.random.default_rng(cfg.seed)
        key = jax.random.PRNGKey(cfg.seed)
        self.params = pipeline.init(key)
        self.tx = build_optimizer(self.opt_cfg, self.params)
        self.opt_state = self.tx.init(self.params)
        self.occ = OccupancyGrid.create(level=occ_level)
        nef = pipeline.nef
        self.lod_w = jnp.asarray(constant_lod_weights(nef.grid.num_lods,
                                                      nef.grid.feature_dim))
        self.epoch = 0
        self.global_step = 0
        self.training_time = 0.0
        # inactive by default, as the reference threads it (pc_nerf/trainer.py:393);
        # activated by the --perf flag via the factory
        from ..utils.logging_utils import PerfTimer
        self.timer = PerfTimer(activate=False)
        self.log_dict: Dict[str, float] = {}
        self._step_key = jax.random.PRNGKey(cfg.seed + 1)

        si = dataset.semantic_info
        self.num_classes = si["num_classes"]
        self.num_instances = si["num_instances"]
        self.stuff_ids = tuple(si["stuff_ids"])
        self._train_step_cache: Dict[StageConfig, callable] = {}

        ee = cfg.extrinsics_epoch_end if cfg.extrinsics_epoch_end >= 0 else cfg.epochs
        ve = cfg.val_extrinsics_end if cfg.val_extrinsics_end >= 0 else cfg.epochs
        self._extrinsics_end = ee
        self._val_extrinsics_end = ve

    # ------------------------------------------------------------- stages
    def stage_for_epoch(self, epoch: int) -> StageConfig:
        cfg = self.cfg
        training_val_poses = (cfg.optimize_val_extrinsics
                              and isinstance(self.pipeline, BAPipeline)
                              and cfg.val_extrinsics_start <= epoch <= self._val_extrinsics_end
                              and epoch % cfg.val_extrinsics_every == 0)
        use_sem = (epoch >= cfg.sem_epoch_start and cfg.sem_weight > 0
                   and "semantics" in self.dataset.data and not training_val_poses)
        use_inst = (epoch >= cfg.inst_epoch_start and epoch >= cfg.sem_epoch_start
                    and cfg.inst_weight > 0 and bool(cfg.inst_loss)
                    and "instance" in self.dataset.data and not training_val_poses)
        channels = {"rgb"}
        if use_sem:
            channels.add("semantics")
        if use_inst:
            channels.add("inst_embedding")
        if cfg.inst_outlier_rejection and use_inst:
            channels.add("depth")
        voxel = epoch > cfg.voxel_raymarch_epoch_start
        base = self.pipeline.tracer_cfg
        # Voxel-mode budget: samples_per_voxel per cell over the ray_max_travel
        # span the marcher actually refits samples into (ops/raymarch.py:130-131;
        # cell size = 2/res over the [-1,1] cube). At the defaults (travel 2.0,
        # occ level 7) this is the 2*128=256 the reference marches; deriving it
        # keeps the density correct when occ_level or max_travel differ.
        if voxel:
            travel = min(base.ray_max_travel, 2.0)
            num_steps = max(1, int(round(
                cfg.samples_per_voxel * travel * self.occ.res / 2.0)))
        else:
            num_steps = base.num_steps
        compact = 0
        pack = 0
        packed_on = os.environ.get("PAGNERF_PACKED",
                                   "1" if cfg.packed_compaction else "0") == "1"
        if getattr(self, "_pruned", False) and packed_on:
            # packed layout: budget per ray = batch mean valid count (the
            # occupied volume fraction is the line average) + 15% CLT margin
            frac = getattr(self, "_occ_frac", 0.25)
            pack = max(8, int(np.ceil(1.15 * frac * num_steps / 8.0)) * 8)
            if pack >= num_steps:
                pack = 0   # dense field: packing would not help
        if (pack == 0 and getattr(self, "_pruned", False)
                and cfg.compact_steps_after_prune != 0):
            # Reached either with packing off, or when the packed budget
            # degenerated above (pack >= num_steps at 1.15*frac >= 1): per-ray
            # compaction self-disables later, at 2*frac >= 1, so it can still
            # win in the band between — fall through rather than run dense.
            if cfg.compact_steps_after_prune > 0:
                compact = cfg.compact_steps_after_prune
            else:
                # auto: scale the static compacted-sample budget to the measured
                # occupancy so rays are not truncated when the prune kept a dense
                # field (compacting 256 -> 64 with 90% cells occupied cuts rays
                # to a quarter of their span and corrupts training). 2x headroom
                # over the occupied fraction, floor S/4, rounded up to a multiple
                # of 16 to keep shapes compile-friendly.
                frac = getattr(self, "_occ_frac", 0.25)
                want = int(np.ceil(2.0 * frac * num_steps / 16.0)) * 16
                compact = min(num_steps, max(num_steps // 4, want))
                if compact >= num_steps:
                    compact = 0   # dense field: compaction would not help
        return StageConfig(
            channels=frozenset(channels),
            raymarch_type="voxel" if voxel else base.raymarch_type,
            num_steps=num_steps,
            compact_steps=compact,
            pack_steps=pack,
            use_sem=use_sem,
            use_inst=use_inst,
            # NOTE: the threshold is the WEIGHT, reproducing a reference quirk:
            # trainer.py:93 assigns inst_segment_reg_weight to
            # inst_segment_reg_epoch_start, so the reg activates at epoch > weight.
            use_inst_segment_reg=(cfg.inst_segment_reg_weight > 0
                                  and epoch > cfg.inst_segment_reg_weight),
            training_val_poses=training_val_poses,
            extrinsics_on=(cfg.optimize_extrinsics
                           and cfg.extrinsics_epoch_start <= epoch <= self._extrinsics_end),
        )

    # --------------------------------------------------------------- loss
    def _compute_losses(self, params, batch, stage: StageConfig, key,
                        occ: OccupancyGrid, lod_w) -> tuple:
        cfg = self.cfg
        tracer_cfg = dataclasses.replace(self.pipeline.tracer_cfg,
                                         raymarch_type=stage.raymarch_type,
                                         num_steps=stage.num_steps,
                                         compact_steps=stage.compact_steps,
                                         pack_steps=stage.pack_steps)
        b, r = batch["imgs"].shape[:2]
        base_rays = Rays(origins=batch["base_rays_origins"],
                         dirs=batch["base_rays_dirs"],
                         dist_min=jnp.float32(0.0), dist_max=jnp.float32(6.0))
        is_ba = isinstance(self.pipeline, BAPipeline)
        kw = dict(tracer_cfg=tracer_cfg)
        if is_ba:
            kw["cam_idx"] = batch["cam_idx"]
            rays_in = base_rays
        else:
            rays_in = Rays(origins=batch["rays_origins"].reshape(-1, 3),
                           dirs=batch["rays_dirs"].reshape(-1, 3),
                           dist_min=jnp.float32(0.0), dist_max=jnp.float32(6.0))
        rb = self.pipeline(params, rays_in, stage.channels, occ, lod_w,
                           stage="train", key=key, **kw)

        losses: Dict[str, jnp.ndarray] = {}
        total = 0.0
        if rb.ray_sparsity_loss is not None:
            total = total + rb.ray_sparsity_loss
            losses["ray_sparsity_loss"] = rb.ray_sparsity_loss

        if cfg.rgb_weight > 0.0:
            rloss = rgb_l1_loss(rb.rgb, batch["imgs"].reshape(-1, 3))
            total = total + cfg.rgb_weight * rloss
            losses["rgb_loss"] = rloss

        if stage.use_sem:
            sem_gts = batch.get("semantics_pred", batch["semantics"]).reshape(-1)
            conf = batch["sem_conf"].reshape(-1) if (
                cfg.sem_conf_enable and "sem_conf" in batch) else None
            sloss = semantic_loss(rb.semantics, sem_gts, cfg.sem_softmax,
                                  cfg.sem_temperature, conf)
            if cfg.sem_segment_reg_weight > 0.0:
                sloss = sloss + cfg.sem_segment_reg_weight * \
                    segment_consistency_regularizer(
                        (rb.semantics + 1e-27).reshape(b, r, -1),
                        sem_gts.reshape(b, r), self.num_classes)
            total = total + cfg.sem_weight * sloss
            losses["sem_loss"] = sloss
            if cfg.contrast_sem_weight > 0.0:
                # contrastive regulariser over semantic probabilities
                # (reference trainer.py:477-480)
                closs = sup_contrastive_loss(
                    (rb.semantics + 1e-27).reshape(b, r, -1),
                    sem_gts.reshape(b, r), temperature=cfg.inst_temperature,
                    base_temperature=cfg.base_temperature,
                    pn_ratio=cfg.inst_pn_ratio)
                total = total + cfg.contrast_sem_weight * closs
                losses["contrast_sem_loss"] = closs

        if stage.use_inst:
            inst_gts = batch.get("instance_pred", batch["instance"]).reshape(b, r)
            sem_gts = batch.get("semantics_pred", batch["semantics"]).reshape(b, r)
            inst_embed = rb.inst_embedding.reshape(b, r, -1)
            stuff = jnp.isin(sem_gts, jnp.asarray(self.stuff_ids))
            if cfg.inst_loss == "sup_contrastive":
                things = ~stuff
                undetected = things & (inst_gts == 0)
                iloss = sup_contrastive_loss(inst_embed, inst_gts,
                                             anchor_mask=~undetected,
                                             temperature=cfg.inst_temperature,
                                             base_temperature=cfg.base_temperature,
                                             pn_ratio=cfg.inst_pn_ratio)
            elif cfg.inst_loss == "linear_assignment":
                iloss = lin_assignment_loss(inst_embed, inst_gts, self.num_instances)
            elif cfg.inst_loss == "linear_assignment_things":
                points_3d = None
                if cfg.inst_outlier_rejection:
                    world = self.pipeline.transform_rays(params, base_rays,
                                                         batch["cam_idx"]) \
                        if is_ba else rays_in
                    points_3d = jax.lax.stop_gradient(
                        rays_to_3d_points(world, rb.depth)).reshape(b, r, 3)
                lmap = lin_assignment_things_loss(
                    inst_embed, inst_gts, stuff, self.num_instances,
                    points_3d=points_3d,
                    outlier_rejection=cfg.inst_outlier_rejection)
                if stage.use_inst_segment_reg:
                    lmap = lmap + cfg.inst_segment_reg_weight * \
                        segment_consistency_regularizer(
                            inst_embed + 1e-27, inst_gts, self.num_instances)
                if cfg.inst_conf_enable and "inst_conf" in batch:
                    lmap = lmap * batch["inst_conf"].reshape(b, r)
                iloss = lmap.mean()
            else:
                raise ValueError(f"instance loss '{cfg.inst_loss}' not supported")
            total = total + cfg.inst_weight * iloss
            losses["inst_loss"] = iloss

        # grid TV regularizers (trainer.py:556-574)
        if cfg.grid_tvl1_reg > 0.0 or cfg.grid_tvl2_reg > 0.0:
            def grid_enc(c):
                # sample-major [N, 3] adapter over the feature-major grid
                return self.pipeline.nef.apply(
                    {"params": params["nef"]}, c,
                    method=lambda m, cc: m._grid_feats(m.grid_module, cc.T, None).T)
            k1, key = jax.random.split(key)
            if cfg.grid_tvl1_reg > 0.0:
                total = total + cfg.grid_tvl1_reg * grid_tv_l1_loss(
                    grid_enc, k1, sample_size=cfg.tv_window_size,
                    num_dim_samples=cfg.tv_edge_num_samples)
            if cfg.grid_tvl2_reg > 0.0:
                total = total + cfg.grid_tvl2_reg * grid_tv_l2_loss(
                    grid_enc, k1, sample_size=cfg.tv_window_size,
                    num_dim_samples=cfg.tv_edge_num_samples)
        if cfg.delta_grid_tvl1_reg > 0.0 or cfg.delta_grid_tvl2_reg > 0.0:
            def inst_enc(c):
                out = self.pipeline.query_nef(params, c, None, {"inst_embedding"})
                return out["inst_embedding"]
            k2, key = jax.random.split(key)
            # NOTE reference parity quirk: the reference's delta-grid tvl2
            # branch ALSO calls its L1 TV loss (reference trainer.py:571-575
            # copy-paste), so both weights intentionally feed one L1 term here.
            w = cfg.delta_grid_tvl1_reg + cfg.delta_grid_tvl2_reg
            total = total + w * grid_tv_l1_loss(
                inst_enc, k2, sample_size=cfg.tv_window_size,
                num_dim_samples=cfg.tv_edge_num_samples)

        losses["total_loss"] = total
        return total, losses

    # ---------------------------------------------------------- train step
    def _make_train_step(self, stage: StageConfig):
        def frozen_fn(path: str) -> bool:
            if stage.training_val_poses:
                return not path.startswith("extrinsics")
            if path.startswith("extrinsics"):
                return not stage.extrinsics_on
            return False

        @jax.jit
        def grad_step(params, occ, lod_w, batch, key):
            def loss_fn(p):
                return self._compute_losses(p, batch, stage, key, occ, lod_w)

            (_, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
            return grads, losses

        @jax.jit
        def accum(acc_g, acc_l, grads, losses):
            return (jax.tree.map(jnp.add, acc_g, grads),
                    jax.tree.map(jnp.add, acc_l, losses))

        @jax.jit
        def apply_step(params, opt_state, grads, scale):
            grads = jax.tree.map(lambda g: g * scale, grads)
            updates, new_opt = masked_update(self.tx, grads, opt_state, params,
                                             frozen_fn,
                                             self.opt_cfg.clip_grad_norm)
            return optax.apply_updates(params, updates), new_opt

        @partial(jax.jit, static_argnums=(0,))
        def fused_step(num_micro, params, opt_state, occ, lod_w, batch, keys):
            """The whole optimisation step as ONE program: scan over image
            microbatches (carry = gradient pytree, so per-microbatch
            activations are freed each iteration — plain scan, NO remat, which
            keeps clear of the scan+remat compile pathology) followed by the
            masked Adam update. Accumulation order and rng keys match the host
            loop exactly."""
            b = batch["imgs"].shape[0]
            mb = b // num_micro
            per_img = {k: v.reshape((num_micro, mb) + v.shape[1:])
                       for k, v in batch.items()
                       if getattr(v, "ndim", 0) >= 1 and v.shape[0] == b}
            shared = {k: v for k, v in batch.items() if k not in per_img}

            def micro(sub_s, key):
                sub = dict(shared, **sub_s)

                def loss_fn(p):
                    return self._compute_losses(p, sub, stage, key, occ, lod_w)

                (_, losses), grads = jax.value_and_grad(
                    loss_fn, has_aux=True)(params)
                return grads, losses

            if num_micro == 1:
                acc_g, acc_l = micro({k: v[0] for k, v in per_img.items()},
                                     keys[0])
            else:
                # scan ALL microbatches from a zeros carry: peeling the first
                # iteration outside the scan would emit a SECOND full copy of
                # the fwd+bwd graph in the same program (no CSE across a scan
                # boundary) — ~2x the compile time on the slow axon toolchain.
                # zeros + g0 == g0 exactly, so accumulation parity with the
                # host loop is preserved.
                g_sh, l_sh = jax.eval_shape(
                    micro, {k: v[0] for k, v in per_img.items()}, keys[0])
                zeros = lambda tree: jax.tree.map(
                    lambda s: jnp.zeros(s.shape, s.dtype), tree)

                def body(carry, xs):
                    g, l = micro(*xs)
                    return (jax.tree.map(jnp.add, carry[0], g),
                            jax.tree.map(jnp.add, carry[1], l)), None

                (acc_g, acc_l), _ = jax.lax.scan(
                    body, (zeros(g_sh), zeros(l_sh)), (per_img, keys))
            grads = jax.tree.map(lambda g: g * (1.0 / num_micro), acc_g)
            updates, new_opt = masked_update(self.tx, grads, opt_state, params,
                                             frozen_fn,
                                             self.opt_cfg.clip_grad_norm)
            return optax.apply_updates(params, updates), new_opt, acc_l

        return grad_step, accum, apply_step, fused_step

    def _fused_step_enabled(self) -> bool:
        import os
        env = os.environ.get("PAGNERF_FUSED_STEP")
        if env is not None:
            # accept the usual truthy spellings — treating anything != "1" as
            # disable would silently override an enabled config for =true/=on
            return env.strip().lower() in ("1", "true", "yes", "on", "y")
        return self.cfg.fused_micro_step

    def train_step(self, stage: StageConfig, batch: Dict[str, np.ndarray]):
        """One optimisation step with image-axis gradient accumulation."""
        if stage not in self._train_step_cache:
            self._train_step_cache[stage] = self._make_train_step(stage)
        grad_step, accum, apply_step, fused_step = self._train_step_cache[stage]

        b = batch["imgs"].shape[0]
        mb = snap_microbatch(b, self.cfg.micro_batch_imgs or b)
        num_micro = b // mb

        if self._fused_step_enabled():
            keys = []
            for _ in range(num_micro):   # same key stream as the host loop
                self._step_key, k = jax.random.split(self._step_key)
                keys.append(k)
            dev_batch = {k: jnp.asarray(v) for k, v in batch.items()}
            self.params, self.opt_state, acc_l = fused_step(
                num_micro, self.params, self.opt_state, self.occ, self.lod_w,
                dev_batch, jnp.stack(keys))
            self.global_step += 1
            return {k: v / num_micro for k, v in acc_l.items()}

        acc_g = acc_l = None
        for m in range(num_micro):
            sl = slice(m * mb, (m + 1) * mb)
            sub = {k: jnp.asarray(v[sl]) if getattr(v, "ndim", 0) >= 1
                   and v.shape[0] == b else jnp.asarray(v)
                   for k, v in batch.items()}
            self._step_key, k = jax.random.split(self._step_key)
            grads, losses = grad_step(self.params, self.occ, self.lod_w, sub, k)
            if acc_g is None:
                acc_g, acc_l = grads, losses
            else:
                acc_g, acc_l = accum(acc_g, acc_l, grads, losses)
        self.params, self.opt_state = apply_step(self.params, self.opt_state,
                                                 acc_g, 1.0 / num_micro)
        self.global_step += 1
        return {k: v / num_micro for k, v in acc_l.items()}

    # -------------------------------------------------------------- prune
    def prune(self, chunk: int = 65536, seed: bool = False,
              keep_frac: float = None, refresh: bool = False):
        """Occupancy maintenance (reference nef.prune + optimizer re-init,
        trainer.py:336-358, panoptic_delta_nef.py:63-104).

        Deviation from the reference's single jittered sample per cell: the
        density is taken as the MAX over ``cfg.prune_samples_per_cell`` jittered
        points (default 4). One sample misses thin surfaces whose density peak
        covers a fraction of the cell, permanently punching holes into walls
        (dead cells are never marched again); extra samples cut the miss
        probability geometrically for a few seconds of prune-time compute.

        ``seed=True`` runs the conservative early-seeding variant (see
        ``seed_prune_epoch``): one extra mask dilation, a ``seed_keep_frac``
        keep floor against unconverged fields, and NO optimizer re-init (the
        table topology did not change; the re-init belongs to the reference's
        real prune)."""
        channels = ("density",)
        if "panoptic_density" in self.pipeline.nef.supported_channels():
            channels = ("density", "panoptic_density")

        @jax.jit
        def density_at(params, ptsT):
            # [3, chunk] in, transposed at the query seam (query_nef transposes
            # straight back — XLA cancels the pair); keeps the full [res^3]
            # centers array feature-major (a [2.1M, 3] operand lane-pads 42x)
            pts = ptsT.T
            dirs = jnp.ones_like(pts) / jnp.sqrt(3.0)
            out = self.pipeline.query_nef(params, pts, dirs, frozenset(channels),
                                          self.lod_w)
            d = out["density"][..., 0]
            if "panoptic_density" in out:
                d = jnp.maximum(d, out["panoptic_density"][..., 0])
            return d

        density = None
        for _ in range(max(1, getattr(self.cfg, "prune_samples_per_cell", 4))):
            self._step_key, k = jax.random.split(self._step_key)
            centersT = self.occ.cell_centers_jittered_T(k)
            n = centersT.shape[1]
            dens = []
            for i in range(0, n, chunk):
                dens.append(density_at(self.params, centersT[:, i:i + chunk]))
            d = jnp.concatenate(dens)
            density = d if density is None else jnp.maximum(density, d)
        # Refreshes (seed_refresh_every) re-measure a mask whose previous
        # dilation margin is ALREADY part of the monotone AND baseline —
        # re-dilating every refresh ratchets occupancy UP by one shell per
        # refresh instead of tracking the converging field down (measured on
        # the first 120v flagship run: seed 33.1% -> refresh 40.2%). So
        # refreshes threshold+AND only; the first seed keeps its extra margin.
        dilate = 0 if refresh else (
            getattr(self.cfg, "prune_dilate", 1) + (1 if seed else 0))
        # monotone: reference-parity shrink-only semantics (kaolin SPC octrees
        # only remove cells) — free revival re-admits zero-supervision regions
        # whose density drifted up (see occupancy.update_from_density). The
        # first prune runs from the virgin all-true mask, so monotone is a
        # no-op there by construction.
        new_occ = self.occ.update_from_density(
            density, dilate=dilate,
            monotone=getattr(self.cfg, "prune_monotone", True))
        if seed:
            frac = float(new_occ.mask.mean())
            keep = float(keep_frac if keep_frac is not None
                         else getattr(self.cfg, "seed_keep_frac", 0.2))
            if frac < keep:
                # unconverged field below the reference density threshold:
                # keep the top-keep_frac densest cells (+ dilation) instead.
                # The mask uses a strict > comparison, so step the quantile
                # down one ulp: a tie-heavy/plateau field (e.g. bf16 underflow)
                # would otherwise exclude every tied cell and the "floor"
                # could keep ~0% — the scene-wipe this path exists to prevent.
                thr = float(np.quantile(np.asarray(new_occ.occupancy), 1.0 - keep))
                thr = float(np.nextafter(thr, -np.inf))
                new_occ = new_occ.update_from_density(
                    new_occ.occupancy, decay=1.0, min_density=thr, dilate=dilate)
        self.occ = new_occ
        self._pruned = True   # enables post-prune sample compaction in new stages
        self._occ_frac = float(self.occ.mask.mean())
        if not seed:
            # optimizer re-init after topology change (trainer.py:357-358)
            self.opt_state = self._reinit_opt_state()
            self._real_pruned = True   # stops seed refreshes (seed_refresh_every)
        log.info("%spruned occupancy: %.1f%% cells occupied",
                 "seed-" if seed else "", 100 * self._occ_frac)

    def _reinit_opt_state(self):
        """Fresh optimizer moments after a topology change (the reference
        re-creates the optimizer, pc_nerf/trainer.py:357-358) WITHOUT
        restarting the LR schedules: optax schedules read the update count
        from the optimizer state, so a plain ``tx.init`` silently re-raises
        every decayed LR to its epoch-0 value at each prune. Measured on the
        flagship 120v run (use_lr_scheduler step/80/0.5): the epoch-200 prune
        re-raised lr 0.00125 -> 0.005 (grid 0.0375 -> 0.15) and the panoptic
        phase degraded monotonically afterwards (iou_gain +0.026 at epoch 199
        -> -0.014 at 239, with a clipped gradient-blowup event at 224). The
        reference never hits this because its configs keep use_lr_scheduler
        false. Moments reset; count leaves carry over."""
        def is_count(kp) -> bool:
            tail = str(getattr(kp[-1], "name", getattr(kp[-1], "key", "")))
            return tail == "count"

        flat = jax.tree_util.tree_flatten_with_path(self.opt_state)[0]
        counts = [leaf for kp, leaf in flat if is_count(kp)]
        fresh = self.tx.init(self.params)
        if not counts:
            return fresh
        count = counts[0]
        return jax.tree_util.tree_map_with_path(
            lambda kp, leaf: count.astype(leaf.dtype) if is_count(kp) else leaf,
            fresh)

    # -------------------------------------------------------------- epochs
    def should_prune(self, epoch: int) -> bool:
        cfg = self.cfg
        return ((cfg.prune_every > 0 and epoch > 0 and epoch % cfg.prune_every == 0)
                or epoch == cfg.prune_at_epoch
                or (cfg.prune_at_start and epoch == 0))

    def maybe_seed_prune(self, epoch: int) -> None:
        """Early occupancy seeding + periodic refreshes (seed_prune_epoch /
        seed_refresh_every): the first trigger runs the conservative seed
        prune; afterwards, every seed_refresh_every epochs until the
        reference's REAL prune fires, re-measure the converging field with the
        tighter refresh keep floor so the pack/compact budgets track it."""
        cfg = self.cfg
        if getattr(cfg, "seed_prune_epoch", -1) < 0:
            return
        if epoch >= cfg.seed_prune_epoch and not getattr(self, "_pruned", False):
            self.prune(seed=True)
        elif (getattr(cfg, "seed_refresh_every", 0) > 0
              and getattr(self, "_pruned", False)
              and not getattr(self, "_real_pruned", False)
              and epoch > cfg.seed_prune_epoch
              and (epoch - cfg.seed_prune_epoch) % cfg.seed_refresh_every == 0):
            self.prune(seed=True, keep_frac=cfg.seed_refresh_keep_frac,
                       refresh=True)

    def run_epoch(self, epoch: int) -> Dict[str, float]:
        cfg = self.cfg
        self.maybe_seed_prune(epoch)
        stage = self.stage_for_epoch(epoch)
        if cfg.lod_anneling and epoch >= cfg.lod_annel_epoch_start:
            nef = self.pipeline.nef
            self.lod_w = jnp.asarray(lod_weights(
                self.global_step, nef.grid.num_lods, nef.grid.feature_dim,
                cfg.lod_annel_epochs, self.steps_per_epoch))
        split = "val" if stage.training_val_poses else "train"
        totals: Dict[str, float] = {}
        t0 = time.time()
        nef = self.pipeline.nef

        # Bounded dispatch-ahead: loss dicts stay on device for up to
        # cfg.dispatch_ahead steps before the host reads them, so sampling +
        # dispatch of the next steps overlap with device execution (the
        # params dependency chain keeps execution order exact). Reading the
        # OLDEST pending dict only waits for work that is already done or
        # imminent.
        pending: list = []

        def drain(device_losses) -> None:
            for k, v in device_losses.items():
                totals[k] = totals.get(k, 0.0) + float(v)

        for _ in range(self.steps_per_epoch):
            if cfg.random_lod:
                cut = int(self.rng.integers(1, nef.grid.num_lods + 1))
                w = np.zeros(nef.grid.num_lods, np.float32)
                w[:cut] = 1.0
                self.lod_w = jnp.asarray(np.repeat(w, nef.grid.feature_dim))
            self.timer.reset()
            batch = self.dataset.sample_batch(self.rng, cfg.batch_size,
                                              cfg.num_rays_sampled_per_img, split)
            self.timer.check("data_sample")
            pending.append(self.train_step(stage, batch))
            while len(pending) > max(getattr(cfg, "dispatch_ahead", 0), 0):
                drain(pending.pop(0))
            self.timer.check("train_step")   # dispatch + amortised readback
        for device_losses in pending:
            drain(device_losses)
        for k in totals:
            totals[k] /= self.steps_per_epoch
        self.training_time += time.time() - t0
        if self.should_prune(epoch):
            self.prune()
        self.maybe_upsample_tensorf(epoch)
        self.epoch = epoch + 1
        self.log_dict = totals
        return totals

    def maybe_upsample_tensorf(self, epoch: int):
        """Progressive TensoRF VM-grid resolution steps (reference end_epoch,
        trainer.py:348-358): every num_epochs // num_resolutions epochs, bilinearly
        upsample the factor grids toward max_resolution, then re-init the optimizer
        and re-jit (param shapes changed)."""
        gc = self.pipeline.nef.grid
        if gc.grid_type != "TensoRF" or gc.num_resolutions <= 1:
            return
        every = max(self.cfg.epochs // gc.num_resolutions, 1)
        if epoch <= 0 or epoch % every != 0:
            return
        from ..models.tensorf import resolution_schedule, upsample_vm_params
        schedule = resolution_schedule(gc.resolution, gc.max_resolution,
                                       gc.num_resolutions)
        bigger = [r for r in schedule if r > self._current_tensorf_res()]
        if not bigger:
            return
        new_res = bigger[0]
        nef_params = dict(self.params["nef"])
        nef_params["grid"] = upsample_vm_params(dict(nef_params["grid"]), new_res)
        self.params = {**self.params, "nef": nef_params}
        new_grid = dataclasses.replace(gc, resolution=new_res)
        self.pipeline.nef = self.pipeline.nef.clone(grid=new_grid)
        self._train_step_cache.clear()
        self._render_cache = {}
        self.opt_state = self._reinit_opt_state()
        log.info("upsampled TensoRF resolution to %d^3", new_res)

    def _current_tensorf_res(self) -> int:
        try:
            return int(self.params["nef"]["grid"]["density_plane"].shape[-1])
        except KeyError:
            return self.pipeline.nef.grid.resolution

    def train(self, on_epoch_end=None):
        for epoch in range(self.epoch, self.cfg.epochs):
            totals = self.run_epoch(epoch)
            if on_epoch_end is not None:
                on_epoch_end(epoch, totals)

    # ----------------------------------------------------------- rendering
    def batch_render(self, rays: Rays, channels, cam_idx=None,
                     stage_cfg: Optional[StageConfig] = None):
        """Chunked full-image render (reference batch_render, trainer.py:637-649).

        Renders follow the CURRENT training stage's raymarch settings by default:
        after the ray->voxel switch the training regime marches ~3x denser steps
        and learns correspondingly thinner surfaces; rendering with the coarse
        base sampling under-samples those surfaces (rays alias straight through
        thin walls -> mottled renders, ~1-4 dB of val PSNR). The reference
        renders through the same tracer state it trains with.

        Renders ALSO carry the stage's sample-sparsity settings (compact_steps /
        pack_steps): the marched geometry is identical — compaction/packing only
        skip NeF evaluation of unoccupied samples — so serving pays the same
        ~occupancy-proportional cost as training instead of the dense budget
        (the reference's ragged packed layout gives its "Render time/img"
        metric this for free, pc_nerf/trainer.py:699-704).

        Packed renders size each chunk's buffer from the chunk's OWN valid
        count: the training budget (1.15x the global occupancy fraction) is a
        CLT bound that only holds for iid random pixel batches, while render
        chunks are CONTIGUOUS image rays — a geometry-dense chunk can exceed
        it, and ops/packed.py's water-fill would then silently drop the
        deepest valid samples chunk-wide (the reference's ragged layout never
        drops occupied samples, panoptic_packed_rf_tracer.py:85-114). A cheap
        count-only march per chunk picks the smallest doubling of the stage
        budget whose buffer fits every valid sample (zero truncation by the
        water-fill invariant: sum(counts) <= budget => cap = S); chunks denser
        than any useful packed budget render dense."""
        from ..core.render_buffer import RenderBuffer
        cfg = self.pipeline.tracer_cfg
        if stage_cfg is None:
            stage_cfg = self.stage_for_epoch(max(self.epoch - 1, 0))
        cfg = dataclasses.replace(cfg, raymarch_type=stage_cfg.raymarch_type,
                                  num_steps=stage_cfg.num_steps,
                                  compact_steps=stage_cfg.compact_steps,
                                  pack_steps=stage_cfg.pack_steps)
        flat = rays.flatten()
        n = flat.origins.shape[0]
        rbatch = self.cfg.render_batch
        is_ba = isinstance(self.pipeline, BAPipeline)
        if is_ba and cam_idx is not None:
            flat = self.pipeline.transform_rays(
                self.params, flat.reshape(1, -1), jnp.asarray([cam_idx]))
        # pad to a multiple of the render batch for static chunk shapes
        pad = (-n) % rbatch
        padded = Rays(
            origins=jnp.concatenate([flat.origins, jnp.zeros((pad, 3))]),
            dirs=jnp.concatenate([flat.dirs, jnp.ones((pad, 3))]),
            dist_min=flat.dist_min, dist_max=flat.dist_max)

        if not hasattr(self, "_render_cache"):
            self._render_cache = {}

        def chunk_fn(chunk_cfg):
            cache_key = (frozenset(channels), chunk_cfg, rbatch)
            if cache_key not in self._render_cache:
                @jax.jit
                def render_chunk(params, occ, lod_w, o, d):
                    rays_c = Rays(origins=o, dirs=d, dist_min=jnp.float32(0.0),
                                  dist_max=jnp.float32(6.0))
                    return Pipeline.__call__(self.pipeline, params, rays_c,
                                             frozenset(channels), occ, lod_w,
                                             tracer_cfg=chunk_cfg)
                self._render_cache[cache_key] = render_chunk
            return self._render_cache[cache_key]

        count_chunk = None
        if cfg.pack_steps:
            count_key = ("count", cfg.raymarch_type, cfg.num_steps,
                         cfg.ray_max_travel, rbatch)
            if count_key not in self._render_cache:
                march_cfg = cfg

                @jax.jit
                def count_valid(occ, o, d):
                    # mirrors _trace_block_packed's march exactly (key=None at
                    # val — deterministic samples), so the count equals the
                    # pack-time sum(rm.mask)
                    rays_c = Rays(origins=o, dirs=d, dist_min=jnp.float32(0.0),
                                  dist_max=jnp.float32(6.0))
                    rm = raymarch(rays_c, occ, march_cfg.num_steps,
                                  march_cfg.raymarch_type,
                                  march_cfg.ray_max_travel)
                    return jnp.sum(rm.mask, dtype=jnp.int32)
                self._render_cache[count_key] = count_valid
            count_chunk = self._render_cache[count_key]

        grown = 0
        outs = []
        for i in range(0, n + pad, rbatch):
            o = padded.origins[i:i + rbatch]
            d = padded.dirs[i:i + rbatch]
            chunk_cfg = cfg
            if cfg.pack_steps:
                cnt = int(count_chunk(self.occ, o, d))
                p = cfg.pack_steps
                while p < cfg.num_steps and p * rbatch < cnt:
                    p *= 2
                if p >= cfg.num_steps:
                    p = 0   # budget reached the dense size: render dense
                if p != cfg.pack_steps:
                    grown += 1
                    chunk_cfg = dataclasses.replace(cfg, pack_steps=p)
            outs.append(chunk_fn(chunk_cfg)(self.params, self.occ, self.lod_w,
                                            o, d))
        if grown:
            log.debug("batch_render: %d/%d chunks exceeded the stage pack "
                      "budget (%d) and rendered with a grown buffer",
                      grown, (n + pad) // rbatch, cfg.pack_steps)
        rb = RenderBuffer.concatenate(outs)
        return jax.tree.map(lambda x: x[:n] if getattr(x, "ndim", 0) >= 1 and
                            x.shape[0] == n + pad else x, rb)
