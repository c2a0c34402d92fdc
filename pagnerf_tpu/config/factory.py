"""Module factory: parsed config -> dataset / NeF / tracer / pipeline / trainer.

TPU-native equivalent of the reference ``get_modules_from_config`` +
``get_optimizer_from_config`` (/root/reference/config_parser.py:667-781) and the class
registration performed by the app entry point (main_interactive.py:34-76).
"""
from __future__ import annotations

import logging
from typing import Tuple

import jax.numpy as jnp
import numpy as np

from ..data.multiview import MultiviewDataset
from ..models.clustering_nef import (MeanShiftPanopticDDensityNeF,
                                     MeanShiftPanopticDeltaNeF,
                                     MeanShiftPanopticNeF)
from ..models.nefs import (GridConfig, PanopticDDensityNeF, PanopticDeltaNeF,
                           PanopticNeF)
from ..models.pipeline import BAPipeline, Pipeline
from ..models.tracer import TracerConfig
from ..train.optimizer import OptimizerConfig
from ..train.trainer import PanopticTrainer, TrainerConfig
from .config import register_class, str2mod

log = logging.getLogger(__name__)


def register_default_classes():
    """Mirror of the registrations in the reference app entry
    (main_interactive.py:34-76)."""
    for cls in (PanopticNeF, PanopticDeltaNeF, PanopticDDensityNeF,
                MeanShiftPanopticNeF, MeanShiftPanopticDeltaNeF,
                MeanShiftPanopticDDensityNeF):
        register_class(cls, cls.__name__)
    try:
        from ..models.semantic_nerf import SemanticNeF
        from ..models.panoptic_lifting import PanopticLiftingNeF
        register_class(SemanticNeF, "SemanticNeF")
        register_class(PanopticLiftingNeF, "PanopticLiftingNeF")
    except ImportError:
        pass


def grid_config_from_args(args, delta: bool = False) -> GridConfig:
    return GridConfig(
        grid_type=args.grid_type,
        num_lods=args.num_lods,
        feature_dim=args.feature_dim,
        capacity_log2=(args.delta_capacity_log_2 if delta else args.capacity_log_2),
        coarsest_scale=args.coarsest_scale,
        finest_scale=args.finest_scale,
        log2_table_size=max(args.codebook_bitwidth, 4)
        if hasattr(args, "codebook_bitwidth") else 19,
        compute_dtype=getattr(args, "compute_dtype", "float32"),
        base_lod=args.base_lod,
    )


def load_dataset(args) -> MultiviewDataset:
    fmt = args.multiview_dataset_format
    if fmt in ("synthetic",):
        from ..data.synthetic import make_dataset
        res = getattr(args, "synthetic_res", None) or [40, 30]
        preds = bool(getattr(args, "synthetic_preds", False)) or any(
            "pred" in str(m) for m in getattr(args, "load_modes", []) or [])
        data = make_dataset(num_views=getattr(args, "synthetic_num_views", 8),
                            width=int(res[0]), height=int(res[1]),
                            num_spheres=getattr(args, "synthetic_num_spheres", 4),
                            pose_noise=args.pose_noise_strength
                            if args.add_noise_to_train_poses else 0.0,
                            predictions=preds)
    elif fmt == "bup20":
        from ..data.formats.bup20 import load_bup20
        data = load_bup20(args)
    elif fmt in ("standard", "nerf_standard"):
        from ..data.formats.nerf_standard import load_nerf_standard
        data = load_nerf_standard(args.dataset_path, mip=args.mip or 0,
                                  bg_color=args.bg_color)
    else:
        raise NotImplementedError(f"dataset format '{fmt}' not supported")
    return MultiviewDataset(data)


def get_modules_from_config(args) -> Tuple[Pipeline, MultiviewDataset, PanopticTrainer]:
    """Build the pipeline/dataset/trainer stack
    (reference config_parser.py:679-781)."""
    register_default_classes()
    dataset = load_dataset(args)
    si = dataset.semantic_info

    nef_cls = str2mod.get(args.nef_type, PanopticDeltaNeF)
    num_classes = args.num_classes if args.num_classes > 0 else si["num_classes"]
    num_instances = (args.num_instances if args.num_instances > 0
                     else si["num_instances"])
    nef_kwargs = dict(
        grid=grid_config_from_args(args),
        num_classes=num_classes, num_instances=num_instances,
        hidden_dim=args.hidden_dim, num_layers=args.num_layers,
        activation_type=args.activation_type,
        sem_activation_type=args.sem_activation_type,
        sem_num_layers=args.sem_num_layers, sem_hidden_dim=args.sem_hidden_dim,
        sem_normalize=args.sem_normalize, sem_softmax=args.sem_softmax,
        sem_sigmoid=args.sem_sigmoid, sem_detach=args.sem_detach,
        inst_num_layers=args.inst_num_layers, inst_hidden_dim=args.inst_hidden_dim,
        inst_normalize=args.inst_normalize, inst_softmax=args.inst_softmax,
        inst_sigmoid=args.inst_sigmoid, inst_detach=args.inst_detach,
        inst_direct_pos=args.inst_direct_pos,
        inst_soft_temperature=args.inst_soft_temperature,
        sem_zero_init=args.sem_zero_init,
        panoptic_features_type=args.panoptic_features_type,
        multiscale_type=args.multiscale_type,
        view_multires=args.view_multires, pos_multires=args.pos_multires,
        embedder_type=args.embedder_type,
        compute_dtype_name=getattr(args, "compute_dtype", "float32"),
    )
    if issubclass(nef_cls, PanopticDeltaNeF):
        nef_kwargs["delta_grid"] = grid_config_from_args(args, delta=True)
    valid = set(nef_cls.__dataclass_fields__.keys())
    nef = nef_cls(**{k: v for k, v in nef_kwargs.items() if k in valid})

    # Residual mass into slot 0 only makes sense for probability outputs:
    # gate each panoptic channel on its softmax post-op (an inst_sigmoid or
    # raw-embedding head would get its first embedding dim silently corrupted).
    bg_res_sem = bool(args.sem_softmax)
    bg_res_inst = bool(args.inst_softmax)
    if args.panoptic_bg_residual and not (bg_res_sem and bg_res_inst):
        log.warning(
            "panoptic_bg_residual is on but %s not softmax-normalised — the "
            "background residual is disabled for the non-probability "
            "channel(s)",
            "sem/inst heads are" if not (bg_res_sem or bg_res_inst)
            else ("the semantic head is" if not bg_res_sem
                  else "the instance head is"))

    tracer_cfg = TracerConfig(
        tracer_type=args.tracer_type,
        num_steps=args.num_steps,
        raymarch_type=args.raymarch_type,
        bg_color=args.bg_color,
        ray_max_travel=args.ray_max_travel,
        ray_sparsity_reg=args.ray_sparcity_reg,
        panoptic_bg_residual=args.panoptic_bg_residual,
        bg_residual_sem=bg_res_sem,
        bg_residual_inst=bg_res_inst,
    )

    if args.optimize_extrinsics or args.optimize_val_extrinsics:
        pipeline = BAPipeline(nef, tracer_cfg,
                              jnp.asarray(dataset.data["view_matrices"]),
                              anchor_frame_idxs=[0])
    else:
        pipeline = Pipeline(nef, tracer_cfg)

    trainer_cfg = TrainerConfig(
        epochs=args.epochs, batch_size=args.batch_size,
        num_rays_sampled_per_img=args.num_rays_sampled_per_img,
        rgb_weight=args.rgb_weight, sem_weight=args.sem_weight,
        sem_epoch_start=args.sem_epoch_start, sem_conf_enable=args.sem_conf_enable,
        sem_temperature=args.sem_temperature, sem_softmax=args.sem_softmax,
        sem_segment_reg_weight=args.sem_segment_reg_weight,
        contrast_sem_weight=args.contrast_sem_weight,
        inst_loss=args.inst_loss, inst_weight=args.inst_weight,
        inst_epoch_start=args.inst_epoch_start,
        inst_conf_enable=args.inst_conf_enable,
        inst_outlier_rejection=args.inst_outlier_rejection,
        inst_segment_reg_weight=args.inst_segment_reg_weight,
        inst_temperature=args.inst_temperature,
        base_temperature=args.base_temperature, inst_pn_ratio=args.inst_pn_ratio,
        optimize_extrinsics=args.optimize_extrinsics,
        extrinsics_epoch_start=args.extrinsics_epoch_start,
        extrinsics_epoch_end=args.extrinsics_epoch_end,
        optimize_val_extrinsics=args.optimize_val_extrinsics,
        val_extrinsics_start=args.val_extrinsics_start,
        val_extrinsics_end=args.val_extrinsics_end,
        val_extrinsics_every=max(args.val_extrinsics_every, 1),
        prune_every=args.prune_every, prune_at_epoch=args.prune_at_epoch,
        prune_at_start=args.prune_at_start,
        seed_prune_epoch=getattr(args, "seed_prune_epoch", -1),
        seed_keep_frac=getattr(args, "seed_keep_frac", 0.2),
        seed_refresh_every=getattr(args, "seed_refresh_every", 0),
        seed_refresh_keep_frac=getattr(args, "seed_refresh_keep_frac", 0.02),
        prune_monotone=getattr(args, "prune_monotone", True),
        packed_compaction=getattr(args, "packed_compaction", True),
        # 0 is a documented sentinel (whole batch in one microbatch,
        # TrainerConfig.micro_batch_imgs) — only clamp negatives to it
        micro_batch_imgs=max(getattr(args, "micro_batch_imgs", 1), 0),
        fused_micro_step=getattr(args, "fused_micro_step", False),
        dispatch_ahead=max(getattr(args, "dispatch_ahead", 4), 0),
        voxel_raymarch_epoch_start=(args.voxel_raymarch_epoch_start
                                    if args.voxel_raymarch_epoch_start > 0
                                    else 10 ** 9),
        # NOT args.samples_per_voxel: that flag is SDF-grid-initialisation-only in
        # the reference (config_parser.py:262, used only at line 748); its default
        # of 256 would make the voxel stage march 256*128 steps/ray (a 34 GB
        # program). Voxel marching uses the TrainerConfig default (2 per voxel).
        grid_tvl1_reg=args.grid_tvl1_reg, grid_tvl2_reg=args.grid_tvl2_reg,
        delta_grid_tvl1_reg=args.delta_grid_tvl1_reg,
        delta_grid_tvl2_reg=args.delta_grid_tvl2_reg,
        tv_window_size=args.tv_window_size,
        tv_edge_num_samples=int(args.tv_edge_num_samples),
        lod_anneling=args.lod_anneling, lod_annel_epochs=args.lod_annel_epochs,
        lod_annel_epoch_start=args.lod_annel_epoch_start,
        valid_every=args.valid_every,
        render_batch=args.render_batch or 8000,
        val_mip=args.val_mip or 0,
        inst_num_dilations=max(args.inst_num_dilations, 0),
        inst_min_mask_px=max(getattr(args, "inst_min_mask_px", 100), 0),
        num_val_frames_to_save=max(args.num_val_frames_to_save, 1),
        render_val_labels=args.render_val_labels,
        log_2d=getattr(args, "log_2d", False),
        save_preds=args.save_preds,
        save_grid=args.save_grid,
        num_clustering_samples=args.num_clustering_samples or 20000,
        low_res_val=args.low_res_val,
        random_lod=args.random_lod,
    )
    opt_cfg = OptimizerConfig(
        optimizer_type=args.optimizer_type, lr=args.lr,
        weight_decay=args.weight_decay, grid_lr_weight=args.grid_lr_weight,
        delta_grid_lr_weight=args.delta_grid_lr_weight,
        extrinsics_lr=args.extrinsics_lr,
        use_lr_scheduler=args.use_lr_scheduler,
        lr_scheduler_type=args.lr_scheduler_type,
        lr_step_size=args.lr_step_size, lr_step_gamma=args.lr_step_gamma,
        lr_warmup_epochs=args.lr_warmup_epochs, lr_div_factor=args.lr_div_factor,
        num_epochs=args.epochs,
        clip_grad_norm=getattr(args, "clip_grad_norm", 0.0),
    )
    trainer = PanopticTrainer(pipeline, dataset, trainer_cfg, opt_cfg,
                              occ_level=getattr(args, "blas_level", 7))
    # --perf activates the phase timer the trainer threads through its loop
    # (reference PerfTimer + --perf flag, config_parser.py:56, trainer.py:393)
    trainer.timer.activate = bool(getattr(args, "perf", False))
    return pipeline, dataset, trainer
