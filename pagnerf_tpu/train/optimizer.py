"""Optimizer construction: per-group learning rates by parameter-path name.

TPU-native equivalent of the reference ``init_optimizer``
(/root/reference/pc_nerf/trainer.py:229-300): parameters are grouped by name
substring — decoder / sem / inst / delta_grid / grid / rest (+ extrinsics) — with
per-group learning-rate multipliers (grid and delta-grid x grid_lr_weight, best.yaml
optimizer group) and Adam(eps=1e-15) (config_parser.py:671-673).

Frozen-parameter semantics match torch ``requires_grad=False`` exactly: a per-stage
static mask selects, per leaf, whether the optimizer update and its state advance or
stay untouched (used for val-pose-only epochs that freeze the NeF, trainer.py:302-327,
and the extrinsics epoch window, trainer.py:304-308).
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import optax


@dataclasses.dataclass(frozen=True)
class OptimizerConfig:
    """Reference 'optimizer' + scheduler config group (best.yaml)."""

    optimizer_type: str = "adam"
    lr: float = 0.001
    eps: float = 1e-15
    weight_decay: float = 0.0
    grid_lr_weight: float = 100.0
    delta_grid_lr_weight: float = 100.0
    extrinsics_lr: float = 0.0001
    use_lr_scheduler: bool = False
    lr_scheduler_type: str = "step"
    lr_step_size: int = 0          # epochs
    lr_step_gamma: float = 0.1
    lr_warmup_epochs: int = 0
    lr_div_factor: float = 10000.0
    num_epochs: int = 800
    steps_per_epoch: int = 1
    # Global gradient-norm clip; 0 disables (reference default — torch has no
    # explicit clip, but its AMP fp16 numeric range bounds the same events).
    # The -log(p + 1e-27) loss sites (pc_nerf/trainer.py:459) have unbounded
    # slope where a rendered probability ~0 meets a supervised pixel: one
    # unlucky batch emits finite-but-1e8 gradients which the non-finite skip
    # cannot catch, and at grid lr x30 a single epoch of those destroys the
    # semantic field (observed: flagship 120v run, sem_loss 0.06 -> 1.4 in
    # one epoch at ep 225). Clipping bounds the step like fp16 saturation did.
    clip_grad_norm: float = 0.0


def label_for_path(path: str) -> str:
    """Group label from a '/'-joined param path — same precedence as the reference's
    name matching (trainer.py:240-258)."""
    if path.startswith("extrinsics"):
        return "extrinsics"
    if "decoder" in path:
        return "decoder"
    if "inst" in path:
        return "inst"
    if "sem" in path:
        return "sem"
    if "delta_grid" in path:
        return "delta_grid"
    if "grid" in path:
        return "grid"
    return "rest"


def param_labels(params) -> Dict:
    """Pytree of group labels matching ``params``."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def path_str(kp):
        return "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in kp)

    labels = [label_for_path(path_str(kp)) for kp, _ in flat]
    treedef = jax.tree_util.tree_structure(params)
    return jax.tree_util.tree_unflatten(treedef, labels)


def _schedule(base_lr: float, cfg: OptimizerConfig, group: str) -> optax.Schedule:
    """Per-group LR schedule (reference trainer.py:173-199)."""
    if not cfg.use_lr_scheduler:
        return optax.constant_schedule(base_lr)
    spe = max(cfg.steps_per_epoch, 1)
    if cfg.lr_scheduler_type == "step":
        if cfg.lr_step_size <= 0:
            return optax.constant_schedule(base_lr)
        return optax.exponential_decay(base_lr, transition_steps=cfg.lr_step_size * spe,
                                       decay_rate=cfg.lr_step_gamma, staircase=True)
    if cfg.lr_scheduler_type == "one_cycle":
        total = (cfg.num_epochs + 1) * spe
        return optax.linear_onecycle_schedule(
            transition_steps=total, peak_value=base_lr,
            pct_start=cfg.lr_warmup_epochs / max(cfg.num_epochs, 1),
            div_factor=cfg.lr_div_factor, final_div_factor=cfg.lr_div_factor)
    if cfg.lr_scheduler_type == "panoptic_step":
        # decay only the sem/inst/delta groups at epoch boundaries
        # (trainer.py:193-199)
        if group in ("sem", "inst", "delta_grid") and cfg.lr_step_size > 0:
            return optax.exponential_decay(base_lr,
                                           transition_steps=cfg.lr_step_size * spe,
                                           decay_rate=cfg.lr_step_gamma,
                                           staircase=True)
        return optax.constant_schedule(base_lr)
    raise ValueError(f"unknown lr scheduler '{cfg.lr_scheduler_type}'")


def _group_tx(cfg: OptimizerConfig, group: str) -> optax.GradientTransformation:
    base = {
        "decoder": cfg.lr, "sem": cfg.lr, "inst": cfg.lr, "rest": cfg.lr,
        "grid": cfg.lr * cfg.grid_lr_weight,
        "delta_grid": cfg.lr * cfg.delta_grid_lr_weight,
        "extrinsics": cfg.extrinsics_lr if cfg.extrinsics_lr >= 0 else cfg.lr,
    }[group]
    sched = _schedule(base, cfg, group)
    wd = cfg.weight_decay if group in ("grid", "delta_grid") else 0.0
    if cfg.optimizer_type == "adam":
        if wd > 0:
            return optax.adamw(sched, eps=cfg.eps, weight_decay=wd)
        return optax.adam(sched, eps=cfg.eps)
    if cfg.optimizer_type == "sgd":
        return optax.sgd(sched)
    if cfg.optimizer_type == "rmsprop":
        return optax.rmsprop(sched)
    raise ValueError(f"unknown optimizer '{cfg.optimizer_type}'")


GROUPS = ("decoder", "sem", "inst", "delta_grid", "grid", "rest", "extrinsics")


def build_optimizer(cfg: OptimizerConfig, params) -> optax.GradientTransformation:
    labels = param_labels(params)
    return optax.multi_transform({g: _group_tx(cfg, g) for g in GROUPS}, labels)


def _kp_str(kp) -> str:
    parts = []
    for k in kp:
        for attr in ("key", "idx", "name"):
            if hasattr(k, attr):
                parts.append(str(getattr(k, attr)))
                break
        else:
            parts.append(str(k))
    return "/".join(parts)


def masked_update(tx: optax.GradientTransformation, grads, opt_state, params,
                  frozen_fn: Optional[Callable[[str], bool]] = None,
                  clip_norm: float = 0.0):
    """Apply ``tx`` with EXACT frozen-parameter semantics, equivalent to torch
    requires_grad=False (reference trainer.py:308,318-326): for leaves whose path
    satisfies ``frozen_fn``,
      * the incoming gradient and the final update are zeroed (parameter
        bit-identical across the frozen stage), and
      * the optimizer *state* entries for those leaves (Adam moments etc.) are
        restored to their pre-update values, so momenta do not decay on the zero
        gradients and the leaf resumes after unfreezing exactly as if the frozen
        steps never happened.
    Per-group scalar step counts still advance (they are shared across a group and
    drive lr schedules, which torch also keeps running during freezes)."""
    if frozen_fn is not None:
        flat = jax.tree_util.tree_flatten_with_path(params)[0]
        frozen_paths = {_kp_str(kp) for kp, _ in flat if frozen_fn(_kp_str(kp))}

        def zero_frozen(kp, g):
            return jnp.zeros_like(g) if _kp_str(kp) in frozen_paths else g

        if frozen_paths:
            grads = jax.tree_util.tree_map_with_path(zero_frozen, grads)

    if clip_norm and clip_norm > 0:
        # global-norm clip AFTER the freeze zeroing (frozen leaves must not
        # inflate the norm) and BEFORE the optimizer: scale = c / max(n, c)
        # is 1 for in-range gradients, so healthy steps are bit-identical
        gnorm = optax.global_norm(grads)
        scale = clip_norm / jnp.maximum(gnorm, clip_norm)
        grads = jax.tree.map(lambda g: g * scale, grads)

    updates, new_state = tx.update(grads, opt_state, params)

    if frozen_fn is not None and frozen_paths:
        updates = jax.tree_util.tree_map_with_path(zero_frozen, updates)
        # Moment trees inside the state (e.g. ScaleByAdamState.mu/nu, possibly
        # per-group under optax.multi_transform inner states) embed (subsets
        # of) the param tree, so a state leaf's path ends with its param's full
        # path. Attribute each state leaf to the LONGEST param path that is a
        # path-suffix of it: a raw any-suffix match would also freeze a
        # non-frozen param whose path is a path-suffix of a frozen one (e.g.
        # frozen 'grid/tables' vs param 'ema/grid/tables'); the longest match
        # picks 'ema/grid/tables' there. Scalar counts match no param path and
        # keep advancing.
        by_len = sorted((_kp_str(kp) for kp, _ in flat), key=len, reverse=True)

        def embedded_param(p: str):
            for pp in by_len:
                if p == pp or p.endswith("/" + pp):
                    return pp
            return None

        def restore(kp, new_leaf, old_leaf):
            return old_leaf if embedded_param(_kp_str(kp)) in frozen_paths \
                else new_leaf

        new_state = jax.tree_util.tree_map_with_path(restore, new_state, opt_state)

    # Non-finite step skip — the reference trains under torch.cuda.amp.GradScaler
    # (pc_nerf/trainer.py:429,582-584), which SKIPS optimizer.step() whenever any
    # gradient is inf/NaN; without this, one bad step poisons the params
    # permanently (observed: the first flagship 120v run's panoptic branch).
    # A skipped step leaves params AND optimizer state bit-identical (the
    # logged losses still expose the event as a NaN/huge total).
    finite = jnp.array(True)
    for g in jax.tree.leaves(grads):
        if jnp.issubdtype(g.dtype, jnp.floating):
            finite = jnp.logical_and(finite, jnp.all(jnp.isfinite(g)))
    updates = jax.tree.map(
        lambda u: jnp.where(finite, u, jnp.zeros_like(u)), updates)
    new_state = jax.tree.map(lambda n, o: jnp.where(finite, n, o),
                             new_state, opt_state)
    return updates, new_state
