"""Headless CLI entry point.

Equivalent of the reference's main entry (/root/reference/main_interactive.py without
the interactive viewer): parse config (YAML + CLI), build modules, then either
validate-only, export the 3-D map, or train with periodic validation/checkpointing
(main_interactive.py:106-149)."""
from __future__ import annotations

import logging
import os
import sys
import time


def main(argv=None):
    from pagnerf_tpu.config.config import (build_parser, config_to_yaml,
                                           parse_options)
    from pagnerf_tpu.config.factory import get_modules_from_config
    from pagnerf_tpu.train import checkpoint
    from pagnerf_tpu.train.validation import validate

    from pagnerf_tpu.utils.logging_utils import SummaryWriter, default_log_setup

    from pagnerf_tpu.utils.compile_cache import enable_persistent_cache
    enable_persistent_cache()

    args = parse_options(argv)

    if args.validate_dataset:
        # dataset dry-run: report schema mismatches without training;
        # returns the error count (the __main__ guard exits non-zero on it)
        from pagnerf_tpu.data.validate import run_validation
        return run_validation(args)

    # per-run log dir + config snapshot (main_interactive.py:96-101)
    stamp = time.strftime("%Y%m%d-%H%M%S")
    log_dir = os.path.join(args.log_dir, args.exp_name or "run", stamp)
    default_log_setup(args.log_level, log_dir)
    log = logging.getLogger(__name__)

    if args.detect_anomaly:
        # reference --detect-anomaly -> torch anomaly mode (main_interactive.py:30-32)
        import jax
        jax.config.update("jax_debug_nans", True)

    pipeline, dataset, trainer = get_modules_from_config(args)
    writer = SummaryWriter(log_dir)
    with open(os.path.join(log_dir, "config.yaml"), "w") as f:
        f.write(config_to_yaml(build_parser(), args))

    if args.pretrained:
        checkpoint.load_checkpoint(args.pretrained, trainer, args.model_format)

    n_params = sum(x.size for x in
                   __import__("jax").tree.leaves(trainer.params))
    log.info("total number of parameters: %d", n_params)

    if args.valid_only:
        metrics = validate(trainer, trainer.epoch, log_dir=log_dir,
                           split=args.valid_split)
        log.info("validation: %s", metrics)
        return metrics

    if args.render_views:
        from pagnerf_tpu.app.orbit_renderer import render_orbit
        out_dir = args.render_views_dir or os.path.join(log_dir, "views")
        frames = render_orbit(trainer, out_dir)
        log.info("rendered %d views x %d channels to %s",
                 len(next(iter(frames.values()), [])), len(frames), out_dir)
        return frames

    if args.viewer:
        from pagnerf_tpu.app.viewer_server import serve
        return serve(trainer, port=args.viewer_port)

    if args.save_map_only:
        from pagnerf_tpu.utils.render_map import generate_pc_map_from_views
        out = generate_pc_map_from_views(trainer, mip=2)
        import pickle
        with open(os.path.join(log_dir, "nerf_pc.pkl"), "wb") as f:
            pickle.dump(out, f)
        log.info("saved point-cloud map (%d points)", len(out["points"]))
        return out

    def on_epoch_end(epoch, totals):
        msg = f"EPOCH {epoch}/{args.epochs} | " + " | ".join(
            f"{k}: {v:.3E}" for k, v in totals.items())
        log.info(msg)
        for k, v in totals.items():
            writer.add_scalar(f"Loss/{k}", v, epoch)
        if args.valid_every > 0 and (epoch + 1) % args.valid_every == 0:
            metrics = validate(trainer, epoch, log_dir=log_dir, writer=writer)
            log.info("val: %s", {k: round(v, 4) for k, v in metrics.items()})
            for k, v in metrics.items():
                writer.add_scalar(k, v, epoch)
        if args.save_every > 0 and (epoch + 1) % args.save_every == 0:
            checkpoint.save_checkpoint(os.path.join(log_dir, "model.ckpt"),
                                       trainer, save_as_new=args.save_as_new)

    trainer.train(on_epoch_end=on_epoch_end)
    checkpoint.save_checkpoint(os.path.join(log_dir, "model.ckpt"), trainer)
    return validate(trainer, trainer.epoch, log_dir=log_dir)


if __name__ == "__main__":
    ret = main(sys.argv[1:])
    if isinstance(ret, int):
        sys.exit(min(ret, 1))
