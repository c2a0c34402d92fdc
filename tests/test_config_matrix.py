"""Experiment-matrix tests: every shipped bup20 config must build its full module
stack through the factory and run a forward render (reference configs/bup20/*.yaml
matrix, SURVEY.md §2.3). Configs are shrunk via CLI overrides (the reference's
YAML-sets-defaults / CLI-overrides contract) and pointed at the synthetic dataset
so no BUP20 download is needed."""
import glob

import jax
import numpy as np
import pytest

from pagnerf_tpu.config.config import parse_options
from pagnerf_tpu.config.factory import get_modules_from_config

CONFIGS = sorted(glob.glob("configs/bup20/*.yaml"))

SHRINK = [
    "--multiview-dataset-format", "synthetic",
    "--capacity-log-2", "10", "--delta-capacity-log-2", "10",
    "--hidden-dim", "16", "--sem-hidden-dim", "16", "--inst-hidden-dim", "16",
    "--num-steps", "8", "--epochs", "1", "--batch-size", "2",
    "--num-rays-sampled-per-img", "16", "--render-batch", "64",
    "--base-lod", "3", "--max-grid-res", "32",
]


@pytest.mark.parametrize("cfg_path", CONFIGS, ids=[c.split("/")[-1] for c in CONFIGS])
def test_config_builds_and_renders(cfg_path):
    args = parse_options(["--config", cfg_path] + SHRINK)
    pipeline, dataset, trainer = get_modules_from_config(args)
    assert trainer.cfg.inst_loss == (args.inst_loss or "")

    import jax.numpy as jnp
    from pagnerf_tpu.core.rays import Rays
    batch = dataset.sample_batch(np.random.default_rng(0), 1, 16)
    base = Rays(origins=jnp.asarray(batch["base_rays_origins"]),
                dirs=jnp.asarray(batch["base_rays_dirs"]),
                dist_min=jnp.float32(0.0), dist_max=jnp.float32(6.0))
    if hasattr(pipeline, "transform_rays"):
        rays = pipeline.transform_rays(trainer.params, base,
                                       jnp.asarray(batch["cam_idx"]))
    else:
        rays = Rays(origins=jnp.asarray(batch["rays_origins"]).reshape(-1, 3),
                    dirs=jnp.asarray(batch["rays_dirs"]).reshape(-1, 3),
                    dist_min=jnp.float32(0.0), dist_max=jnp.float32(6.0))
    channels = frozenset({"rgb", "depth"}) & pipeline.nef.supported_channels()
    rb = pipeline(trainer.params, rays, channels or frozenset({"rgb"}),
                  trainer.occ, trainer.lod_w, stage="val",
                  key=jax.random.PRNGKey(0))
    assert rb.rgb.shape == (16, 3)
    assert np.isfinite(np.asarray(rb.rgb)).all()
