"""Secondary model families: SemanticNeF, PanopticLiftingNeF (+ TensoRF grid,
progressive upsampling), clustering NeF flag, triplanar grid."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from pagnerf_tpu.models.clustering_nef import MeanShiftPanopticDeltaNeF
from pagnerf_tpu.models.nefs import GridConfig
from pagnerf_tpu.models.panoptic_lifting import PanopticLiftingNeF
from pagnerf_tpu.models.semantic_nerf import SemanticNeF
from pagnerf_tpu.models.tensorf import (TensoRFGrid, resolution_schedule,
                                        upsample_vm_params)


def coords_dirs(n=10):
    c = jax.random.uniform(jax.random.PRNGKey(0), (3, n), minval=-1, maxval=1)
    d = jnp.ones((3, n)) / jnp.sqrt(3.0)
    return c, d


def test_semantic_nerf_shapes_and_grads():
    nef = SemanticNeF(num_classes=5, hidden_dim=16)
    c, d = coords_dirs()
    params = nef.init(jax.random.PRNGKey(1), c, d, nef.supported_channels())
    out = nef.apply(params, c, d, nef.supported_channels())
    assert out["density"].shape == (1, 10)
    assert out["rgb"].shape == (3, 10)
    assert out["semantics"].shape == (5, 10)
    np.testing.assert_allclose(np.asarray(out["semantics"]).sum(0), 1.0, atol=1e-5)
    # 8-layer trunk with a skip at 5 (semantic_nerf.py:48-55)
    trunk = params["params"]["decoder_features"]
    assert "hidden_7" in trunk
    g = jax.grad(lambda p: nef.apply(p, c, d, frozenset({"rgb"}))["rgb"].sum())(params)
    total = sum(float(jnp.abs(x).sum()) for x in jax.tree.leaves(g["params"]))
    assert total > 0


def test_panoptic_lifting_shapes():
    nef = PanopticLiftingNeF(grid=GridConfig(grid_type="TensoRF", resolution=16),
                             num_classes=4, num_instances=6, hidden_dim=16)
    c, d = coords_dirs()
    params = nef.init(jax.random.PRNGKey(2), c, d, nef.supported_channels())
    out = nef.apply(params, c, d, nef.supported_channels())
    assert out["density"].shape == (1, 10)
    assert out["rgb"].shape == (3, 10)
    assert out["semantics"].shape == (4, 10)
    assert out["inst_embedding"].shape == (6, 10)
    # semantics decode directly from coords (panoptic_lifting.py:242-260): no grad
    # into the TensoRF grid from the semantic head
    g = jax.grad(lambda p: nef.apply(p, c, d,
                                     frozenset({"semantics"}))["semantics"].sum())(params)
    grid_grad = sum(float(jnp.abs(x).sum())
                    for x in jax.tree.leaves(g["params"]["grid"]))
    assert grid_grad == 0.0


def test_tensorf_grid_and_upsample():
    grid = TensoRFGrid(density_n_comp=4, app_n_comp=8, resolution=16, app_dim=9)
    c, _ = coords_dirs(7)
    params = grid.init(jax.random.PRNGKey(3), c)
    sigma, app = grid.apply(params, c)
    assert sigma.shape == (7,)
    assert app.shape == (9, 7)
    up = upsample_vm_params(dict(params["params"]), 24)
    assert up["density_plane"].shape == (3, 4, 24, 24)
    assert up["density_line"].shape == (3, 4, 24)
    # schedule is monotone base -> max
    sched = resolution_schedule(128, 192, 5)
    assert sched[0] == 128 and sched[-1] == 192 and sorted(sched) == sched


def test_trainer_tensorf_upsampling():
    from pagnerf_tpu.data.multiview import MultiviewDataset
    from pagnerf_tpu.data.synthetic import make_dataset
    from pagnerf_tpu.models.pipeline import Pipeline
    from pagnerf_tpu.models.tracer import TracerConfig
    from pagnerf_tpu.train.trainer import PanopticTrainer, TrainerConfig

    data = make_dataset(num_views=4, width=12, height=8, num_spheres=2)
    ds = MultiviewDataset(data)
    nef = PanopticLiftingNeF(
        grid=GridConfig(grid_type="TensoRF", resolution=8, max_resolution=12,
                        num_resolutions=2),
        num_classes=ds.semantic_info["num_classes"],
        num_instances=ds.semantic_info["num_instances"], hidden_dim=8)
    pipe = Pipeline(nef, TracerConfig(num_steps=8))
    cfg = TrainerConfig(epochs=2, batch_size=2, num_rays_sampled_per_img=8,
                        sem_epoch_start=1000, inst_epoch_start=1000,
                        prune_every=-1, optimize_val_extrinsics=False,
                        optimize_extrinsics=False, inst_outlier_rejection=False)
    trainer = PanopticTrainer(pipe, ds, cfg, occ_level=3)
    assert trainer._current_tensorf_res() == 8
    trainer.run_epoch(0)
    trainer.run_epoch(1)   # epoch 1 % (2//2) == 0 -> upsample to 12
    assert trainer._current_tensorf_res() == 12
    # training still works after the resolution step
    trainer.run_epoch(2)


def test_clustering_nef_flag():
    nef = MeanShiftPanopticDeltaNeF(
        grid=GridConfig(grid_type="HashGrid", num_lods=2, feature_dim=2,
                        log2_table_size=8, base_resolution=4, finest_resolution=8),
        num_classes=3, num_instances=4, hidden_dim=8,
        panoptic_features_type="delta")
    assert nef.use_clustering is True
