"""Synthetic Mask2Former-like prediction supervision: generator properties, the
trainer's pred/conf-weighted loss paths, and the validation gain metrics — the
system's headline capability (lifting INCONSISTENT per-frame 2-D predictions into
a consistent 3-D panoptic field; reference train.sh load_modes preds, data model
agrobot_base.py:463-510, gain metrics pc_nerf/trainer.py:906-914)."""
import dataclasses

import jax.numpy as jnp
import numpy as np

from pagnerf_tpu.data.multiview import MultiviewDataset
from pagnerf_tpu.data.synthetic import add_synthetic_predictions, make_dataset


def test_generator_properties():
    d = make_dataset(num_views=6, width=48, height=36, num_spheres=4,
                     predictions=True)
    for ch in ("semantics_pred", "instance_pred", "sem_conf", "inst_conf"):
        assert ch in d and d[ch].shape == d["instance"].shape
    ip, ig = d["instance_pred"], d["instance"]
    # ids fit the embedding space
    assert int(ip.max()) < d["semantic_info"]["num_instances"]
    # per-view ID inconsistency: at least one sphere changes its pred id
    # between views (the property the whole system exists to resolve)
    changed = 0
    for sph in np.unique(ig)[1:]:
        ids = set()
        for v in range(ig.shape[0]):
            vals = ip[v][ig[v] == sph]
            vals = vals[vals > 0]
            if vals.size:
                ids.add(int(np.bincount(vals).argmax()))
        if len(ids) > 1:
            changed += 1
    assert changed >= 2, "per-view instance ids are not inconsistent"
    # noise exists but preds still mostly agree with GT foreground
    agree = ((ip > 0) == (ig > 0)).mean()
    assert 0.8 < agree < 1.0
    # confidence maps in (0, 1], lower on boundaries than interiors
    assert 0.0 < d["sem_conf"].min() and d["sem_conf"].max() <= 1.0
    assert d["sem_conf"].std() > 0.01
    # GT untouched
    d_clean = make_dataset(num_views=6, width=48, height=36, num_spheres=4)
    np.testing.assert_array_equal(d["instance"], d_clean["instance"])


def test_generator_is_deterministic():
    d1 = make_dataset(num_views=3, width=32, height=24, predictions=True)
    d2 = make_dataset(num_views=3, width=32, height=24, predictions=True)
    np.testing.assert_array_equal(d1["instance_pred"], d2["instance_pred"])
    np.testing.assert_array_equal(d1["sem_conf"], d2["sem_conf"])


def _make_trainer(data, **cfg_over):
    from pagnerf_tpu.models.nefs import GridConfig, PanopticDeltaNeF
    from pagnerf_tpu.models.pipeline import BAPipeline
    from pagnerf_tpu.models.tracer import TracerConfig
    from pagnerf_tpu.train.trainer import PanopticTrainer, TrainerConfig

    ds = MultiviewDataset(data)
    si = ds.semantic_info
    nef = PanopticDeltaNeF(
        grid=GridConfig(grid_type="HashGrid", num_lods=2, feature_dim=2,
                        log2_table_size=8, base_resolution=4,
                        finest_resolution=8),
        num_classes=si["num_classes"], num_instances=si["num_instances"],
        hidden_dim=8, panoptic_features_type="delta")
    pipe = BAPipeline(nef, TracerConfig(num_steps=8),
                      jnp.asarray(data["view_matrices"]))
    cfg = TrainerConfig(epochs=1, batch_size=2, num_rays_sampled_per_img=64,
                        sem_epoch_start=0, inst_epoch_start=0, prune_every=-1,
                        optimize_val_extrinsics=False,
                        inst_outlier_rejection=False, **cfg_over)
    return PanopticTrainer(pipe, ds, cfg, occ_level=3)


def test_trainer_supervises_from_preds_and_conf_weighting_changes_losses():
    """End-to-end: the jitted step trains against *_pred channels when present,
    and enabling sem/inst confidence weighting changes the losses on a batch
    with nontrivial conf (round-2 weak point #8 — previously unit-only)."""
    data = make_dataset(num_views=4, width=32, height=24, num_spheres=3,
                        predictions=True)

    def losses(sem_conf, inst_conf):
        t = _make_trainer(data, sem_conf_enable=sem_conf,
                          inst_conf_enable=inst_conf)
        rng = np.random.default_rng(0)
        batch = t.dataset.sample_batch(rng, 2, 64)
        assert "instance_pred" in batch and "sem_conf" in batch
        assert float(batch["sem_conf"].std()) > 0.0
        return {k: float(v) for k, v in
                t.train_step(t.stage_for_epoch(0), batch).items()}

    base = losses(False, False)
    semw = losses(True, False)
    instw = losses(False, True)
    assert semw["sem_loss"] != base["sem_loss"]
    assert instw["inst_loss"] != base["inst_loss"]
    # conf weighting leaves the other heads' losses untouched
    assert semw["inst_loss"] == base["inst_loss"]
    assert instw["sem_loss"] == base["sem_loss"]

    # pred supervision actually differs from GT supervision
    gt_data = {k: v for k, v in data.items()
               if k not in ("semantics_pred", "instance_pred")}
    t_gt = _make_trainer(gt_data)
    rng = np.random.default_rng(0)
    gt_losses = {k: float(v) for k, v in
                 t_gt.train_step(t_gt.stage_for_epoch(0),
                                 t_gt.dataset.sample_batch(rng, 2, 64)).items()}
    assert gt_losses["inst_loss"] != base["inst_loss"]


def test_validation_reports_nonzero_pred_baselines():
    """evaluate_metrics must produce NONZERO *_pred baselines (2-D prediction
    quality vs GT) and the gain metrics — the reference's own success criterion
    (trainer.py:906-914). Round-2 gap: every *_pred column was 0.0."""
    from pagnerf_tpu.train.validation import evaluate_metrics

    data = make_dataset(num_views=4, width=32, height=24, num_spheres=3,
                        predictions=True)
    t = _make_trainer(data)
    val = t.dataset.get_images(split="val", mip=0)
    metrics = evaluate_metrics(t, epoch=0, data=val)
    assert metrics["val/iou_pred"] > 0.3      # noisy preds still mostly right
    assert metrics["val/pq_things_pred"] > 0.0
    assert "val/pq_things_gain" in metrics and "val/iou_gain" in metrics
    assert metrics["val/map_pred"] > 0.0


def test_semantic_gated_instance_decode():
    """With linear_assignment_things (slot 0 == semantic stuff by the loss
    contract), validation decodes instances by gating on the semantic argmax:
    things pixels pick the best THINGS slot even when the stuff slot's
    probability is soft-high (novel-view blur failure mode, round-3 diagnosis)."""
    from pagnerf_tpu.train.validation import evaluate_metrics

    data = make_dataset(num_views=4, width=32, height=24, num_spheres=3)
    t = _make_trainer(data)
    assert t.cfg.inst_loss == "linear_assignment_things"
    val = t.dataset.get_images(split="val", mip=0)
    # runs through the gated branch without error and yields finite metrics
    metrics = evaluate_metrics(t, epoch=0, data=val)
    assert np.isfinite(metrics["val/pq_things"])
    # direct decode check: a pixel whose joint argmax is slot 0 but whose
    # semantics say "things" must land on a things slot
    e = np.array([[0.5, 0.3, 0.2]])       # slot 0 wins joint argmax
    sem_map = np.array([1])               # things class
    stuff_ids = np.asarray([0])
    things_px = ~np.isin(sem_map, stuff_ids)
    inst = np.where(things_px, 1 + np.argmax(e[:, 1:], -1), 0)
    assert inst[0] == 1


def test_backdrop_miss_rays_keep_white_background():
    """Rays that miss the backdrop box must NOT be painted with a phantom
    wall sample (entry > exit): such samples lie on no surface and differ per
    view — multiview-inconsistent GT (CLAUDE.md rule 10)."""
    import numpy as np

    from pagnerf_tpu.data.synthetic import _render_analytic, default_scene

    scene = default_scene(1, seed=0)
    # ray from outside aimed AWAY from the box: slab entry > exit
    o = np.array([[2.0, 2.0, 2.0]], np.float32)
    d = np.array([[1.0, 0.0, 0.0]], np.float32)
    d /= np.linalg.norm(d)
    rgb, sem, inst, depth = _render_analytic(scene, o, d)
    np.testing.assert_allclose(rgb[0], [1.0, 1.0, 1.0])   # untouched white bg
    assert depth[0] == 0.0      # miss convention: depth 0 (synthetic.py:114)


def test_sample_ray_indices_pool_smaller_than_rays():
    """num_rays > pixel pool: sample WITH replacement instead of SIGFPE-ing
    the process in the native Fisher-Yates (batcher.cpp:38 mod-by-zero)."""
    from pagnerf_tpu.data import native

    out = native.sample_ray_indices(2, 50, 10, seed=7)
    assert out.shape == (2, 50)
    assert (out >= 0).all() and (out < 10).all()
