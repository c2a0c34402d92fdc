"""Cross-ray packed sample layout (ops/packed.py, tracer pack_steps path).

Contracts pinned here:
  * segment ops: prefix-sum segment reductions match explicit per-segment
    sums; segment_broadcast's scatter-free custom VJP matches autodiff of the
    plain gather it replaces.
  * pack_samples reproduces the dense march's valid sample set exactly
    (depths/deltas/positions), ray-major and depth-ordered, and water-fills
    fairly on overflow (every ray keeps its k* shallowest valid samples).
  * The packed trace equals the dense trace on every channel — values AND
    gradients (params and pose/ray-origin path) — when the budget covers the
    batch; the integration-level stop-gradient contract carries over.
  * Trainer wiring: packed_compaction stages carry pack_steps (and no
    compact_steps) after the prune, and the packed train step runs finite.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from test_models import make_nef, init_nef, make_test_rays

from pagnerf_tpu.core.rays import Rays
from pagnerf_tpu.models.tracer import TracerConfig, trace
from pagnerf_tpu.ops.occupancy import OccupancyGrid
from pagnerf_tpu.ops.packed import (_water_fill_cap, pack_samples,
                                    packed_integration_weights,
                                    segment_broadcast, segment_sum)
from pagnerf_tpu.ops.raymarch import raymarch

ALL_CH = frozenset({"rgb", "depth", "semantics", "inst_embedding"})


def _offsets(keep):
    return jnp.concatenate([jnp.zeros((1,), jnp.int32),
                            jnp.cumsum(jnp.asarray(keep, jnp.int32))])


def test_segment_sum_matches_explicit():
    keep = [3, 0, 2, 4]          # includes an empty segment
    off = _offsets(keep)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 12))  # 3 pad elements
    got = np.asarray(segment_sum(x, off))
    lo = 0
    for r, k in enumerate(keep):
        np.testing.assert_allclose(got[:, r], np.asarray(x[:, lo:lo + k]).sum(-1),
                                    rtol=1e-6, atol=1e-6)
        lo += k
    # padding tail (beyond offsets[-1]) never contributes
    x2 = x.at[:, 9:].set(1e6)
    np.testing.assert_allclose(np.asarray(segment_sum(x2, off)), got,
                                rtol=1e-6, atol=1e-6)


def test_segment_broadcast_value_and_vjp():
    keep = [2, 3, 0, 1]
    off = _offsets(keep)
    ray_id = jnp.asarray([0, 0, 1, 1, 1, 3, 0, 0], jnp.int32)  # 2 pad (clamped)
    x = jax.random.normal(jax.random.PRNGKey(1), (3, 4))
    np.testing.assert_array_equal(np.asarray(segment_broadcast(x, ray_id, off)),
                                  np.asarray(x[:, ray_id]))
    # VJP == autodiff of the plain gather, restricted to the real segments
    g = jax.random.normal(jax.random.PRNGKey(2), (3, 8))
    g_real = g.at[:, 6:].set(0.0)   # the packed tail carries zero cotangent
    want = jax.vjp(lambda v: v[:, ray_id], x)[1](g_real)[0]
    got = jax.vjp(lambda v: segment_broadcast(v, ray_id, off), x)[1](g_real)[0]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                rtol=1e-6, atol=1e-6)


def test_water_fill_cap():
    counts = jnp.asarray([5, 1, 3, 8], jnp.int32)
    # budget 17 = everything
    assert int(_water_fill_cap(counts, 8, 17)) >= 8
    # budget 12: k=3 -> 3+1+3+3 = 10 <= 12; k=4 -> 4+1+3+4 = 12 <= 12; k=5 -> 14
    assert int(_water_fill_cap(counts, 8, 12)) == 4
    assert int(_water_fill_cap(counts, 8, 9)) == 2   # k=2 -> 8; k=3 -> 10
    assert int(_water_fill_cap(counts, 8, 0)) == 0


def _march(n_rays=6, num_steps=24, raymarch_type="ray"):
    occ = OccupancyGrid.create(level=3)
    # carve some empty space so the mask is non-trivial
    mask = np.array(occ.mask)
    mask[: mask.shape[0] // 2] = False
    occ = OccupancyGrid(occupancy=occ.occupancy, mask=jnp.asarray(mask),
                        level=occ.level)
    rays = make_test_rays(n_rays)
    rm = raymarch(rays, occ, num_steps=num_steps, ray_max_travel=2.0,
                  raymarch_type=raymarch_type)
    return rays, occ, rm


def test_comp_prefix_accuracy_at_large_buffer():
    """Flagship-scale numerical pin (advisor round-3 medium finding): with a
    PLAIN fp32 global prefix over a ~2M buffer the prefix magnitude reaches
    ~1e4-1e5 where fp32 ulp is ~1e-2-1e-1, so per-segment boundary
    differences (exclusive transmittance sums ~1e0) lose 2-4 digits for rays
    late in the buffer. The compensated prefix must match the per-ray f64
    ground truth to ~fp32 precision at EVERY buffer position."""
    from pagnerf_tpu.ops.packed import PackedSamples
    rng = np.random.default_rng(7)
    r_count, seg = 16384, 128               # B = 2.1M, like flagship post scale
    b = r_count * seg
    tau32 = rng.uniform(0.0, 0.12, size=b).astype(np.float32)  # global sum ~1.3e5
    offsets = jnp.arange(0, b + 1, seg, dtype=jnp.int32)
    ray_id = jnp.repeat(jnp.arange(r_count, dtype=jnp.int32), seg)
    ps = PackedSamples(ray_id=ray_id, step_id=jnp.zeros((b,), jnp.int32),
                       offsets=offsets, valid=jnp.ones((b,), bool),
                       depths=jnp.zeros((b,)), deltas=jnp.zeros((b,)),
                       positionsT=jnp.zeros((3, 1)))
    w, a = jax.jit(packed_integration_weights)(jnp.asarray(tau32), ps)

    tau64 = tau32.astype(np.float64).reshape(r_count, seg)
    excl64 = np.cumsum(tau64, axis=1) - tau64
    w64 = np.exp(-excl64) * (1.0 - np.exp(-tau64))
    err = np.abs(np.asarray(w, np.float64).reshape(r_count, seg) - w64)
    # fp32-grade accuracy everywhere, including the last segments (a plain
    # prefix fails this by 3+ orders of magnitude on the late rays)
    assert err.max() < 5e-6, err.max()
    a64 = w64.sum(axis=1)
    np.testing.assert_allclose(np.asarray(a)[:, 0], a64, rtol=3e-5, atol=3e-6)

    # segment_sum at the same scale: per-segment sums of O(1)-magnitude
    # values against f64 ground truth
    x = rng.uniform(-1.0, 1.0, size=(1, b)).astype(np.float32)
    s = np.asarray(jax.jit(segment_sum)(jnp.asarray(x), offsets))[0]
    s64 = x.astype(np.float64).reshape(r_count, seg).sum(axis=1)
    np.testing.assert_allclose(s, s64, atol=2e-4)


def test_pack_matches_dense_valid_set_voxel_mode():
    """Voxel-mode march (the mode the trainer actually deploys pack_steps in):
    the t0/span refit path — probe back-off, has_hit select, max-travel clamp —
    feeds pack_samples' packed-space geometry reconstruction."""
    rays, occ, rm = _march(num_steps=24, raymarch_type="voxel")
    assert rm.t0 is not None and int(np.asarray(rm.mask).sum()) > 0
    total = int(np.asarray(rm.mask).sum())
    ps = pack_samples(rm, rays.origins.T, rays.dirs.T, budget=total + 5)
    assert int(ps.offsets[-1]) == total
    mask = np.asarray(rm.mask)
    off = np.asarray(ps.offsets)
    for r in range(mask.shape[0]):
        sl = slice(off[r], off[r + 1])
        steps = np.where(mask[r])[0]
        np.testing.assert_array_equal(np.asarray(ps.step_id)[sl], steps)
        np.testing.assert_allclose(np.asarray(ps.depths)[sl],
                                    np.asarray(rm.depths)[r, steps],
                                    rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(ps.positionsT)[:, sl],
                                    np.asarray(rm.positionsT)[:, r, steps],
                                    rtol=1e-5, atol=1e-5)


def test_packed_trace_matches_dense_voxel_mode():
    """Full-channel packed == dense parity under raymarch_type='voxel' with a
    finite ray_max_travel (the deployed post-prune regime)."""
    nef, params, occ, rays, dense_cfg, packed_cfg = _trace_pair()
    dense_cfg = dataclasses.replace(dense_cfg, raymarch_type="voxel")
    packed_cfg = dataclasses.replace(packed_cfg, raymarch_type="voxel")

    def nef_fn(c, d, ch):
        return nef.apply(params, c, d, frozenset(ch))

    rb_d = trace(nef_fn, rays, occ, dense_cfg, ALL_CH, stage="train")
    rb_p = trace(nef_fn, rays, occ, packed_cfg, ALL_CH, stage="train")
    for ch in ("rgb", "depth", "alpha", "semantics", "inst_embedding",
               "panoptic_alpha", "ray_sparsity_loss"):
        np.testing.assert_allclose(np.asarray(getattr(rb_p, ch)),
                                    np.asarray(getattr(rb_d, ch)),
                                    rtol=2e-4, atol=2e-5, err_msg=ch)


def test_pack_matches_dense_valid_set():
    rays, occ, rm = _march()
    total = int(np.asarray(rm.mask).sum())
    ps = pack_samples(rm, rays.origins.T, rays.dirs.T, budget=total + 5)
    assert int(ps.offsets[-1]) == total
    v = np.asarray(ps.valid)
    assert v.sum() == total and not v[total:].any()
    mask = np.asarray(rm.mask)
    dep = np.asarray(rm.depths)
    dl = np.asarray(rm.deltas)
    pos = np.asarray(rm.positionsT)
    off = np.asarray(ps.offsets)
    for r in range(mask.shape[0]):
        sl = slice(off[r], off[r + 1])
        assert (np.asarray(ps.ray_id)[sl] == r).all()
        steps = np.where(mask[r])[0]
        np.testing.assert_array_equal(np.asarray(ps.step_id)[sl], steps)
        np.testing.assert_allclose(np.asarray(ps.depths)[sl], dep[r, steps],
                                    rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(ps.deltas)[sl], dl[r, steps],
                                    rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(ps.positionsT)[:, sl],
                                    pos[:, r, steps], rtol=1e-5, atol=1e-5)


def test_pack_gather_map_matches_scatter_map(monkeypatch):
    """The gather-built pack permutation (default) is BIT-IDENTICAL to the
    scatter construction on adversarial segment structures: leading/trailing
    empty rays, runs of empty rays, water-fill truncation, all-empty."""
    import numpy.random as npr
    rng = npr.default_rng(7)
    r, s = 13, 24
    masks = [
        (rng.random((r, s)) < 0.3),
        np.zeros((r, s), bool),                       # all empty
        np.ones((r, s), bool),                        # all valid
    ]
    m = rng.random((r, s)) < 0.5
    m[0] = m[1] = m[5] = m[r - 1] = False             # empty runs + edges
    masks.append(m)
    from pagnerf_tpu.ops.raymarch import RaymarchResult
    for mi, mask in enumerate(masks):
        depths = np.cumsum(rng.random((r, s)).astype(np.float32), -1) * 0.05
        t0 = depths[:, 0].copy()
        span = depths[:, -1] - t0 + 1e-3
        rm = RaymarchResult(
            positionsT=None, depths=jnp.asarray(depths),
            deltas=jnp.full((r, s), 0.05), mask=jnp.asarray(mask),
            t0=jnp.asarray(t0), span=jnp.asarray(span))
        oT = jnp.asarray(rng.random((3, r)).astype(np.float32))
        dT = jnp.asarray(rng.random((3, r)).astype(np.float32))
        for budget in (int(mask.sum()) + 4, max(4, int(mask.sum()) // 2)):
            monkeypatch.setenv("PAGNERF_PACK_GATHER_MAP", "1")
            pg = pack_samples(rm, oT, dT, budget=budget)
            monkeypatch.setenv("PAGNERF_PACK_GATHER_MAP", "0")
            psc = pack_samples(rm, oT, dT, budget=budget)
            for f in ("ray_id", "step_id", "offsets", "valid", "depths",
                      "deltas", "positionsT"):
                np.testing.assert_array_equal(
                    np.asarray(getattr(pg, f)), np.asarray(getattr(psc, f)),
                    err_msg=f"mask {mi} budget {budget} field {f}")


def test_pack_water_fills_on_overflow():
    rays, occ, rm = _march()
    counts = np.asarray(rm.mask).sum(-1)
    budget = int(counts.sum()) // 2
    ps = pack_samples(rm, rays.origins.T, rays.dirs.T, budget=budget)
    off = np.asarray(ps.offsets)
    keep = np.diff(off)
    cap = keep.max()
    np.testing.assert_array_equal(keep, np.minimum(counts, cap))
    assert keep.sum() <= budget
    # each ray keeps its SHALLOWEST valid samples
    for r in range(len(counts)):
        steps = np.where(np.asarray(rm.mask)[r])[0][: keep[r]]
        np.testing.assert_array_equal(
            np.asarray(ps.step_id)[off[r]:off[r + 1]], steps)


def test_packed_integration_matches_dense():
    from pagnerf_tpu.ops.composite import exponential_integration_weights
    rays, occ, rm = _march()
    total = int(np.asarray(rm.mask).sum())
    ps = pack_samples(rm, rays.origins.T, rays.dirs.T, budget=total + 3)
    sigma = jax.random.uniform(jax.random.PRNGKey(3), rm.depths.shape) * 3.0
    w_d, a_d = exponential_integration_weights(sigma * rm.deltas, rm.mask)
    sigma_b = sigma.reshape(-1)[ps.ray_id * rm.depths.shape[1] + ps.step_id]
    w_p, a_p = packed_integration_weights(sigma_b * ps.deltas, ps)
    np.testing.assert_allclose(np.asarray(a_p), np.asarray(a_d),
                                rtol=1e-5, atol=1e-6)
    off = np.asarray(ps.offsets)
    for r in range(rm.mask.shape[0]):
        steps = np.where(np.asarray(rm.mask)[r])[0]
        np.testing.assert_allclose(np.asarray(w_p)[off[r]:off[r + 1]],
                                    np.asarray(w_d)[r, steps],
                                    rtol=1e-5, atol=1e-6)


def _trace_pair(tracer_type="PanopticPackedRFTracer", pack_steps=24):
    nef = make_nef() if "DDensity" not in tracer_type else \
        make_nef(cls=__import__("pagnerf_tpu.models.nefs", fromlist=["x"]
                                ).PanopticDDensityNeF)
    params, _, _ = init_nef(nef)
    occ = OccupancyGrid.create(level=3)
    rays = make_test_rays(6)
    dense_cfg = TracerConfig(tracer_type=tracer_type, num_steps=24,
                             ray_max_travel=2.0, ray_sparsity_reg=0.1)
    packed_cfg = dataclasses.replace(dense_cfg, pack_steps=pack_steps)
    return nef, params, occ, rays, dense_cfg, packed_cfg


def test_packed_trace_matches_dense_all_channels():
    nef, params, occ, rays, dense_cfg, packed_cfg = _trace_pair()

    def nef_fn(c, d, ch):
        return nef.apply(params, c, d, frozenset(ch))

    rb_d = trace(nef_fn, rays, occ, dense_cfg, ALL_CH, stage="train")
    rb_p = trace(nef_fn, rays, occ, packed_cfg, ALL_CH, stage="train")
    for ch in ("rgb", "depth", "alpha", "semantics", "inst_embedding",
               "panoptic_alpha", "ray_sparsity_loss"):
        d, p = getattr(rb_d, ch), getattr(rb_p, ch)
        np.testing.assert_allclose(np.asarray(p), np.asarray(d),
                                    rtol=2e-4, atol=2e-5, err_msg=ch)
    np.testing.assert_array_equal(np.asarray(rb_p.hit), np.asarray(rb_d.hit))


def test_packed_dd_trace_matches_dense():
    from pagnerf_tpu.models.nefs import PanopticDDensityNeF
    nef = make_nef(PanopticDDensityNeF)
    params, _, _ = init_nef(nef)
    occ = OccupancyGrid.create(level=3)
    rays = make_test_rays(5)
    dense_cfg = TracerConfig(tracer_type="PanopticDDensityPackedRFTracer",
                             num_steps=16, ray_max_travel=2.0)
    packed_cfg = dataclasses.replace(dense_cfg, pack_steps=16)

    def nef_fn(c, d, ch):
        return nef.apply(params, c, d, frozenset(ch))

    rb_d = trace(nef_fn, rays, occ, dense_cfg, frozenset({"rgb", "semantics"}))
    rb_p = trace(nef_fn, rays, occ, packed_cfg, frozenset({"rgb", "semantics"}))
    np.testing.assert_allclose(np.asarray(rb_p.semantics),
                                np.asarray(rb_d.semantics), rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(rb_p.panoptic_alpha),
                                np.asarray(rb_d.panoptic_alpha),
                                rtol=2e-4, atol=2e-5)


def test_packed_trace_gradients_match_dense():
    """Parameter AND pose (ray-origin) gradients agree with the dense path —
    the pose path exercises segment_broadcast's custom VJP and the
    stop-gradient u-coordinate reconstruction."""
    nef, params, occ, rays, dense_cfg, packed_cfg = _trace_pair()

    def loss(p, origins, cfg):
        r = Rays(origins=origins, dirs=rays.dirs, dist_min=rays.dist_min,
                 dist_max=rays.dist_max)

        def nef_fn(c, d, ch):
            return nef.apply(p, c, d, frozenset(ch))

        rb = trace(nef_fn, r, occ, cfg, frozenset({"rgb", "semantics"}),
                   stage="train")
        return (jnp.sum(rb.rgb ** 2) + jnp.sum(rb.semantics ** 2)
                + jnp.mean(rb.ray_sparsity_loss))

    gp_d, go_d = jax.grad(loss, argnums=(0, 1))(params, rays.origins, dense_cfg)
    gp_p, go_p = jax.grad(loss, argnums=(0, 1))(params, rays.origins, packed_cfg)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(b), np.asarray(a), rtol=5e-3, atol=2e-5), gp_d, gp_p)
    np.testing.assert_allclose(np.asarray(go_p), np.asarray(go_d),
                                rtol=5e-3, atol=2e-5)
    # the integration-level stop-grad contract holds on the packed path too
    g = jax.grad(lambda p: jnp.sum(trace(
        lambda c, d, ch: nef.apply(p, c, d, frozenset(ch)), rays, occ,
        packed_cfg, frozenset({"semantics"}), stage="train"
    ).semantics ** 2))(params)["params"]
    assert float(jnp.abs(g["grid"]["tables"]).sum()) == 0.0
    assert float(jnp.abs(g["delta_grid"]["tables"]).sum()) > 0.0


def test_trainer_packed_stage_and_step():
    from pagnerf_tpu.data.multiview import MultiviewDataset
    from pagnerf_tpu.data.synthetic import make_dataset
    from pagnerf_tpu.models.nefs import GridConfig, PanopticDeltaNeF
    from pagnerf_tpu.models.pipeline import BAPipeline
    from pagnerf_tpu.train.optimizer import OptimizerConfig
    from pagnerf_tpu.train.trainer import PanopticTrainer, TrainerConfig

    ds = MultiviewDataset(make_dataset(num_views=3, width=16, height=12))
    si = ds.semantic_info
    grid = GridConfig(grid_type="PermutoGrid", num_lods=2, feature_dim=2,
                      capacity_log2=8, coarsest_scale=1.0, finest_scale=0.05)
    nef = PanopticDeltaNeF(grid=grid, num_classes=si["num_classes"],
                           num_instances=8, hidden_dim=8,
                           panoptic_features_type="delta")
    pipe = BAPipeline(nef, TracerConfig(num_steps=16, ray_max_travel=2.0),
                      jnp.asarray(ds.data["view_matrices"]),
                      anchor_frame_idxs=[0])
    cfg = TrainerConfig(batch_size=2, num_rays_sampled_per_img=32,
                        sem_epoch_start=0, inst_epoch_start=0, prune_every=-1,
                        packed_compaction=True, micro_batch_imgs=1)
    trainer = PanopticTrainer(pipe, ds, cfg, OptimizerConfig(), occ_level=3)

    st0 = trainer.stage_for_epoch(0)
    assert st0.pack_steps == 0           # not pruned yet

    trainer._pruned = True
    trainer._occ_frac = 0.25
    st1 = trainer.stage_for_epoch(0)
    assert st1.pack_steps == 8           # ceil(1.15*0.25*16/8)*8
    assert st1.compact_steps == 0

    rng = np.random.default_rng(0)
    batch = ds.sample_batch(rng, 2, 32)
    losses = trainer.train_step(st1, batch)
    assert np.isfinite(float(losses["total_loss"]))
    losses2 = trainer.train_step(st1, batch)
    assert np.isfinite(float(losses2["total_loss"]))

    # degenerate packed budget (1.15*frac >= 1 -> pack = 0) falls through to
    # the compact_steps_after_prune rule instead of running dense (advisor
    # round-3 finding): with an explicit compact budget it must be honoured
    trainer.cfg = dataclasses.replace(trainer.cfg, compact_steps_after_prune=8)
    trainer._occ_frac = 0.95
    st2 = trainer.stage_for_epoch(0)
    assert st2.pack_steps == 0
    assert st2.compact_steps == 8
