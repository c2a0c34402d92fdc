"""NeF / tracer / pipeline tests — shapes, channel gating, and the three
stop-gradient contracts (SURVEY.md §7 hard part 3):
  1. feature-level: panoptic heads see detached colour features
     (panoptic_delta_nef.py:214-226)
  2. density-level: panoptic_density detaches the raw density logit
     (panoptic_dd_nef.py:248-252)
  3. integration-level: panoptic channels integrate under detached tau
     (panoptic_packed_rf_tracer.py:148-156)
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pagnerf_tpu.core.rays import Rays
from pagnerf_tpu.models.nefs import (GridConfig, PanopticDDensityNeF,
                                     PanopticDeltaNeF, PanopticNeF)
from pagnerf_tpu.models.pipeline import BAPipeline, Pipeline
from pagnerf_tpu.models.tracer import TracerConfig, trace
from pagnerf_tpu.ops.occupancy import OccupancyGrid

TINY_GRID = GridConfig(grid_type="PermutoGrid", num_lods=3, feature_dim=2,
                       capacity_log2=8, coarsest_scale=1.0, finest_scale=0.05)
TINY_HASH = GridConfig(grid_type="HashGrid", num_lods=3, feature_dim=2,
                       log2_table_size=8, base_resolution=4, finest_resolution=16)

ALL_CH = frozenset({"density", "rgb", "semantics", "inst_embedding"})


def make_nef(cls=PanopticDeltaNeF, grid=TINY_GRID, **kw):
    defaults = dict(grid=grid, num_classes=5, num_instances=8, hidden_dim=16,
                    sem_softmax=True, inst_softmax=True,
                    panoptic_features_type="delta")
    if cls is PanopticNeF:
        defaults.pop("panoptic_features_type")
    defaults.update(kw)
    return cls(**defaults)


def init_nef(nef, n=12):
    """Returns params + feature-major coordsT/dirsT [3, n] (the NeF hot-path API)."""
    coords = jax.random.uniform(jax.random.PRNGKey(0), (n, 3), minval=-1, maxval=1)
    dirs = jax.random.normal(jax.random.PRNGKey(1), (n, 3))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    params = nef.init(jax.random.PRNGKey(2), coords.T, dirs.T,
                      nef.supported_channels())
    return params, coords.T, dirs.T


def test_panoptic_nef_shapes_and_gating():
    nef = make_nef(PanopticNeF, grid=TINY_HASH)
    params, coords, dirs = init_nef(nef)
    out = nef.apply(params, coords, dirs, ALL_CH)
    assert out["density"].shape == (1, 12)
    assert out["rgb"].shape == (3, 12)
    assert out["semantics"].shape == (5, 12)
    assert out["inst_embedding"].shape == (8, 12)
    assert (np.asarray(out["density"]) >= 0).all()
    np.testing.assert_allclose(np.asarray(out["semantics"]).sum(0), 1.0, atol=1e-5)
    # gating: only requested channels materialise
    only_d = nef.apply(params, coords, dirs, frozenset({"density"}))
    assert set(only_d.keys()) == {"density"}


def test_delta_nef_param_structure():
    nef = make_nef()
    params, _, _ = init_nef(nef)
    names = set(params["params"].keys())
    assert "grid" in names and "delta_grid" in names
    assert {"decoder_density", "decoder_color", "decoder_semantics",
            "decoder_inst"} <= names


def test_delta_nef_stop_gradient_contract():
    """Semantic loss must not update the main grid; RGB loss must not update the
    delta grid (panoptic_delta_nef.py:214-226)."""
    nef = make_nef()
    params, coords, dirs = init_nef(nef)

    def sem_loss(p):
        out = nef.apply(p, coords, dirs, frozenset({"semantics", "inst_embedding"}))
        return jnp.sum(out["semantics"] ** 2) + jnp.sum(out["inst_embedding"] ** 2)

    g = jax.grad(sem_loss)(params)["params"]
    assert float(jnp.abs(g["grid"]["tables"]).sum()) == 0.0
    assert float(jnp.abs(g["delta_grid"]["tables"]).sum()) > 0.0
    assert float(sum(jnp.abs(x).sum() for x in jax.tree.leaves(g["decoder_semantics"]))) > 0.0
    # no gradient into the colour/density decoders from panoptic channels
    assert float(sum(jnp.abs(x).sum() for x in jax.tree.leaves(g["decoder_density"]))) == 0.0

    def rgb_loss(p):
        out = nef.apply(p, coords, dirs, frozenset({"rgb"}))
        return jnp.sum(out["rgb"] ** 2)

    g2 = jax.grad(rgb_loss)(params)["params"]
    assert float(jnp.abs(g2["grid"]["tables"]).sum()) > 0.0
    assert float(jnp.abs(g2["delta_grid"]["tables"]).sum()) == 0.0


def test_delta_nef_feature_modes():
    for mode in ["delta", "separate", "appearance", "pos_encoding", "position"]:
        nef = make_nef(panoptic_features_type=mode)
        params, coords, dirs = init_nef(nef, n=6)
        out = nef.apply(params, coords, dirs, frozenset({"semantics"}))
        assert out["semantics"].shape == (5, 6), mode


def test_dd_nef_density_stop_gradient():
    """panoptic_density must not backprop into the main density decoder
    (panoptic_dd_nef.py:248-252)."""
    nef = make_nef(PanopticDDensityNeF)
    params, coords, dirs = init_nef(nef)
    out = nef.apply(params, coords, dirs,
                    frozenset({"density", "panoptic_density", "delta_density"}))
    assert out["panoptic_density"].shape == (1, 12)
    assert (np.asarray(out["panoptic_density"]) >= 0).all()

    def pd_loss(p):
        o = nef.apply(p, coords, dirs, frozenset({"panoptic_density"}))
        return jnp.sum(o["panoptic_density"] ** 2)

    g = jax.grad(pd_loss)(params)["params"]
    assert float(sum(jnp.abs(x).sum() for x in jax.tree.leaves(g["decoder_density"]))) == 0.0
    assert float(sum(jnp.abs(x).sum() for x in jax.tree.leaves(g["decoder_delta_density"]))) > 0.0
    assert float(jnp.abs(g["grid"]["tables"]).sum()) == 0.0
    assert float(jnp.abs(g["delta_grid"]["tables"]).sum()) > 0.0


def make_test_rays(n=16):
    o = jnp.tile(jnp.array([[0.0, 0.0, 2.5]]), (n, 1))
    ang = jnp.linspace(-0.3, 0.3, n)
    d = jnp.stack([jnp.sin(ang), jnp.zeros_like(ang), -jnp.cos(ang)], -1)
    return Rays(origins=o, dirs=d, dist_min=jnp.float32(0.0),
                dist_max=jnp.float32(6.0))


def test_tracer_shapes_and_bg():
    nef = make_nef()
    params, _, _ = init_nef(nef)
    occ = OccupancyGrid.create(level=3)
    rays = make_test_rays(8)
    cfg = TracerConfig(num_steps=16, bg_color="white", ray_max_travel=2.0)

    def nef_fn(c, d, ch):
        return nef.apply(params, c, d, frozenset(ch))

    rb = trace(nef_fn, rays, occ, cfg,
               frozenset({"rgb", "depth", "semantics", "inst_embedding"}))
    assert rb.rgb.shape == (8, 3)
    assert rb.depth.shape == (8, 1)
    assert rb.alpha.shape == (8, 1)
    assert rb.hit.shape == (8,)
    assert rb.semantics.shape == (8, 5)
    assert rb.inst_embedding.shape == (8, 8)
    # fresh model: colours near sigmoid(0)=0.5 blended with white bg
    assert 0.3 < np.asarray(rb.rgb).mean() < 1.01


def test_tracer_integration_stop_gradient():
    """Panoptic ray outputs must not produce gradients on the density path
    (tracer detached integration, panoptic_packed_rf_tracer.py:148-156)."""
    nef = make_nef()
    params, _, _ = init_nef(nef)
    occ = OccupancyGrid.create(level=3)
    rays = make_test_rays(4)
    cfg = TracerConfig(num_steps=8)

    def loss(p):
        def nef_fn(c, d, ch):
            return nef.apply(p, c, d, frozenset(ch))
        rb = trace(nef_fn, rays, occ, cfg, frozenset({"semantics"}), stage="train")
        return jnp.sum(rb.semantics ** 2)

    g = jax.grad(loss)(params)["params"]
    assert float(sum(jnp.abs(x).sum() for x in jax.tree.leaves(g["decoder_density"]))) == 0.0
    assert float(jnp.abs(g["grid"]["tables"]).sum()) == 0.0
    assert float(jnp.abs(g["delta_grid"]["tables"]).sum()) > 0.0


def test_dd_tracer_panoptic_density_transmittance():
    nef = make_nef(PanopticDDensityNeF)
    params, _, _ = init_nef(nef)
    occ = OccupancyGrid.create(level=3)
    rays = make_test_rays(4)
    cfg = TracerConfig(tracer_type="PanopticDDensityPackedRFTracer", num_steps=8)

    def nef_fn(c, d, ch):
        return nef.apply(params, c, d, frozenset(ch))

    rb = trace(nef_fn, rays, occ, cfg, frozenset({"rgb", "semantics"}))
    assert rb.semantics.shape == (4, 5)
    assert rb.panoptic_alpha.shape == (4, 1)


def test_ba_pipeline_pose_gradients():
    """Pose parameters receive gradients through the render; anchor frames don't
    (ba_pipeline.py:56-61)."""
    nef = make_nef(grid=TINY_HASH)
    views = jnp.tile(jnp.eye(4)[None], (3, 1, 1))
    pipe = BAPipeline(nef, TracerConfig(num_steps=8), views, anchor_frame_idxs=[0])
    params = pipe.init(jax.random.PRNGKey(0))
    assert params["extrinsics"].shape == (3, 9)
    occ = OccupancyGrid.create(level=3)
    base = make_test_rays(6).reshape(2, 3)
    cam_idx = jnp.array([0, 2])

    def loss(p):
        rb = pipe(p, base, frozenset({"rgb"}), occ, cam_idx=cam_idx)
        return jnp.sum(rb.rgb ** 2)

    g = jax.grad(loss)(params)
    ge = np.asarray(jnp.abs(g["extrinsics"]).sum(axis=-1))
    assert ge[0] == 0.0          # anchor frame masked
    assert ge[2] > 0.0           # optimised frame gets pose gradients
    assert ge[1] == 0.0          # camera not in batch


def test_pipeline_render_plain():
    nef = make_nef(grid=TINY_HASH)
    pipe = Pipeline(nef, TracerConfig(num_steps=8))
    params = pipe.init(jax.random.PRNGKey(0))
    occ = OccupancyGrid.create(level=3)
    rb = pipe(params, make_test_rays(5), frozenset({"rgb", "depth"}), occ)
    assert rb.rgb.shape == (5, 3) and rb.depth.shape == (5, 1)


def test_delta_nef_dual_fusion_matches_unfused():
    """The shared-lattice dual-grid encode (fuse_dual_grid) must be numerically
    identical — values AND gradients — to the two-pass path it replaces."""
    params = None
    outs, grads = [], []
    for fuse in (True, False):
        nef = make_nef(fuse_dual_grid=fuse)
        if params is None:
            params, coords, dirs = init_nef(nef)

        def loss(p, c):
            out = nef.apply(p, c, dirs, ALL_CH)
            return (jnp.sum(out["rgb"] ** 2) + jnp.sum(out["semantics"] ** 2)
                    + jnp.sum(out["inst_embedding"] ** 2)
                    + jnp.sum(out["density"])), out

        (v, out), g = jax.value_and_grad(loss, argnums=(0, 1),
                                         has_aux=True)(params, coords)
        outs.append((v, out))
        grads.append(g)
    np.testing.assert_allclose(float(outs[0][0]), float(outs[1][0]), rtol=1e-5)
    for ch in ALL_CH:
        np.testing.assert_allclose(np.asarray(outs[0][1][ch]),
                                   np.asarray(outs[1][1][ch]), atol=1e-5,
                                   err_msg=ch)
    flat_f = jax.tree_util.tree_leaves_with_path(grads[0])
    flat_u = dict(jax.tree_util.tree_leaves_with_path(grads[1]))
    for kp, leaf in flat_f:
        np.testing.assert_allclose(np.asarray(leaf), np.asarray(flat_u[kp]),
                                   atol=1e-4, err_msg=str(kp))


def test_dd_nef_dual_fusion_matches_unfused():
    for fuse in (True, False):
        nef = make_nef(PanopticDDensityNeF, fuse_dual_grid=fuse)
        params, coords, dirs = init_nef(nef, n=8)
        out = nef.apply(params, coords, dirs,
                        frozenset({"rgb", "density", "panoptic_density",
                                   "semantics"}))
        if fuse:
            ref = out
        else:
            for ch in ref:
                np.testing.assert_allclose(np.asarray(ref[ch]),
                                           np.asarray(out[ch]), atol=1e-5,
                                           err_msg=ch)


def test_ray_chunk_sparsity_excludes_padding_rays():
    """The chunked trace pads rays to a block multiple; the padding rays march
    through the real scene and must NOT contribute to ray_sparsity_loss (the
    reference has no padding at all). Chunked == unchunked, value AND grads."""
    nef = make_nef()
    params, _, _ = init_nef(nef)
    occ = OccupancyGrid.create(level=3)
    rays = make_test_rays(7)                      # NOT a multiple of blk=4
    base = dict(num_steps=16, ray_sparsity_reg=0.1)

    def loss(p, cfg):
        def nef_fn(c, d, ch):
            return nef.apply(p, c, d, frozenset(ch))
        rb = trace(nef_fn, rays, occ, TracerConfig(**cfg),
                   frozenset({"rgb"}), stage="train")
        return rb.ray_sparsity_loss

    v_flat, g_flat = jax.value_and_grad(loss)(params, base)
    v_chnk, g_chnk = jax.value_and_grad(loss)(params, dict(base, ray_chunk=4))
    np.testing.assert_allclose(float(v_chnk), float(v_flat), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(g_flat), jax.tree.leaves(g_chnk)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=1e-7)


def test_base_nef_inst_softmax_discards_sigmoid_normalize():
    """Reference BASE NeF quirk (panoptic_nef.py:358-361): with inst_softmax
    the softmax applies to the RAW re-decoded logits — inst_sigmoid /
    inst_normalize have no effect on the output."""
    import dataclasses as _dc

    kw = dict(grid=TINY_GRID, num_classes=5, num_instances=8, hidden_dim=16,
              inst_softmax=True)
    coords = jnp.linspace(-0.5, 0.5, 18).reshape(3, 6)
    dirs = jnp.ones((3, 6)) / jnp.sqrt(3.0)
    key = jax.random.PRNGKey(0)

    def run(**extra):
        nef = PanopticNeF(**kw, **extra)
        p = nef.init(key, coords, dirs, frozenset({"inst_embedding"}))
        return np.asarray(nef.apply(p, coords, dirs,
                                    frozenset({"inst_embedding"}))["inst_embedding"])

    plain = run()
    with_chain = run(inst_sigmoid=True, inst_normalize=True)
    np.testing.assert_allclose(with_chain, plain, atol=1e-6)
    np.testing.assert_allclose(plain.sum(axis=0), 1.0, rtol=1e-5)  # is a softmax


def test_panoptic_nef_rejects_tensorf_grid():
    """Reference parity: the panoptic NeF registry raises NotImplementedError
    for TensoRF (panoptic_nef.py:180-181)."""
    import pytest

    nef = PanopticNeF(grid=GridConfig(grid_type="TensoRF"), num_classes=3,
                      num_instances=4)
    coords = jnp.zeros((3, 2))
    with pytest.raises(NotImplementedError):
        nef.init(jax.random.PRNGKey(0), coords, None, frozenset({"density"}))


def test_panoptic_bg_residual_empty_rays_predict_background():
    """With panoptic_bg_residual, residual transmittance composites into slot 0
    of both panoptic channels: a ray through empty space predicts
    background/stuff with p ~= 1 instead of p = 0 for every class (whose
    -log(p + 1e-27) slope is unbounded — the round-4 flagship incident). On
    rays with alpha ~= 1 the residual is a no-op (BUP20-like data)."""
    def nef_fn(c, d, ch):
        n = c.shape[1]
        out = {}
        if "density" in ch:
            out["density"] = jnp.zeros((1, n))
        if "rgb" in ch:
            out["rgb"] = jnp.full((3, n), 0.5)
        if "semantics" in ch:
            out["semantics"] = jnp.full((5, n), 0.2)
        if "inst_embedding" in ch:
            out["inst_embedding"] = jnp.full((8, n), 0.125)
        return out

    occ = OccupancyGrid.create(level=3)
    rays = make_test_rays(4)
    for pack in (0, 16):
        cfg = TracerConfig(num_steps=16, pack_steps=pack,
                           panoptic_bg_residual=True)
        rb = trace(nef_fn, rays, occ, cfg,
                   frozenset({"semantics", "inst_embedding"}), stage="train")
        sem, inst = np.asarray(rb.semantics), np.asarray(rb.inst_embedding)
        np.testing.assert_allclose(sem[:, 0], 1.0, atol=1e-5)
        np.testing.assert_allclose(sem[:, 1:], 0.0, atol=1e-5)
        np.testing.assert_allclose(inst[:, 0], 1.0, atol=1e-5)
        np.testing.assert_allclose(sem.sum(-1), 1.0, atol=1e-5)

        off = TracerConfig(num_steps=16, pack_steps=pack)
        rb0 = trace(nef_fn, rays, occ, off,
                    frozenset({"semantics"}), stage="train")
        np.testing.assert_allclose(np.asarray(rb0.semantics), 0.0, atol=1e-5)


def test_panoptic_bg_residual_partial_alpha_sums_to_one():
    """Soft-probability channels + bg residual always sum to exactly 1 per ray
    (alpha^2 * composite + (1 - alpha^2) on slot 0), and the residual carries
    no density gradient for non-DD tracers (panop_tau is detached)."""
    nef = make_nef()
    params, _, _ = init_nef(nef)
    occ = OccupancyGrid.create(level=3)
    rays = make_test_rays(6)
    cfg = TracerConfig(num_steps=16, ray_max_travel=2.0,
                       panoptic_bg_residual=True)

    def nef_fn(c, d, ch):
        return nef.apply(params, c, d, frozenset(ch))

    rb = trace(nef_fn, rays, occ, cfg, frozenset({"semantics"}), stage="train")
    sem = np.asarray(rb.semantics)
    np.testing.assert_allclose(sem.sum(-1), 1.0, atol=1e-5)
    assert (sem >= -1e-6).all()

    def loss(p):
        def fn(c, d, ch):
            return nef.apply(p, c, d, frozenset(ch))
        out = trace(fn, rays, occ, cfg, frozenset({"semantics"}), stage="train")
        return jnp.sum(out.semantics ** 2)

    g = jax.grad(loss)(params)["params"]
    assert float(jnp.abs(g["grid"]["tables"]).sum()) == 0.0
    assert float(sum(jnp.abs(x).sum()
                     for x in jax.tree.leaves(g["decoder_density"]))) == 0.0


def test_sem_zero_init_head_starts_uniform():
    """sem_zero_init zeroes the semantic head's output kernel: a fresh head
    decoding arbitrary (e.g. already-trained) base features emits the uniform
    softmax instead of a confidently-wrong one (measured at the round-4
    flagship boundary: normalized entropy 0.72 vs uniform 1.10). Other heads
    keep their usual init."""
    nef = make_nef(PanopticNeF, grid=TINY_HASH, sem_zero_init=True)
    params, coords, dirs = init_nef(nef)
    k = params["params"]["decoder_semantics"]["lout"]["kernel"]
    assert float(jnp.abs(k).max()) == 0.0
    out = nef.apply(params, coords, dirs, frozenset({"semantics"}))
    np.testing.assert_allclose(np.asarray(out["semantics"]), 0.2, atol=1e-6)
    # hidden layers and the other heads are NOT zero-initialised
    assert float(jnp.abs(params["params"]["decoder_semantics"]["hidden_0"]["kernel"]).max()) > 0.0
    assert float(jnp.abs(params["params"]["decoder_inst"]["lout"]["kernel"]).max()) > 0.0

    nef_off = make_nef(PanopticNeF, grid=TINY_HASH, sem_zero_init=False)
    p_off, _, _ = init_nef(nef_off)
    assert float(jnp.abs(p_off["params"]["decoder_semantics"]["lout"]["kernel"]).max()) > 0.0

def test_panoptic_bg_residual_gated_off_for_non_probability_inst():
    """ADVICE r4: the slot-0 residual is only meaningful for probability
    outputs. With bg_residual_inst=False (factory sets this when the instance
    head is not softmax-normalised, e.g. inst_sigmoid / raw embeddings), the
    instance channel must be bit-identical to the no-residual trace while the
    semantic channel still receives the residual."""
    def nef_fn(c, d, ch):
        n = c.shape[1]
        out = {}
        if "density" in ch:
            out["density"] = jnp.zeros((1, n))
        if "semantics" in ch:
            out["semantics"] = jnp.full((5, n), 0.2)
        if "inst_embedding" in ch:
            out["inst_embedding"] = jnp.full((8, n), 0.3)   # raw embedding
        return out

    occ = OccupancyGrid.create(level=3)
    rays = make_test_rays(4)
    chans = frozenset({"semantics", "inst_embedding"})
    for pack in (0, 16):
        gated = TracerConfig(num_steps=16, pack_steps=pack,
                             panoptic_bg_residual=True, bg_residual_inst=False)
        off = TracerConfig(num_steps=16, pack_steps=pack)
        rb_g = trace(nef_fn, rays, occ, gated, chans, stage="train")
        rb_0 = trace(nef_fn, rays, occ, off, chans, stage="train")
        np.testing.assert_array_equal(np.asarray(rb_g.inst_embedding),
                                      np.asarray(rb_0.inst_embedding))
        # semantics still gets the residual (empty scene -> slot0 == 1)
        np.testing.assert_allclose(np.asarray(rb_g.semantics)[:, 0], 1.0,
                                   atol=1e-5)


def test_factory_gates_bg_residual_on_softmax_flags():
    """config factory disables the per-channel residual when the head is not
    softmax-normalised (and warns)."""
    from pagnerf_tpu.config.config import parse_options
    from pagnerf_tpu.config.factory import get_modules_from_config

    args = parse_options([
        "--config", "configs/synthetic/tiny.yaml",
        "--panoptic-bg-residual", "true",
        "--inst-softmax", "false", "--inst-sigmoid", "true",
    ])
    pipeline, _, _ = get_modules_from_config(args)
    cfg = pipeline.tracer_cfg
    assert cfg.panoptic_bg_residual
    assert cfg.bg_residual_sem
    assert not cfg.bg_residual_inst
    assert not cfg.bg_residual_on("inst_embedding")
    assert cfg.bg_residual_on("semantics")
