"""DenseGrid (OctreeGrid-equivalent) tests and config-variant smoke checks."""
import jax
import jax.numpy as jnp
import numpy as np

from pagnerf_tpu.models.grids import DenseGrid, build_grid


def test_dense_grid_shapes_and_continuity():
    grid = DenseGrid(num_lods=2, feature_dim=4, base_lod=3)
    c = jax.random.uniform(jax.random.PRNGKey(0), (3, 9), minval=-1, maxval=1)
    params = grid.init(jax.random.PRNGKey(1), c)
    out = grid.apply(params, c)
    assert out.shape == (8, 9)
    # trilinear continuity across a cell boundary
    eps = 1e-5
    a = grid.apply(params, jnp.array([[0.25 - eps], [0.1], [0.1]]))
    b = grid.apply(params, jnp.array([[0.25 + eps], [0.1], [0.1]]))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-3)
    # direct indexing: a coordinate exactly on a grid vertex returns that entry
    g = jax.grad(lambda p: grid.apply(p, c).sum())(params)
    assert sum(float(jnp.abs(x).sum()) for x in jax.tree.leaves(g)) > 0


def test_octree_grid_aliases():
    g1 = build_grid("OctreeGrid", num_lods=2, feature_dim=4, base_lod=3)
    assert isinstance(g1, DenseGrid)
    g2 = build_grid("CodebookOctreeGrid", num_lods=2, feature_dim=2,
                    log2_table_size=8)
    from pagnerf_tpu.models.grids import HashGrid
    assert isinstance(g2, HashGrid)


def test_config_variants_parse():
    from pagnerf_tpu.config.config import parse_options
    # expectations mirror the reference configs' effective values exactly
    # (reference configs/bup20/*.yaml; see commit "Mirror the reference
    # experiment matrix's effective values exactly")
    for cfg, nef, tracer, epochs in [
        ("configs/bup20/panoptic_nerf.yaml", "MeanShiftPanopticNeF",
         "PackedRFTracer", 200),
        ("configs/bup20/panoptic_dd.yaml", "PanopticDDensityNeF",
         "PanopticDDensityPackedRFTracer", 800),
        ("configs/bup20/semantic_nerf_app.yaml", "SemanticNeF",
         "PackedRFTracer", 800),
        ("configs/bup20/panoptic_lifting_app.yaml", "PanopticLiftingNeF",
         "PanopticPackedRFTracer", 800),
        ("configs/bup20/mean_shift_contrastive.yaml",
         "MeanShiftPanopticDeltaNeF", "PanopticPackedRFTracer", 800),
    ]:
        args = parse_options(["--config", cfg])
        assert args.nef_type == nef, cfg
        assert args.tracer_type == tracer, cfg
        # parent inheritance pulled defaults through
        assert args.epochs == epochs, cfg


def test_grid_registry_accepts_all_reference_names():
    # every grid_type string the reference configs/registry can select
    # (SURVEY.md §2.3) must build (panoptic_nef.py:165-182 equivalent)
    from pagnerf_tpu.models.grids import build_grid
    for name in ("PermutoGrid", "HashGrid", "HashGridTorch", "HashGridTinyCudaNN",
                 "TriplanarGrid", "TensoRF", "OctreeGrid", "CodebookOctreeGrid",
                 "Occtree"):
        g = build_grid(name, num_lods=2, feature_dim=2)
        assert g is not None, name
