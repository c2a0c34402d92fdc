"""Raymarch + compositing tests: AABB intersection, occupancy skipping, max-travel
filter, exponential integration vs closed form."""
import jax
import jax.numpy as jnp
import numpy as np

from pagnerf_tpu.core.rays import Rays
from pagnerf_tpu.ops.composite import (composite_channel, composite_scalar,
                                       exponential_integration_weights)
from pagnerf_tpu.ops.occupancy import OccupancyGrid
from pagnerf_tpu.ops.raymarch import aabb_intersect, raymarch


def make_rays(origins, dirs, dist_max=6.0):
    o = jnp.asarray(origins, jnp.float32)
    d = jnp.asarray(dirs, jnp.float32)
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    return Rays(origins=o, dirs=d, dist_min=jnp.float32(0.0),
                dist_max=jnp.float32(dist_max))


def test_aabb_intersect():
    rays = make_rays([[0, 0, 3], [0, 0, 3], [5, 5, 5]],
                     [[0, 0, -1], [0, 1, 0], [1, 1, 1]])
    t_near, t_far, hit = aabb_intersect(rays)
    assert bool(hit[0]) and not bool(hit[1]) and not bool(hit[2])
    np.testing.assert_allclose(float(t_near[0]), 2.0, atol=1e-5)
    np.testing.assert_allclose(float(t_far[0]), 4.0, atol=1e-5)


def test_raymarch_samples_inside_cube():
    occ = OccupancyGrid.create(level=4)
    rays = make_rays([[0, 0, 3]], [[0, 0, -1]])
    rm = raymarch(rays, occ, num_steps=32)
    pos = np.asarray(rm.positions[rm.mask])
    assert pos.shape[0] > 0
    assert (np.abs(pos) <= 1.0 + 1e-4).all()
    # deltas consistent with depth spacing
    np.testing.assert_allclose(np.asarray(rm.deltas[0])[0],
                               (np.asarray(rm.depths[0])[-1] - np.asarray(rm.depths[0])[0])
                               / 31, rtol=0.1)


def test_raymarch_occupancy_skipping():
    occ = OccupancyGrid.create(level=3)
    res = occ.res
    # empty out the z > 0 half of the cube
    ijk = np.stack(np.meshgrid(np.arange(res), np.arange(res), np.arange(res),
                               indexing="ij"), -1).reshape(-1, 3)
    z_center = (ijk[:, 2] + 0.5) / res * 2 - 1
    mask = z_center < 0
    occ = OccupancyGrid(occupancy=jnp.asarray(mask, jnp.float32),
                        mask=jnp.asarray(mask), level=3)

    rays = make_rays([[0.01, 0.01, 3]], [[0, 0, -1]])
    rm = raymarch(rays, occ, num_steps=64)
    valid_z = np.asarray(rm.positions[..., 2])[np.asarray(rm.mask)]
    assert valid_z.size > 0 and (valid_z < 0).all()


def test_raymarch_max_travel_is_voxel_mode_only():
    """The reference applies ray_max_travel ONLY in voxel mode
    (tracers/panoptic_packed_rf_tracer.py:88 gates on raymarch_type=='voxel');
    'ray' mode keeps every occupied AABB sample regardless of travel."""
    occ = OccupancyGrid.create(level=3)
    rays = make_rays([[0, 0, 3]], [[0, 0, -1]])
    rm = raymarch(rays, occ, num_steps=64, ray_max_travel=0.5)
    d = np.asarray(rm.depths)[np.asarray(rm.mask)]
    assert d.size > 0
    assert d.max() - d.min() > 0.5  # full ~2.0 AABB chord stays supervised


def test_voxel_mode_concentrates_samples():
    occ = OccupancyGrid.create(level=3)
    rays = make_rays([[0, 0, 3]], [[0, 0, -1]])
    rm = raymarch(rays, occ, num_steps=16, raymarch_type="voxel", ray_max_travel=0.5)
    d = np.asarray(rm.depths[0])
    # all samples within [first hit, first hit + max_travel]
    assert d.max() - d.min() <= 0.5 + 1e-5


def test_exponential_integration_matches_closed_form():
    # constant density sigma over a segment: alpha = 1 - exp(-sigma * L)
    r, s = 1, 256
    sigma = 3.0
    length = 1.5
    tau = jnp.full((r, s), sigma * length / s)
    mask = jnp.ones((r, s), bool)
    weights, alpha = exponential_integration_weights(tau, mask)
    np.testing.assert_allclose(float(alpha[0, 0]), 1 - np.exp(-sigma * length),
                               rtol=1e-5)
    # weights implement w_i = T_i (1 - exp(-tau_i)) with exclusive transmittance
    w = np.asarray(weights[0])
    t = np.exp(-np.cumsum(np.asarray(tau[0]))) / np.exp(-np.asarray(tau[0]))
    np.testing.assert_allclose(w, t * (1 - np.exp(-np.asarray(tau[0]))), rtol=1e-5)


def test_exponential_integration_masked_samples_zero():
    tau = jnp.ones((2, 8))
    mask = jnp.zeros((2, 8), bool).at[0, :4].set(True)
    weights, alpha = exponential_integration_weights(tau, mask)
    assert float(alpha[1, 0]) == 0.0
    assert np.asarray(weights[0, 4:]).sum() == 0.0


def test_composite_channel_and_scalar():
    weights = jnp.array([[0.5, 0.25]])
    feats = jnp.array([[[1.0, 0.0], [0.0, 1.0]]])
    out = composite_channel(feats, weights)
    np.testing.assert_allclose(np.asarray(out), [[0.5, 0.25]], atol=1e-6)
    depths = jnp.array([[2.0, 4.0]])
    np.testing.assert_allclose(float(composite_scalar(depths, weights)[0, 0]), 2.0,
                               atol=1e-6)


def test_compact_samples_preserves_render():
    """With keep_steps >= valid samples per ray, compaction must not change the
    composited result; with fewer, it keeps the NEAREST samples."""
    from pagnerf_tpu.ops.raymarch import compact_samples

    occ = OccupancyGrid.create(level=3)
    rays = make_rays([[0, 0, 3], [0.3, 0.2, 3]], [[0, 0, -1], [0, 0, -1]])
    rm = raymarch(rays, occ, num_steps=32, ray_max_travel=0.7)
    n_valid = int(np.asarray(rm.mask).sum(-1).max())
    cp = compact_samples(rm, n_valid)
    assert cp.depths.shape == (2, n_valid)
    # same valid sample set (sorted first, order preserved)
    for r in range(2):
        want = np.asarray(rm.depths[r])[np.asarray(rm.mask[r])]
        got = np.asarray(cp.depths[r])[np.asarray(cp.mask[r])]
        np.testing.assert_allclose(got, want, atol=1e-6)
        # depth order preserved
        assert (np.diff(got) >= 0).all()
    # positions stay consistent with depths
    pos = np.asarray(cp.positions)
    d = np.asarray(cp.depths)
    np.testing.assert_allclose(pos[0, :, 2], 3 - d[0], atol=1e-5)
    # truncation keeps the nearest samples
    cp2 = compact_samples(rm, max(n_valid // 2, 1))
    for r in range(2):
        got2 = np.asarray(cp2.depths[r])[np.asarray(cp2.mask[r])]
        want = np.asarray(rm.depths[r])[np.asarray(rm.mask[r])]
        np.testing.assert_allclose(got2, want[:len(got2)], atol=1e-6)


def test_occupancy_prune_update():
    occ = OccupancyGrid.create(level=2)
    assert bool(occ.mask.all())  # starts fully visible
    density = jnp.zeros((occ.res ** 3,)).at[0].set(10.0)
    new = occ.update_from_density(density)
    assert float(new.occupancy[0]) == 10.0
    # only the dense cell survives the threshold (10 > 2.96 > 0)
    assert bool(new.mask[0]) and not bool(new.mask[1:].any())


def test_occupancy_prune_dilation():
    """dilate=1 keeps the 3^3 neighbourhood of a surviving cell alive (surface
    margin so thin walls can refine after the prune; trainer prune_dilate)."""
    occ = OccupancyGrid.create(level=2)
    res = occ.res
    center = (res // 2, res // 2, res // 2)
    flat = np.ravel_multi_index(center, (res, res, res))
    density = jnp.zeros((res ** 3,)).at[flat].set(10.0)
    new = occ.update_from_density(density, dilate=1)
    mask = np.asarray(new.mask).reshape(res, res, res)
    cz, cy, cx = center
    assert mask[cz - 1:cz + 2, cy - 1:cy + 2, cx - 1:cx + 2].all()
    assert mask.sum() == 27   # exactly the one-cell margin, nothing else
    # occupancy values are NOT dilated — only the visibility mask
    assert float(new.occupancy.sum()) == 10.0


def test_occupancy_monotone_prune():
    """monotone=True (reference kaolin-SPC parity: octree prunes only REMOVE
    cells) blocks free revival of dead cells whose density drifted above the
    threshold, while dilation still re-expands a bounded 1-cell margin."""
    occ = OccupancyGrid.create(level=2)
    res = occ.res
    c = res // 2
    flat = int(np.ravel_multi_index((c, c, c), (res, res, res)))
    far = int(np.ravel_multi_index((0, 0, 0), (res, res, res)))
    density = jnp.zeros((res ** 3,)).at[flat].set(10.0)
    seeded = occ.update_from_density(density, monotone=True)  # virgin: no-op AND
    assert bool(seeded.mask[flat]) and not bool(seeded.mask[far])

    # a dead far cell's density drifts up (hash-collision updates, zero
    # supervision): free revival re-admits it, monotone does not
    drift = jnp.zeros((res ** 3,)).at[flat].set(10.0).at[far].set(10.0)
    revived = seeded.update_from_density(drift)
    assert bool(revived.mask[far])
    kept = seeded.update_from_density(drift, monotone=True)
    assert not bool(kept.mask[far]) and bool(kept.mask[flat])

    # bounded re-expansion: dilation AFTER the AND grows 1 cell per prune
    kept_d = seeded.update_from_density(drift, monotone=True, dilate=1)
    mask = np.asarray(kept_d.mask).reshape(res, res, res)
    assert mask[c - 1:c + 2, c - 1:c + 2, c - 1:c + 2].all()
    assert not mask[0, 0, 0]


def test_voxel_probe_finds_thin_wall_regardless_of_num_steps():
    """The first-hit probe resolution follows the GRID, not num_steps: a
    1-cell-thick occupied wall must be found (and its front face covered via
    the one-probe-step backoff) even when num_steps probes would step over it."""
    occ0 = OccupancyGrid.create(level=4)
    res = occ0.res
    ijk = np.stack(np.meshgrid(np.arange(res), np.arange(res), np.arange(res),
                               indexing="ij"), -1).reshape(-1, 3)
    wall_k = res // 4                       # single-cell-thick z-slab
    mask = ijk[:, 2] == wall_k
    occ = OccupancyGrid(occupancy=jnp.asarray(mask, jnp.float32),
                        mask=jnp.asarray(mask), level=4)
    z_lo = wall_k / res * 2 - 1             # wall front face (ray travels -z)
    z_hi = (wall_k + 1) / res * 2 - 1
    rays = make_rays([[0.01, 0.01, 3]], [[0, 0, -1]])
    # 8 steps over the ~2.0 chord = 0.25 spacing >> the 0.125 cell: the old
    # num_steps-tied probe could miss the wall entirely
    rm = raymarch(rays, occ, num_steps=8, raymarch_type="voxel")
    z = np.asarray(rm.positionsT[2])[np.asarray(rm.mask)]
    assert z.size > 0, "probe stepped over a 1-cell wall"
    assert (z >= z_lo - 1e-5).all() and (z <= z_hi + 1e-5).all()
    # the re-fit interval starts at/before the wall's BACK face (+z side,
    # hit first along -z travel): the backoff covers the face itself
    assert np.asarray(rm.depths).min() <= (3 - z_hi) + 1e-5


def test_windowed_probe_matches_single_stage(monkeypatch):
    """The two-stage (mip + windowed fine) probe finds the same thin wall the
    single-stage probe does, concentrates samples identically (within probe
    spacing), and never loses mask correctness when the mip corridor has no
    fine hit (falls back to the unrefit interval)."""
    level, mt = 5, 0.5
    occ0 = OccupancyGrid.create(level=level)
    res = occ0.res
    ijk = np.stack(np.meshgrid(np.arange(res), np.arange(res), np.arange(res),
                               indexing="ij"), -1).reshape(-1, 3)
    wall_k = res // 4
    mask = ijk[:, 2] == wall_k
    occ = OccupancyGrid(occupancy=jnp.asarray(mask, jnp.float32),
                        mask=jnp.asarray(mask), level=level)
    rays = make_rays([[0.01, 0.01, 3], [-0.3, 0.2, 3]],
                     [[0, 0, -1], [0, 0, -1]])
    monkeypatch.setenv("PAGNERF_WINDOWED_PROBE", "0")
    rm0 = raymarch(rays, occ, num_steps=32, raymarch_type="voxel",
                   ray_max_travel=mt)
    monkeypatch.setenv("PAGNERF_WINDOWED_PROBE", "1")
    rm1 = raymarch(rays, occ, num_steps=32, raymarch_type="voxel",
                   ray_max_travel=mt)
    z_lo = wall_k / res * 2 - 1
    z_hi = (wall_k + 1) / res * 2 - 1
    for rm in (rm0, rm1):
        z = np.asarray(rm.positionsT[2])[np.asarray(rm.mask)]
        assert z.size > 0
        assert (z >= z_lo - 1e-5).all() and (z <= z_hi + 1e-5).all()
        d = np.asarray(rm.depths)
        assert (d.max(-1) - d.min(-1) <= mt + 1e-5).all()
    # refit anchors agree within the two probes' spacing + one mip cell
    cell_c = 2.0 / (1 << (level - 2))
    np.testing.assert_allclose(np.asarray(rm1.t0), np.asarray(rm0.t0),
                               atol=cell_c + 0.1)
    # mip corridor with NO fine hit inside the window: occupancy only in one
    # far corner cell; a central ray crosses its mip cell but misses the fine
    # cell -> windowed probe must fall back to the full unrefit interval
    # (mask all-empty, span not collapsed to max_travel around a false hit)
    mask2 = (ijk == np.array([1, 1, wall_k])).all(-1)
    occ2 = OccupancyGrid(occupancy=jnp.asarray(mask2, jnp.float32),
                         mask=jnp.asarray(mask2), level=level)
    # fine cell (3, 3) shares the occupied fine cell (1, 1)'s 4^3 mip cell:
    # the ray gets a coarse hit but no fine hit anywhere in its window
    x33 = (3.5 / res) * 2 - 1
    corridor_ray = make_rays([[x33, x33, 3]], [[0, 0, -1]])
    rm2 = raymarch(corridor_ray, occ2, num_steps=32, raymarch_type="voxel",
                   ray_max_travel=mt)
    assert not np.asarray(rm2.mask).any()
    assert float(rm2.span[0]) > mt  # no false refit onto the empty corridor


def test_occupancy_lookup_small_grid_levels():
    """res^3 < 128 (levels 1-2) must not crash the 128-lane row reshape."""
    for level in (1, 2):
        occ = OccupancyGrid.create(level=level)
        occ = OccupancyGrid(occupancy=occ.occupancy,
                            mask=occ.mask.at[0].set(False), level=level)
        pts = jnp.asarray([[-0.99, -0.99, -0.99], [0.5, 0.5, 0.5]]).T
        got = np.asarray(occ.occupied_at_T(pts))
        assert got.tolist() == [False, True]


def test_cell_centers_feature_major_matches_sample_major():
    occ = OccupancyGrid.create(level=2)
    key = jax.random.PRNGKey(3)
    ct = occ.cell_centers_jittered_T(key)
    c = occ.cell_centers_jittered(key)
    assert ct.shape == (3, occ.res ** 3)
    np.testing.assert_array_equal(np.asarray(ct.T), np.asarray(c))
    # ordering matches cell_indices flattening: center i lands in cell i
    idx = np.asarray(occ.cell_indices_T(ct))
    np.testing.assert_array_equal(idx, np.arange(occ.res ** 3))
