"""Golden tests for the encoding kernels.

The hash encoding is checked against an independent numpy implementation of the
reference algorithm (grids/hash_grid_torch.py:13-108). The permutohedral encoding is
checked via lattice invariants (barycentric partition of unity, simplex reconstruction,
continuity) and gradient flow.
"""
import jax
import jax.numpy as jnp
import numpy as np

from pagnerf_tpu.ops.hash_encoding import (HashEncodingSpec, geometric_resolutions,
                                           hash_encode, init_hash_table)
from pagnerf_tpu.ops.permuto_encoding import (PermutoEncodingSpec, _E,
                                              permuto_encode,
                                              simplex_vertices_and_weights)


# ---------------------------------------------------------------------------
# numpy reference of the hash-grid algorithm (independent re-implementation of
# grids/hash_grid_torch.py for golden comparison)
# ---------------------------------------------------------------------------

def np_hash(coords, log2_t):
    primes = [1, 2654435761, 805459861]
    h = np.zeros(coords.shape[:-1], dtype=np.uint32)
    for i in range(3):
        h ^= (coords[..., i].astype(np.uint32) * np.uint32(primes[i]))
    return (h & np.uint32((1 << log2_t) - 1)).astype(np.int64)


def np_hash_encode(table, coords, resolutions, log2_t):
    outs = []
    corners = np.array([[i, j, k] for i in (0, 1) for j in (0, 1) for k in (0, 1)])
    for lvl, res in enumerate(resolutions):
        grid_size = 2.0 / res
        x = np.clip(coords, -1, 1)
        cell = (x + 1.0) / grid_size
        bl = np.floor(cell)
        frac = cell - bl
        idx = np_hash(bl[:, None, :].astype(np.int64) + corners[None], log2_t)
        feats = table[lvl][idx]  # [N, 8, F]
        w = np.where(corners[None].astype(bool), frac[:, None, :], 1 - frac[:, None, :])
        w = w[..., 0] * w[..., 1] * w[..., 2]
        outs.append((feats * w[..., None]).sum(1))
    return np.concatenate(outs, -1)


def test_hash_encode_matches_reference_algorithm(rng):
    spec = HashEncodingSpec(num_levels=4, feature_dim=2, log2_table_size=10,
                            base_resolution=4, finest_resolution=32)
    table = spec.init(rng)
    coords = jax.random.uniform(jax.random.PRNGKey(7), (64, 3), minval=-1, maxval=1)
    got = np.asarray(spec.encode(table, coords))
    want = np_hash_encode(np.asarray(table), np.asarray(coords), spec.resolutions,
                          spec.log2_table_size)
    np.testing.assert_allclose(got, want, atol=1e-6)
    assert got.shape == (64, 8)


def test_hash_encode_continuity(rng):
    """Encoding must be continuous across voxel boundaries (trilinear)."""
    spec = HashEncodingSpec(num_levels=2, feature_dim=2, log2_table_size=8,
                            base_resolution=4, finest_resolution=8)
    table = spec.init(rng)
    eps = 1e-5
    c0 = jnp.array([[0.5 - eps, 0.1, 0.2]])
    c1 = jnp.array([[0.5 + eps, 0.1, 0.2]])
    f0 = spec.encode(table, c0)
    f1 = spec.encode(table, c1)
    np.testing.assert_allclose(np.asarray(f0), np.asarray(f1), atol=1e-3)


def test_hash_encode_gradients_flow_to_table(rng):
    spec = HashEncodingSpec(num_levels=2, feature_dim=2, log2_table_size=8,
                            base_resolution=4, finest_resolution=8)
    table = spec.init(rng)
    coords = jax.random.uniform(jax.random.PRNGKey(1), (16, 3), minval=-1, maxval=1)

    def loss(t):
        return jnp.sum(spec.encode(t, coords) ** 2)

    g = jax.grad(loss)(table)
    assert np.asarray(jnp.abs(g).sum()) > 0.0


def test_geometric_resolutions():
    res = geometric_resolutions(16, 512, 16)
    assert res[0] == 16 and res[-1] == 512
    assert np.all(np.diff(res) > 0)


# ---------------------------------------------------------------------------
# permutohedral lattice invariants
# ---------------------------------------------------------------------------

def test_permuto_barycentric_partition_of_unity():
    pts = jax.random.normal(jax.random.PRNGKey(0), (256, 3)) * 3.0
    keys, bary = simplex_vertices_and_weights(pts)
    b = np.asarray(bary)
    np.testing.assert_allclose(b.sum(-1), 1.0, atol=1e-4)
    assert (b > -1e-4).all(), "barycentric weights must be non-negative"


def test_permuto_simplex_reconstruction():
    """The barycentric combination of the 4 simplex vertices reproduces the elevated
    point (defining property of barycentric coordinates)."""
    pts = jax.random.normal(jax.random.PRNGKey(1), (128, 3)) * 2.0
    keys, bary = simplex_vertices_and_weights(pts)
    el = np.asarray(pts @ jnp.asarray(_E.T, jnp.float32))   # [N, 4]
    k3 = np.asarray(keys, np.float64)                        # [N, 4, 3]
    # 4th lattice coordinate implied by sum-zero constraint
    k4 = -k3.sum(-1, keepdims=True)
    verts = np.concatenate([k3, k4], axis=-1)                # [N, 4, 4]
    recon = (np.asarray(bary)[..., None] * verts).sum(1)
    np.testing.assert_allclose(recon, el, atol=2e-2)  # fp32 at lattice magnitudes


def test_permuto_encode_shapes_and_grads(rng):
    spec = PermutoEncodingSpec(num_levels=3, feature_dim=2, capacity_log2=10,
                               coarsest_scale=1.0, finest_scale=0.01)
    tables = spec.init(rng)
    coords = jax.random.uniform(jax.random.PRNGKey(2), (32, 3), minval=-1, maxval=1)
    out = spec.encode(tables, coords)
    assert out.shape == (32, 6)

    def loss(t):
        return jnp.sum(spec.encode(t, coords) ** 2)

    g = jax.grad(loss)(tables)
    assert np.asarray(jnp.abs(g).sum()) > 0.0


def test_permuto_encode_continuity():
    spec = PermutoEncodingSpec(num_levels=2, feature_dim=2, capacity_log2=8,
                               coarsest_scale=1.0, finest_scale=0.1)
    tables = spec.init(jax.random.PRNGKey(3))
    base = jnp.array([[0.123, -0.456, 0.789]])
    eps = 1e-5
    f0 = spec.encode(tables, base)
    f1 = spec.encode(tables, base + eps)
    np.testing.assert_allclose(np.asarray(f0), np.asarray(f1), atol=1e-2)


def test_permuto_scales_geomspace():
    spec = PermutoEncodingSpec(num_levels=24, coarsest_scale=1.0, finest_scale=1e-4)
    assert np.isclose(spec.scales[0], 1.0) and np.isclose(spec.scales[-1], 1e-4)
    ratios = spec.scales[1:] / spec.scales[:-1]
    np.testing.assert_allclose(ratios, ratios[0], rtol=1e-6)


def test_permuto_direct_index_levels():
    """Coarse levels whose lattice fits the capacity index DIRECTLY (zero
    collisions) via the mod-4 key structure; fine levels keep hashing
    (ops/permuto_encoding.direct_level_specs / _index_keys_T)."""
    import numpy as np
    import jax.numpy as jnp
    from pagnerf_tpu.ops.permuto_encoding import (direct_level_specs,
                                                  _index_keys_T,
                                                  simplex_vertices_and_weights_T)
    scales = np.geomspace(1.0, 0.01, 8)
    capacity, f = 2 ** 14, 2
    mm, dm, direct, rows_used = direct_level_specs(scales, capacity, f)
    assert direct[0] and not direct[-1]          # coarse direct, fine hashed
    assert rows_used[0] > 0 and rows_used[-1] == 0
    rng = np.random.default_rng(0)
    pts = jnp.asarray(rng.uniform(-1, 1, (3, 4000)).astype(np.float32))
    for l, s in enumerate(scales):
        keys, _ = simplex_vertices_and_weights_T(pts / float(s))
        idx = np.asarray(_index_keys_T(keys, 14, int(mm[l]), int(dm[l]),
                                       bool(direct[l])))
        assert idx.min() >= 0 and idx.max() < capacity
        if direct[l]:
            # in-bounds of the advertised row budget
            assert (idx // (128 // f)) .max() < rows_used[l]
            # collision-free: distinct keys -> distinct indices
            k = np.asarray(keys).transpose(0, 2, 1).reshape(-1, 3)
            i = idx.reshape(-1)
            uniq = {}
            for kk, ii in zip(map(tuple, k.tolist()), i.tolist()):
                assert uniq.setdefault(ii, kk) == kk, (l, ii)


def test_permuto_encode_grad_consistent_with_autodiff_reference():
    """Value+grad of the (direct+hash) encode match a naive formulation built
    from the same indices (the custom VJP must stay exact under rows_used)."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from pagnerf_tpu.ops.permuto_encoding import PermutoEncodingSpec
    from pagnerf_tpu.ops import permuto_encoding as pe
    spec = PermutoEncodingSpec(num_levels=6, feature_dim=2, capacity_log2=12,
                               coarsest_scale=1.0, finest_scale=0.02)
    key = jax.random.PRNGKey(0)
    tables = spec.init(key, init_std=0.5)
    pts = jax.random.uniform(jax.random.PRNGKey(1), (3, 257),
                             minval=-1.0, maxval=1.0)

    def loss_custom(t):
        return (spec.encode_T(t, pts) ** 2).sum()

    # naive reference: same lattice/index math, plain autodiff gather
    mm, dm, direct, _ = pe.direct_level_specs(spec.scales, spec.capacity, 2)

    def loss_naive(t):
        total = 0.0
        for l in range(spec.num_levels):
            keys, bary = pe.simplex_vertices_and_weights_T(
                pts / float(spec.scales[l]))
            idx = pe._index_keys_T(keys, spec.capacity_log2, int(mm[l]),
                                   int(dm[l]), bool(direct[l]))
            feats = t[l][idx]                      # [V, N, F] plain gather
            total += ((feats * bary[:, :, None]).sum(0) ** 2).sum()
        return total

    v1, g1 = jax.value_and_grad(loss_custom)(tables)
    v2, g2 = jax.value_and_grad(loss_naive)(tables)
    np.testing.assert_allclose(float(v1), float(v2), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-3, atol=1e-3)


def test_permuto_coord_gradients_match_autodiff():
    """The zero-residual lattice VJP (permuto_encoding._lattice_levels
    recomputes rank in the backward instead of saving residuals) must produce
    the SAME coordinate gradients as plain autodiff through the lattice math —
    pose optimisation (BAPipeline) differentiates the encode w.r.t. coords."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from pagnerf_tpu.ops.permuto_encoding import PermutoEncodingSpec
    from pagnerf_tpu.ops import permuto_encoding as pe
    spec = PermutoEncodingSpec(num_levels=6, feature_dim=2, capacity_log2=12,
                               coarsest_scale=1.0, finest_scale=0.02)
    tables = spec.init(jax.random.PRNGKey(0), init_std=0.5)
    pts = jax.random.uniform(jax.random.PRNGKey(1), (3, 193),
                             minval=-0.9, maxval=0.9)
    mm, dm, direct, _ = pe.direct_level_specs(spec.scales, spec.capacity, 2)
    w = jax.random.normal(jax.random.PRNGKey(2), (spec.output_dim, 193))

    def loss_custom(x):
        return jnp.sum(spec.encode_T(tables, x) * w)

    def loss_naive(x):          # same math, no custom VJP anywhere
        total = 0.0
        for l in range(spec.num_levels):
            keys, bary = pe.simplex_vertices_and_weights_T(
                x / float(spec.scales[l]))
            idx = pe._index_keys_T(keys, spec.capacity_log2, int(mm[l]),
                                   int(dm[l]), bool(direct[l]))
            feats = tables[l][idx]                 # [V, N, F]
            out = jnp.einsum("vn,vnf->fn", bary, feats)
            total += jnp.sum(out * w[2 * l:2 * l + 2])
        return total

    v1, g1 = jax.value_and_grad(loss_custom)(pts)
    v2, g2 = jax.value_and_grad(loss_naive)(pts)
    np.testing.assert_allclose(float(v1), float(v2), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-3, atol=1e-4)


def test_lattice_flat_matches_scan(monkeypatch):
    """The flat (vmap-over-levels) lattice path — used at post-prune packed
    sample counts where the [L, V, 3, N] intermediate fits HBM — must be
    bit-identical to the scan path in outputs AND coordinate gradients
    (the two are the same math, dispatched on N at trace time)."""
    import os
    import jax
    import jax.numpy as jnp
    import numpy as np
    from pagnerf_tpu.ops.permuto_encoding import PermutoEncodingSpec
    from pagnerf_tpu.ops import permuto_encoding as pe

    spec = PermutoEncodingSpec(num_levels=6, capacity_log2=10,
                               coarsest_scale=1.0, finest_scale=0.01)
    key = jax.random.PRNGKey(3)
    tables = spec.init(key)
    x = jax.random.uniform(jax.random.PRNGKey(4), (3, 257),
                           minval=-0.9, maxval=0.9)

    def run(budget_mb):
        monkeypatch.setenv("PAGNERF_LATTICE_FLAT_MB", budget_mb)

        def loss(xx, tt):
            return jnp.sum(pe.permuto_encode_T(tt, xx, spec.scales) ** 2)

        val, (dx, dt) = jax.value_and_grad(loss, argnums=(0, 1))(x, tables)
        return np.asarray(val), np.asarray(dx), np.asarray(dt)

    v_scan, dx_scan, dt_scan = run("0")        # 0 disables flat -> scan
    v_flat, dx_flat, dt_flat = run("100000")   # force flat
    # forward (features, hence values + table grads) is BIT-exact; the
    # coordinate gradient differs by ~1 fp32 ulp (measured rel 6.6e-8) from
    # matmul lowering context in the unrolled-vs-scan backward
    np.testing.assert_array_equal(v_scan, v_flat)
    np.testing.assert_array_equal(dt_scan, dt_flat)
    np.testing.assert_allclose(dx_scan, dx_flat, rtol=0, atol=float(np.abs(dx_scan).max()) * 5e-7)
