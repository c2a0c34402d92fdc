"""MXU scatter-as-matmul kernel tests (interpret mode on CPU): equivalence to
bf16-multiply precision (the kernel casts operands to bf16 for the MXU, f32 accum)
with the duplicate-index scatter-add it replaces (table-gather backward,
ops/table_gather.py)."""
import jax
import jax.numpy as jnp
import numpy as np

from pagnerf_tpu.ops.pallas_scatter import scatter_rows_matmul, table_grad_matmul


def test_scatter_matches_at_add():
    rng = np.random.default_rng(0)
    m, rows = 3000, 512
    row = rng.integers(0, rows, m).astype(np.int32)
    vals = rng.standard_normal((m, 128)).astype(np.float32)
    out = scatter_rows_matmul(jnp.asarray(row), jnp.asarray(vals), rows,
                              row_block=128, event_chunk=512, interpret=True)
    ref = jnp.zeros((rows, 128), jnp.float32).at[row].add(vals)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)


def test_scatter_drops_padding_rows():
    row = jnp.asarray([-1, 3, 3, -1], jnp.int32)
    vals = jnp.ones((4, 128), jnp.float32)
    out = scatter_rows_matmul(row, vals, 128, row_block=128, event_chunk=4,
                              interpret=True)
    assert float(out[3, 0]) == 2.0
    assert float(out.sum()) == 2.0 * 128


def test_dual_table_grad_matches_two_scatters():
    """The paired-table kernel (one one-hot build, [R, 256] accumulator) must
    reproduce two independent table-gradient scatters."""
    from pagnerf_tpu.ops.pallas_scatter import table_grad_matmul_dual
    rng = np.random.default_rng(3)
    capacity, f, v, n = 1024, 2, 4, 700
    idx = jnp.asarray(rng.integers(0, capacity, (v, n)), jnp.int32)
    bary = jnp.asarray(rng.random((v, n)), jnp.float32)
    g_a = jnp.asarray(rng.standard_normal((f, n)), jnp.float32)
    g_b = jnp.asarray(rng.standard_normal((f, n)), jnp.float32)

    da, db = table_grad_matmul_dual(idx, bary, g_a, g_b, capacity, f,
                                    event_chunk=512, interpret=True)

    def ref(g):
        flat_idx = (idx[:, None, :] * f
                    + jnp.arange(f, dtype=idx.dtype)[None, :, None]).reshape(-1)
        vals = (bary[:, None, :] * g[None, :, :]).reshape(-1)
        return jnp.zeros((capacity * f,), jnp.float32).at[flat_idx].add(
            vals).reshape(capacity, f)

    np.testing.assert_allclose(np.asarray(da), np.asarray(ref(g_a)),
                               rtol=2e-2, atol=2e-2)
    np.testing.assert_allclose(np.asarray(db), np.asarray(ref(g_b)),
                               rtol=2e-2, atol=2e-2)


def test_table_grad_matches_autodiff_scatter():
    rng = np.random.default_rng(1)
    capacity, f, v, n = 1024, 2, 4, 500
    idx = jnp.asarray(rng.integers(0, capacity, (v, n)), jnp.int32)
    bary = jnp.asarray(rng.random((v, n)), jnp.float32)
    g = jnp.asarray(rng.standard_normal((f, n)), jnp.float32)

    dtable = table_grad_matmul(idx, bary, g, capacity, f, interpret=True)

    # reference: the exact scatter from table_gather's backward
    flat_idx = (idx[:, None, :] * f
                + jnp.arange(f, dtype=idx.dtype)[None, :, None]).reshape(-1)
    vals = (bary[:, None, :] * g[None, :, :]).reshape(-1)
    ref = jnp.zeros((capacity * f,), jnp.float32).at[flat_idx].add(
        vals).reshape(capacity, f)
    np.testing.assert_allclose(np.asarray(dtable), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)


def test_rows_used_bounds_the_scatter():
    """rows_used shrinks the kernel's one-hot/dot to the first rows while
    producing the identical [C, F] gradient when every event row is in bounds
    (direct-indexed coarse levels, ops/permuto_encoding.direct_level_specs)."""
    from pagnerf_tpu.ops.pallas_scatter import (table_grad_matmul,
                                                table_grad_matmul_dual)
    rng = np.random.default_rng(7)
    capacity, f, v, n = 2048, 2, 4, 600
    entries_used = 300                       # rows_used = ceil(300*2/128) = 5
    idx = jnp.asarray(rng.integers(0, entries_used, (v, n)), jnp.int32)
    bary = jnp.asarray(rng.random((v, n)), jnp.float32)
    g = jnp.asarray(rng.standard_normal((f, n)), jnp.float32)
    g2 = jnp.asarray(rng.standard_normal((f, n)), jnp.float32)
    rows_used = int(np.ceil(entries_used * f / 128))

    full = table_grad_matmul(idx, bary, g, capacity, f, event_chunk=512,
                             interpret=True)
    bounded = table_grad_matmul(idx, bary, g, capacity, f, event_chunk=512,
                                interpret=True, rows_used=rows_used)
    np.testing.assert_allclose(np.asarray(bounded), np.asarray(full),
                               rtol=1e-6, atol=1e-6)
    assert float(jnp.abs(bounded[entries_used:]).sum()) == 0.0

    fa, fb = table_grad_matmul_dual(idx, bary, g, g2, capacity, f,
                                    event_chunk=512, interpret=True)
    ba, bb = table_grad_matmul_dual(idx, bary, g, g2, capacity, f,
                                    event_chunk=512, interpret=True,
                                    rows_used=rows_used)
    np.testing.assert_allclose(np.asarray(ba), np.asarray(fa), rtol=1e-6,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(bb), np.asarray(fb), rtol=1e-6,
                               atol=1e-6)


def test_lane_major_dual_kernel_matches():
    """The lane-major ([1, M] / [2F, M] operands) row-bounded dual kernel must
    reproduce the original kernel's gradients exactly (same bf16-multiply
    regime)."""
    from pagnerf_tpu.ops.pallas_scatter import (table_grad_matmul_dual,
                                                table_grad_matmul_dual_T)
    rng = np.random.default_rng(11)
    capacity, f, v, n = 2048, 2, 4, 900
    entries_used = 500
    idx = jnp.asarray(rng.integers(0, entries_used, (v, n)), jnp.int32)
    bary = jnp.asarray(rng.random((v, n)), jnp.float32)
    g_a = jnp.asarray(rng.standard_normal((f, n)), jnp.float32)
    g_b = jnp.asarray(rng.standard_normal((f, n)), jnp.float32)
    rows_used = int(np.ceil(entries_used * f / 128))

    ra, rb = table_grad_matmul_dual(idx, bary, g_a, g_b, capacity, f,
                                    event_chunk=512, interpret=True)
    ta, tb = table_grad_matmul_dual_T(idx, bary, g_a, g_b, capacity, f,
                                      rows_used=rows_used, event_chunk=512,
                                      interpret=True)
    np.testing.assert_allclose(np.asarray(ta), np.asarray(ra), rtol=1e-6,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(tb), np.asarray(rb), rtol=1e-6,
                               atol=1e-6)
    assert float(jnp.abs(ta[entries_used:]).sum()) == 0.0


def test_lane_major_single_kernel_matches():
    from pagnerf_tpu.ops.pallas_scatter import (table_grad_matmul,
                                                table_grad_matmul_T)
    rng = np.random.default_rng(13)
    capacity, f, v, n = 2048, 2, 4, 700
    entries_used = 400
    idx = jnp.asarray(rng.integers(0, entries_used, (v, n)), jnp.int32)
    bary = jnp.asarray(rng.random((v, n)), jnp.float32)
    g = jnp.asarray(rng.standard_normal((f, n)), jnp.float32)
    rows_used = int(np.ceil(entries_used * f / 128))
    ref = table_grad_matmul(idx, bary, g, capacity, f, event_chunk=512,
                            interpret=True)
    got = table_grad_matmul_T(idx, bary, g, capacity, f, rows_used=rows_used,
                              event_chunk=512, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-6,
                               atol=1e-6)


def test_small_table_below_sublane_alignment():
    """capacity*F/128 < 8 packed rows (e.g. capacity 256 x F=2 -> 4 rows): the
    kernel pads its output to the 8-row sublane alignment and must slice back
    before the [C, F] reshape (round-2 regression: reshape crashed)."""
    from pagnerf_tpu.ops.pallas_scatter import (table_grad_matmul,
                                                table_grad_matmul_T,
                                                table_grad_matmul_dual,
                                                table_grad_matmul_dual_T)
    rng = np.random.default_rng(7)
    capacity, f, v, n = 256, 2, 4, 300
    idx = jnp.asarray(rng.integers(0, capacity, (v, n)), jnp.int32)
    bary = jnp.asarray(rng.random((v, n)), jnp.float32)
    g_a = jnp.asarray(rng.standard_normal((f, n)), jnp.float32)
    g_b = jnp.asarray(rng.standard_normal((f, n)), jnp.float32)

    def ref(g):
        flat_idx = (idx[:, None, :] * f
                    + jnp.arange(f, dtype=idx.dtype)[None, :, None]).reshape(-1)
        vals = (bary[:, None, :] * g[None, :, :]).reshape(-1)
        return jnp.zeros((capacity * f,), jnp.float32).at[flat_idx].add(
            vals).reshape(capacity, f)

    d = table_grad_matmul(idx, bary, g_a, capacity, f, event_chunk=512,
                          interpret=True)
    assert d.shape == (capacity, f)
    np.testing.assert_allclose(np.asarray(d), np.asarray(ref(g_a)),
                               rtol=2e-2, atol=2e-2)
    d_t = table_grad_matmul_T(idx, bary, g_a, capacity, f, rows_used=0,
                              event_chunk=512, interpret=True)
    np.testing.assert_allclose(np.asarray(d_t), np.asarray(ref(g_a)),
                               rtol=2e-2, atol=2e-2)
    da, db = table_grad_matmul_dual(idx, bary, g_a, g_b, capacity, f,
                                    event_chunk=512, interpret=True)
    np.testing.assert_allclose(np.asarray(da), np.asarray(ref(g_a)),
                               rtol=2e-2, atol=2e-2)
    da_t, db_t = table_grad_matmul_dual_T(idx, bary, g_a, g_b, capacity, f,
                                          rows_used=0, event_chunk=512,
                                          interpret=True)
    np.testing.assert_allclose(np.asarray(db_t), np.asarray(ref(g_b)),
                               rtol=2e-2, atol=2e-2)


def test_zero_event_scatter_returns_zeros():
    """M == 0 events must return exact zeros: a zero-size grid would skip the
    kernel's mc==0 zero-init and hand back an uninitialised buffer."""
    from pagnerf_tpu.ops.pallas_scatter import (scatter_rows_matmul,
                                                table_grad_matmul_T)
    out = scatter_rows_matmul(jnp.zeros((0,), jnp.int32),
                              jnp.zeros((0, 128)), num_rows=64, interpret=True)
    np.testing.assert_array_equal(np.asarray(out), 0.0)
    d = table_grad_matmul_T(jnp.zeros((4, 0), jnp.int32), jnp.zeros((4, 0)),
                            jnp.zeros((2, 0)), capacity=256, feature_dim=2,
                            rows_used=0, interpret=True)
    assert d.shape == (256, 2)
    np.testing.assert_array_equal(np.asarray(d), 0.0)


def test_scatter_rows_matmul_non_divisible_num_rows():
    """num_rows not a multiple of row_block must pick a smaller divisor, not
    assert (e.g. 640 % 512 != 0 but the scatter is perfectly valid)."""
    from pagnerf_tpu.ops.pallas_scatter import scatter_rows_matmul
    row = jnp.array([0, 639, 639], jnp.int32)
    vals = jnp.ones((3, 128))
    out = scatter_rows_matmul(row, vals, num_rows=640, interpret=True)
    assert float(out[639, 0]) == 2.0 and float(out[0, 0]) == 1.0
