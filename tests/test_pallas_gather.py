"""Fused Pallas gather kernel tests (interpret mode on CPU): equivalence to
the plain XLA formulation for the forward, the dbary backward, and the
lane-concatenated dual-table (delta-grid) variant.

The kernel itself only runs on TPU behind the PAGNERF_PALLAS_GATHER probe
(ops/table_gather._use_pallas_cf) — these tests pin its semantics so the
moment the toolchain lowers ``tpu.dynamic_gather`` at production shapes the
hot path turns on with known-correct numerics.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from pagnerf_tpu.ops.pallas_gather import (LANES, multilevel_gather_dbary,
                                           multilevel_gather_dual_fwd,
                                           multilevel_gather_fwd)

L, C, F, V = 3, 512, 2, 4
ROWS = (C * F) // LANES          # 8


def _rand(seed=0):
    rng = np.random.default_rng(seed)
    tables = rng.normal(size=(L, C, F)).astype(np.float32)
    # N a multiple of 2*ROWS so the same inputs serve the dual variant too
    n = 4 * 2 * ROWS
    idx = rng.integers(0, C, size=(L, V, n)).astype(np.int32)
    bary = rng.normal(size=(L, V, n)).astype(np.float32)
    return jnp.asarray(tables), jnp.asarray(idx), jnp.asarray(bary)


def _ref_fwd(tables, idx, bary):
    # out[l, f, n] = sum_v bary[l, v, n] * tables[l, idx[l, v, n], f]
    feats = jnp.take_along_axis(tables[:, None], idx[..., None],
                                axis=2)                       # [L, V, N, F]
    return jnp.einsum("lvnf,lvn->lfn", feats, bary)


def test_fwd_matches_xla_reference():
    tables, idx, bary = _rand()
    packed = tables.reshape(L, ROWS, LANES)
    out = multilevel_gather_fwd(packed, idx, bary, F, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(_ref_fwd(tables, idx, bary)),
                               rtol=1e-6, atol=1e-6)


def test_dbary_matches_xla_reference():
    tables, idx, bary = _rand(1)
    g = bary[:, :F]                               # any [L, F, N] cotangent
    packed = tables.reshape(L, ROWS, LANES)
    out = multilevel_gather_dbary(packed, idx, g, F, interpret=True)
    feats = jnp.take_along_axis(tables[:, None], idx[..., None], axis=2)
    ref = jnp.einsum("lvnf,lfn->lvn", feats, g)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)


def test_dual_fwd_bit_exact_vs_two_single_gathers():
    tables_a, idx, bary = _rand(2)
    tables_b = _rand(3)[0]
    pa = tables_a.reshape(L, ROWS, LANES)
    pb = tables_b.reshape(L, ROWS, LANES)
    out_a, out_b = multilevel_gather_dual_fwd(pa, pb, idx, bary, F,
                                              interpret=True)
    ref_a = multilevel_gather_fwd(pa, idx, bary, F, interpret=True)
    ref_b = multilevel_gather_fwd(pb, idx, bary, F, interpret=True)
    # gather-then-slice must be BIT-identical to two single gathers
    assert np.array_equal(np.asarray(out_a), np.asarray(ref_a))
    assert np.array_equal(np.asarray(out_b), np.asarray(ref_b))


def test_fwd_rejects_unpadded_sample_count():
    tables, idx, bary = _rand(4)
    packed = tables.reshape(L, ROWS, LANES)
    with pytest.raises(AssertionError):
        multilevel_gather_fwd(packed, idx[:, :, :ROWS + 1],
                              bary[:, :, :ROWS + 1], F, interpret=True)
