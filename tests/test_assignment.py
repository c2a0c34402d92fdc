"""Golden tests: device Jonker-Volgenant assignment vs scipy Hungarian.

The device solver (ops/assignment.py lap_assign) is the SAME algorithm scipy's
linear_sum_assignment runs — shortest augmenting paths with dual potentials —
so these tests pin EXACT matching-cost equality (up to f32 rounding), not the
old auction's n*eps band.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pagnerf_tpu.losses.lin_assignment import hungarian_host
from pagnerf_tpu.ops.assignment import lap_assign


def matched_cost(cost, present, assign):
    rows = np.nonzero(present)[0][:cost.shape[1]]
    return float(sum(cost[r, assign[r]] for r in rows))


def _check(cost, present, tol=None):
    """Valid matching + exact cost equality vs scipy (f64 reference)."""
    k, m = cost.shape
    a_dev = np.asarray(lap_assign(jnp.asarray(cost), jnp.asarray(present)))
    rows = np.nonzero(present)[0][:m]
    assert len(set(a_dev[rows])) == len(rows), "duplicate columns"
    a_ref = hungarian_host(cost, present)
    c_dev = matched_cost(cost, present, a_dev)
    c_ref = matched_cost(cost, present, a_ref)
    if tol is None:
        # f32 accumulation slack: ~len(rows) ulps at the cost magnitude
        tol = 1e-4 * max(1.0, float(np.abs(cost[rows]).max())) * max(len(rows), 1)
    assert c_dev <= c_ref + tol, (c_dev, c_ref, tol)
    return c_dev, c_ref


@pytest.mark.parametrize("k,m,seed", [(5, 5, 0), (8, 12, 1), (12, 8, 2), (30, 30, 3)])
def test_matches_hungarian_cost(k, m, seed):
    rng = np.random.default_rng(seed)
    cost = rng.uniform(-1, 0, (k, m)).astype(np.float32)
    present = rng.random(k) > 0.2
    _check(cost, present)


def test_exact_on_separated_costs():
    cost = np.array([[0.0, 5, 5, 5], [5, 5, 0, 5], [5, 0, 5, 5]], np.float32)
    present = np.array([True, True, True])
    a = np.asarray(lap_assign(jnp.asarray(cost), jnp.asarray(present)))
    np.testing.assert_array_equal(a, [0, 2, 1])


def test_absent_rows():
    cost = np.zeros((4, 3), np.float32)
    cost[1] = [-1, 0, 0]
    present = np.array([False, True, False, False])
    a = np.asarray(lap_assign(jnp.asarray(cost), jnp.asarray(present)))
    assert a[1] == 0
    assert a[0] == 0 and a[2] == 0 and a[3] == 0


def test_more_rows_than_cols():
    rng = np.random.default_rng(4)
    cost = rng.uniform(-1, 0, (10, 4)).astype(np.float32)
    present = np.ones(10, bool)
    a = np.asarray(lap_assign(jnp.asarray(cost), jnp.asarray(present)))
    # first 4 present rows get distinct columns (reference truncates labels[:M])
    assert len(set(a[:4])) == 4


def test_vmap_batch_solve():
    """The training step vmaps one solve per image — results must match the
    per-image solves exactly."""
    rng = np.random.default_rng(5)
    costs = rng.uniform(-1, 0, (4, 12, 30)).astype(np.float32)
    present = jnp.ones((12,), bool)
    batched = np.asarray(jax.vmap(lambda c: lap_assign(c, present))(
        jnp.asarray(costs)))
    for b in range(4):
        single = np.asarray(lap_assign(jnp.asarray(costs[b]), present))
        np.testing.assert_array_equal(batched[b], single)


# ---------------------------------------------------------------------------
# Adversarial property sweep at the production size (VERDICT round-3 weak #6):
# 200 x 200 with the +10000 repeated-ID rejection penalties of
# losses/lin_assignment.py:85 in the mix, on degenerate / near-tie matrices.
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("seed", range(4))
def test_production_size_with_rejection_penalties(seed):
    """200x200 soft costs + the outlier-rejection structure: each row carries
    a random band of disallowed columns at +10000 (lin_assignment.py:85)."""
    rng = np.random.default_rng(100 + seed)
    k = m = 200
    cost = rng.uniform(-1.0, 0.0, (k, m)).astype(np.float32)
    # ~30% of cells penalised, but keep >= 1 allowed column per row so a
    # penalty-free matching may or may not exist — scipy decides the optimum
    penal = rng.random((k, m)) < 0.3
    penal[np.arange(k), rng.integers(0, m, k)] = False
    cost = np.where(penal, cost + 10000.0, cost).astype(np.float32)
    present = rng.random(k) > 0.1
    c_dev, c_ref = _check(cost, present, tol=1.0)  # f32 slack at 1e4 magnitude
    # never an avoidable rejection penalty: same number of 10000-cells used
    assert round((c_dev - c_ref) / 10000.0) == 0


@pytest.mark.parametrize("quant", [1.0, 0.1, 0.01])
def test_near_tie_matrices(quant):
    """Quantised costs create massive exact ties (the price-war regime that
    stalled the old auction): still a valid matching of exactly optimal cost."""
    rng = np.random.default_rng(7)
    k = m = 200
    cost = (np.round(rng.uniform(-1.0, 0.0, (k, m)) / quant) * quant
            ).astype(np.float32)
    present = np.ones(k, bool)
    _check(cost, present)


def test_degenerate_plateaus():
    """All-equal and rank-1 cost matrices: every matching is optimal; the
    solver must still produce a VALID one (no duplicate columns, no stall)."""
    k = m = 200
    for cost in (np.zeros((k, m), np.float32),
                 np.full((k, m), -0.5, np.float32),
                 (-np.outer(np.linspace(0, 1, k),
                            np.linspace(0, 1, m))).astype(np.float32)):
        present = np.ones(k, bool)
        _check(cost, present)


def test_two_tier_near_ties_with_penalties():
    """Adversarial two-tier structure: sub-float-ulp within-tier ties stacked
    against the rejection penalties — exactness must hold."""
    rng = np.random.default_rng(11)
    k = m = 200
    base = rng.choice([-1.0, -0.999999], size=(k, m))
    penal = np.zeros((k, m), bool)
    penal[:, : m // 2] = rng.random((k, m // 2)) < 0.5  # half the columns risky
    cost = np.where(penal, base + 10000.0, base).astype(np.float32)
    present = np.ones(k, bool)
    c_dev, c_ref = _check(cost, present, tol=1.0)
    assert round((c_dev - c_ref) / 10000.0) == 0


def test_nonfinite_costs_clipped_by_wrapper():
    """hungarian_assign must survive nan/inf cells (nan_to_num alone maps inf
    to f32-max, which would exceed the solver's settled sentinel)."""
    from pagnerf_tpu.losses.lin_assignment import hungarian_assign

    rng = np.random.default_rng(21)
    cost = rng.uniform(-1, 0, (8, 20)).astype(np.float32)
    cost[0, :10] = np.inf
    cost[3, 5] = np.nan
    present = np.ones(8, bool)
    a = np.asarray(hungarian_assign(jnp.asarray(cost), jnp.asarray(present)))
    assert len(set(a.tolist())) == 8          # valid distinct matching
    finite = np.nan_to_num(np.clip(cost, -1e12, 1e12))
    a_ref = hungarian_host(finite, present)
    c_dev = matched_cost(finite, present, a)
    c_ref = matched_cost(finite, present, a_ref)
    assert c_dev <= c_ref + 1e-3


def test_production_shape_20_labels_200_slots():
    """The deployed shape: ~20 GT labels present out of 200 label rows against
    200 slots, embedding-distance costs + penalty bands."""
    rng = np.random.default_rng(13)
    k = m = 200
    emb = rng.normal(size=(k, 8)); slots = rng.normal(size=(m, 8))
    cost = ((emb[:, None] - slots[None]) ** 2).sum(-1).astype(np.float32)
    present = np.zeros(k, bool)
    present[rng.choice(k, 20, replace=False)] = True
    penal = rng.random((k, m)) < 0.85
    penal[np.arange(k), cost.argmin(1)] = False
    cost = np.where(penal, cost + 10000.0, cost).astype(np.float32)
    c_dev, c_ref = _check(cost, present, tol=1.0)
    assert round((c_dev - c_ref) / 10000.0) == 0
