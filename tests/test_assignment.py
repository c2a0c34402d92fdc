"""Golden tests: device auction assignment vs scipy Hungarian."""
import jax.numpy as jnp
import numpy as np
import pytest

from pagnerf_tpu.losses.lin_assignment import hungarian_host
from pagnerf_tpu.ops.assignment import auction_assign


def optimal_cost(cost, present, assign):
    rows = np.nonzero(present)[0][:cost.shape[1]]
    return float(sum(cost[r, assign[r]] for r in rows))


@pytest.mark.parametrize("k,m,seed", [(5, 5, 0), (8, 12, 1), (12, 8, 2), (30, 30, 3)])
def test_auction_matches_hungarian_cost(k, m, seed):
    rng = np.random.default_rng(seed)
    cost = rng.uniform(-1, 0, (k, m)).astype(np.float32)
    present = rng.random(k) > 0.2
    a_dev = np.asarray(auction_assign(jnp.asarray(cost), jnp.asarray(present)))
    a_ref = hungarian_host(cost, present)
    rows = np.nonzero(present)[0][:m]
    # assignments must be a valid matching on present rows
    assert len(set(a_dev[rows])) == len(rows), "auction produced duplicate columns"
    c_dev = optimal_cost(cost, present, a_dev)
    c_ref = optimal_cost(cost, present, a_ref)
    assert c_dev <= c_ref + 2e-2 * len(rows), (c_dev, c_ref)


def test_auction_exact_on_separated_costs():
    """With well-separated costs the eps-optimal auction is exactly optimal."""
    cost = np.array([[0.0, 5, 5, 5], [5, 5, 0, 5], [5, 0, 5, 5]], np.float32)
    present = np.array([True, True, True])
    a = np.asarray(auction_assign(jnp.asarray(cost), jnp.asarray(present)))
    np.testing.assert_array_equal(a, [0, 2, 1])


def test_auction_absent_rows():
    cost = np.zeros((4, 3), np.float32)
    cost[1] = [-1, 0, 0]
    present = np.array([False, True, False, False])
    a = np.asarray(auction_assign(jnp.asarray(cost), jnp.asarray(present)))
    assert a[1] == 0
    assert a[0] == 0 and a[2] == 0 and a[3] == 0


def test_auction_more_rows_than_cols():
    rng = np.random.default_rng(4)
    cost = rng.uniform(-1, 0, (10, 4)).astype(np.float32)
    present = np.ones(10, bool)
    a = np.asarray(auction_assign(jnp.asarray(cost), jnp.asarray(present)))
    # first 4 present rows get distinct columns (reference truncates labels[:M])
    assert len(set(a[:4])) == 4
