"""Device-side linear assignment: parallel auction algorithm (Bertsekas).

The reference solves its (<= 200 x 200) label-to-slot assignment with scipy's
Hungarian on the host inside ``no_grad`` (/root/reference/loss/lin_assignment_things.py:44).
A host callback would serialise the TPU step (and the axon PJRT runtime does not
support host callbacks at all), so the TPU-native replacement is the Jacobi/parallel
auction algorithm: all unassigned rows bid simultaneously (one [K, M] pass of
elementwise ops + row top-2 per iteration — pure VPU work), objects go to the highest
bidder, prices rise by at least eps. With eps-scaling the result is optimal to within
``n * eps_final``; for the soft cost matrices produced by mean slot probabilities this
matches Hungarian assignments exactly in practice (see tests/test_assignment.py golden
comparison against scipy).

Everything is static-shaped and jit/vmap/shard-safe: absent rows simply never bid.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

_NEG = -1e30


@partial(jax.jit, static_argnames=("max_iters",))
def auction_assign(cost: jnp.ndarray, present: jnp.ndarray,
                   eps_scale: float = 1e-3, max_iters: int = 500) -> jnp.ndarray:
    """Minimum-cost assignment of rows to distinct columns.

    cost:    [K, M] cost matrix.
    present: [K] bool — rows that participate. If more than M rows are present, only
             the first M (lowest index) participate, matching the reference's label
             truncation (lin_assignment_things.py:29 ``labels[:M]``).

    Returns col index per row [K] (absent/unassigned rows -> 0).
    """
    k, m = cost.shape
    benefit = -cost.astype(jnp.float32)

    # cap participants at M (feasibility)
    rank = jnp.cumsum(present.astype(jnp.int32)) - 1
    active = present & (rank < m)

    # fill inactive rows with -/+inf so the 0.0 filler cannot pollute the
    # range (benefits in e.g. [0.4, 0.6] would otherwise read spread 0.6)
    spread = jnp.maximum(
        jnp.max(jnp.where(active[:, None], benefit, -jnp.inf))
        - jnp.min(jnp.where(active[:, None], benefit, jnp.inf)), 1e-6)
    spread = jnp.where(jnp.isfinite(spread), spread, 1e-6)   # no active rows
    eps = spread * eps_scale / (m + 1)

    cols = jnp.arange(m)

    def cond(state):
        it, assign, owner, prices = state
        return (it < max_iters) & jnp.any(active & (assign < 0))

    def body(state):
        it, assign, owner, prices = state
        bidder = active & (assign < 0)                          # [K]
        values = jnp.where(bidder[:, None], benefit - prices[None, :], _NEG)
        best_idx = jnp.argmax(values, axis=1)                   # [K]
        best_val = jnp.max(values, axis=1)
        masked = values.at[jnp.arange(k), best_idx].set(_NEG)
        second_val = jnp.max(masked, axis=1)
        second_val = jnp.where(second_val <= _NEG / 2, best_val - eps, second_val)
        bid = prices[best_idx] + (best_val - second_val) + eps  # [K]
        # per-object highest bid, and its bidder (prefer lowest row on ties)
        bid_mat = jnp.where((best_idx[:, None] == cols[None, :]) & bidder[:, None],
                            bid[:, None], _NEG)                 # [K, M]
        obj_bid = jnp.max(bid_mat, axis=0)                      # [M]
        winner = jnp.argmax(bid_mat, axis=0)                    # [M]
        has_bid = obj_bid > _NEG / 2

        # displace previous owners of re-auctioned objects
        displaced_rows = jnp.where(has_bid & (owner >= 0), owner, k)   # [M]
        disp_mask = jnp.zeros((k,), bool).at[displaced_rows].set(True, mode="drop")
        assign = jnp.where(disp_mask, -1, assign)
        # award objects to winners
        assign = assign.at[jnp.where(has_bid, winner, k)].set(
            jnp.where(has_bid, cols, -1), mode="drop")
        owner = jnp.where(has_bid, winner, owner)
        prices = jnp.where(has_bid, obj_bid, prices)
        return it + 1, assign, owner, prices

    init = (jnp.int32(0), jnp.full((k,), -1, jnp.int32),
            jnp.full((m,), -1, jnp.int32), jnp.zeros((m,), jnp.float32))
    _, assign, _, _ = jax.lax.while_loop(cond, body, init)

    # Feasibility completion: if max_iters expired with active rows still
    # unassigned (pathological price wars on near-degenerate costs), pair them
    # with UNOWNED columns by rank — a valid (if locally suboptimal) matching.
    # The old `maximum(assign, 0)` alone silently sent every leftover row to
    # column 0, training several GT labels onto the same slot.
    unassigned = active & (assign < 0)
    col_owned = jnp.zeros((m,), bool).at[
        jnp.where(assign >= 0, assign, m)].set(True, mode="drop")
    free = ~col_owned
    row_rank = jnp.cumsum(unassigned.astype(jnp.int32)) - 1        # [K]
    col_rank = jnp.cumsum(free.astype(jnp.int32)) - 1              # [M]
    rank_to_col = jnp.zeros((m,), jnp.int32).at[
        jnp.where(free, col_rank, m)].set(jnp.where(free, cols, 0), mode="drop")
    assign = jnp.where(unassigned,
                       rank_to_col[jnp.clip(row_rank, 0, m - 1)], assign)
    return jnp.maximum(assign, 0).astype(jnp.int32)
