"""Device-side linear assignment: parallel auction algorithm (Bertsekas).

The reference solves its (<= 200 x 200) label-to-slot assignment with scipy's
Hungarian on the host inside ``no_grad`` (/root/reference/loss/lin_assignment_things.py:44).
A host callback would serialise the TPU step (and the axon PJRT runtime does not
support host callbacks at all), so the TPU-native replacement is the Jacobi/parallel
auction algorithm: all unassigned rows bid simultaneously (one elementwise pass +
row top-2 per iteration — pure VPU work), objects go to the highest bidder, prices
rise by at least eps.

Optimality within n * eps_final is made REAL (not just asserted) by two
textbook devices, added after the round-3 adversarial sweep exposed the gaps:

  * eps-SCALING: phases from eps_0 = spread/2 down to eps_final, carrying
    prices across phases (warm starts) while resetting the matching. A single
    small eps has the same guarantee only if the loop runs to completion —
    on adversarial near-tie matrices (e.g. rank-1 costs) that takes
    ~spread/eps ~ 2e5 price-war iterations; warm-started phases converge
    orders of magnitude faster (tests/test_assignment.py adversarial sweep).
  * SQUARE PADDING: price-carrying across phases is only sound when every
    object is re-priced by competition each phase (n == m). With fewer
    bidders than objects, an object bid up in a coarse phase and abandoned
    later keeps a stale high price no one ever corrects, silently steering
    its old bidder to a worse object. So the problem is padded with virtual
    bidders (assignment-independent benefits, up to a sub-eps tie-breaking
    pattern that spreads their parallel bids) — the classic asymmetric->
    symmetric reduction: their contribution is the same under any matching,
    so the real rows' sub-assignment stays optimal for the original problem.

Everything is static-shaped and jit/vmap/shard-safe: absent rows simply never bid.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

_NEG = -1e30


@partial(jax.jit, static_argnames=("max_iters",))
def auction_assign(cost: jnp.ndarray, present: jnp.ndarray,
                   eps_scale: float = 1e-3, max_iters: int = 4000) -> jnp.ndarray:
    """Minimum-cost assignment of rows to distinct columns.

    cost:    [K, M] cost matrix.
    present: [K] bool — rows that participate. If more than M rows are present, only
             the first M (lowest index) participate, matching the reference's label
             truncation (lin_assignment_things.py:29 ``labels[:M]``).

    Returns col index per row [K] (absent/unassigned rows -> 0), optimal to
    within m * eps_final (eps_final = spread * eps_scale / (m + 1)) — see the
    module docstring for why the eps-scaling + square-padding combination is
    what delivers that bound on adversarial inputs.
    """
    k, m = cost.shape
    benefit = -cost.astype(jnp.float32)

    # cap participants at M (feasibility)
    rank = jnp.cumsum(present.astype(jnp.int32)) - 1
    active_real = present & (rank < m)
    n_active = jnp.sum(active_real.astype(jnp.int32))

    # fill inactive rows with -/+inf so the 0.0 filler cannot pollute the
    # range (benefits in e.g. [0.4, 0.6] would otherwise read spread 0.6)
    spread = jnp.maximum(
        jnp.max(jnp.where(active_real[:, None], benefit, -jnp.inf))
        - jnp.min(jnp.where(active_real[:, None], benefit, jnp.inf)), 1e-6)
    spread = jnp.where(jnp.isfinite(spread), spread, 1e-6)   # no active rows
    eps_final = spread * eps_scale / (m + 1)
    eps0 = jnp.maximum(spread / 2.0, eps_final)

    # ---- square padding: m virtual rows, (m - n_active) of them active ----
    # Virtual benefits are ~0 (assignment-independent up to a fixed sub-eps
    # tie-break pattern, total distortion <= eps_final) so they only absorb
    # leftover objects; distinct patterns let the parallel Jacobi bids spread
    # across objects instead of all fighting over one argmax.
    vi = jnp.arange(m)
    tie = (((vi[:, None] * 37 + vi[None, :] * 11 + 3) % 64).astype(jnp.float32)
           * (eps_final / (64.0 * m)))                       # [M, M]
    benefit = jnp.concatenate([benefit, tie], axis=0)        # [K+M, M]
    virt_active = (vi < (m - n_active)) & (n_active > 0)
    active = jnp.concatenate([active_real, virt_active])     # [K+M]
    k2 = k + m

    cols = jnp.arange(m)

    def cond(state):
        it, assign, owner, prices, eps = state
        return (it < max_iters) & (jnp.any(active & (assign < 0))
                                   | (eps > eps_final))

    def body(state):
        it, assign, owner, prices, eps = state
        # phase transition: a full assignment at eps > eps_final starts the
        # next phase — shrink eps, KEEP prices (the warm start), reset the
        # matching (eps-CS holds trivially for an empty assignment)
        done = ~jnp.any(active & (assign < 0))
        eps = jnp.where(done, jnp.maximum(eps * 0.25, eps_final), eps)
        assign = jnp.where(done, -1, assign)
        owner = jnp.where(done, -1, owner)

        bidder = active & (assign < 0)                          # [K2]
        values = jnp.where(bidder[:, None], benefit - prices[None, :], _NEG)
        best_idx = jnp.argmax(values, axis=1)                   # [K2]
        best_val = jnp.max(values, axis=1)
        masked = values.at[jnp.arange(k2), best_idx].set(_NEG)
        second_val = jnp.max(masked, axis=1)
        second_val = jnp.where(second_val <= _NEG / 2, best_val - eps, second_val)
        bid = prices[best_idx] + (best_val - second_val) + eps  # [K2]
        # per-object highest bid, and its bidder (prefer lowest row on ties)
        bid_mat = jnp.where((best_idx[:, None] == cols[None, :]) & bidder[:, None],
                            bid[:, None], _NEG)                 # [K2, M]
        obj_bid = jnp.max(bid_mat, axis=0)                      # [M]
        winner = jnp.argmax(bid_mat, axis=0)                    # [M]
        has_bid = obj_bid > _NEG / 2

        # displace previous owners of re-auctioned objects
        displaced_rows = jnp.where(has_bid & (owner >= 0), owner, k2)  # [M]
        disp_mask = jnp.zeros((k2,), bool).at[displaced_rows].set(True, mode="drop")
        assign = jnp.where(disp_mask, -1, assign)
        # award objects to winners
        assign = assign.at[jnp.where(has_bid, winner, k2)].set(
            jnp.where(has_bid, cols, -1), mode="drop")
        owner = jnp.where(has_bid, winner, owner)
        prices = jnp.where(has_bid, obj_bid, prices)
        return it + 1, assign, owner, prices, eps

    init = (jnp.int32(0), jnp.full((k2,), -1, jnp.int32),
            jnp.full((m,), -1, jnp.int32), jnp.zeros((m,), jnp.float32), eps0)
    _, assign, _, _, _ = jax.lax.while_loop(cond, body, init)

    # Feasibility completion: if max_iters expired with active rows still
    # unassigned (pathological price wars on near-degenerate costs), pair them
    # with UNOWNED columns by rank — a valid (if locally suboptimal) matching.
    # The old `maximum(assign, 0)` alone silently sent every leftover row to
    # column 0, training several GT labels onto the same slot.
    unassigned = active & (assign < 0)
    col_owned = jnp.zeros((m,), bool).at[
        jnp.where(assign >= 0, assign, m)].set(True, mode="drop")
    free = ~col_owned
    row_rank = jnp.cumsum(unassigned.astype(jnp.int32)) - 1        # [K2]
    col_rank = jnp.cumsum(free.astype(jnp.int32)) - 1              # [M]
    rank_to_col = jnp.zeros((m,), jnp.int32).at[
        jnp.where(free, col_rank, m)].set(jnp.where(free, cols, 0), mode="drop")
    assign = jnp.where(unassigned,
                       rank_to_col[jnp.clip(row_rank, 0, m - 1)], assign)
    return jnp.maximum(assign[:k], 0).astype(jnp.int32)
