"""Device-side linear assignment: Jonker-Volgenant shortest augmenting paths.

The reference solves its (<= 200 x 200) label-to-slot assignment with scipy's
Hungarian on the host inside ``no_grad`` (/root/reference/loss/lin_assignment_things.py:44).
A host callback would serialise the TPU step (and the axon PJRT runtime does not
support host callbacks at all), so the solver runs on device. It is the SAME
algorithm scipy's ``linear_sum_assignment`` uses — successive shortest
augmenting paths with dual potentials (Jonker-Volgenant) — vectorised over the
column axis, so the result is EXACT (not eps-approximate): identical matching
cost to the reference's Hungarian up to float rounding.

Why this algorithm for the TPU: the work per sequential step is a handful of
[M]-wide vector ops (argmin + relax), and the SEQUENTIAL depth is provably
small for the production shapes. Augmenting row t grows its Dijkstra tree only
through already-MATCHED columns, so it settles at most t+1 columns; a solve
with P participating rows costs <= P(P+1)/2 settles. The training cost
matrices have P ~ 10-30 labels present against M = 200 slots -> a few hundred
tiny iterations.

History: rounds 1-3 used a Bertsekas parallel auction with eps-scaling and
square padding (virtual zero-benefit bidders). Optimality held on every golden
and adversarial test, but the padding rows — identical by construction — could
not be differentiated by the Jacobi bid step once carried prices varied above
eps, so they serialised at ~1 assignment/iteration and EVERY solve burned the
full 4000-iteration cap: a fixed 267 ms per train step on the TPU (the results
stayed optimal only because the real rows settle early). The shortest-path
formulation removes the padding entirely; tests/test_assignment.py pins
exactness against scipy on the same adversarial suite ~20x faster.

Everything is static-shaped and jit/vmap/shard-safe: absent rows are skipped
by masking (their augmentation loops run zero iterations).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_BIG = jnp.float32(1e30)


@jax.jit
def lap_assign(cost: jnp.ndarray, present: jnp.ndarray) -> jnp.ndarray:
    """Minimum-cost assignment of rows to distinct columns (exact).

    cost:    [K, M] cost matrix (finite; callers nan_to_num).
    present: [K] bool — rows that participate. If more than M rows are present,
             only the first M (lowest index) participate, matching the
             reference's label truncation (lin_assignment_things.py:29
             ``labels[:M]``).

    Returns col index per row [K] (absent rows -> 0). Participating rows
    receive a valid matching (distinct columns) of exactly minimal total cost.
    """
    k, m = cost.shape
    cost = cost.astype(jnp.float32)

    rank = jnp.cumsum(present.astype(jnp.int32)) - 1
    active = present & (rank < m)

    def augment(carry, r):
        u, v, row4col, col4row = carry
        run = active[r]

        # ---- Dijkstra from row r over columns (scipy _lsap augmenting_path):
        # sp[j] = cheapest reduced path cost reaching column j; the tree only
        # extends through matched columns, so it settles <= (#matched + 1)
        # columns before hitting a free one.
        sp0 = jnp.where(run, cost[r] - u[r] - v, _BIG)      # [M]
        path0 = jnp.full((m,), r, jnp.int32)                # predecessor row
        sc0 = jnp.zeros((m,), bool)                         # settled columns

        def dcond(s):
            _sp, _path, _sc, _lowest, sink, steps = s
            return (sink < 0) & run & (steps <= m)

        def dbody(s):
            sp, path, sc, _lowest, _sink, steps = s
            cand = jnp.where(sc, _BIG, sp)
            j = jnp.argmin(cand)                            # next settled col
            lo = cand[j]
            sc = sc.at[j].set(True)
            owner = row4col[j]
            free = owner < 0
            io = jnp.maximum(owner, 0)
            # relax unsettled columns through the owner row (no-op if free:
            # the loop exits via sink before these updates are consumed)
            nd = lo + cost[io] - u[io] - v
            better = ~sc & (nd < sp) & ~free
            sp = jnp.where(better, nd, sp)
            path = jnp.where(better, io, path)
            return sp, path, sc, lo, jnp.where(free, j, -1), steps + 1

        sp, path, sc, lowest, sink, _ = jax.lax.while_loop(
            dcond, dbody, (sp0, path0, sc0, jnp.float32(0), jnp.int32(-1),
                           jnp.int32(0)))

        # ---- dual update (keeps reduced costs >= 0, 0 on matched edges):
        # u[r] += lowest; u[i] += lowest - sp[col4row[i]] for tree rows i;
        # v[j] -= lowest - sp[j] for settled columns j.
        own = jnp.where(sc, row4col, -1)                    # settled cols' rows
        tree_rows = jnp.zeros((k,), bool).at[
            jnp.where(own >= 0, own, k)].set(True, mode="drop")
        du = jnp.where(tree_rows & run,
                       lowest - sp[jnp.clip(col4row, 0, m - 1)], 0.0)
        u = u + du
        u = u.at[r].add(jnp.where(run, lowest, 0.0))
        v = v - jnp.where(sc & run, lowest - sp, 0.0)

        # ---- augment: flip the alternating path back from the free column.
        def acond(s):
            j, _rc, _cr, steps = s
            return (j >= 0) & (steps <= m)

        def abody(s):
            j, rc, cr, steps = s
            i = path[j]
            jnext = jnp.where(i == r, -1, cr[jnp.clip(i, 0, k - 1)])
            rc = rc.at[j].set(i)
            cr = cr.at[i].set(j)
            return jnext, rc, cr, steps + 1

        _, row4col, col4row, _ = jax.lax.while_loop(
            acond, abody, (jnp.where(run, sink, -1), row4col, col4row,
                           jnp.int32(0)))
        return (u, v, row4col, col4row), jnp.int32(0)

    init = (jnp.zeros((k,), jnp.float32), jnp.zeros((m,), jnp.float32),
            jnp.full((m,), -1, jnp.int32), jnp.full((k,), -1, jnp.int32))
    (_, _, _, col4row), _ = jax.lax.scan(augment, init, jnp.arange(k))
    return jnp.where(active, jnp.maximum(col4row, 0), 0).astype(jnp.int32)
