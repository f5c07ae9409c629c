"""Jittable linear sum assignment (rectangular Jonker-Volgenant).

The reference solves DETR-style bipartite matching with scipy's
``linear_sum_assignment`` on host (/root/reference/projects/UniBEV/
unibev_plugin/core/bbox/assigners/hungarian_assigner_3d.py:118-127, cost
matrix moved to CPU per sample per decoder layer).  On TPU that host
round-trip would serialize the train step, so we run the same shortest
augmenting path algorithm in-graph with ``lax`` control flow.

Key property exploited for speed: with num_rows (gt boxes, <=~150) much
smaller than num_cols (900 queries), each Dijkstra terminates as soon as the
minimum-reduced-cost column is unassigned — which is almost immediate while
most columns are free — so the sequential trip count stays near one visit per
row on real data.

Rows beyond ``num_valid`` are skipped entirely (their assignment output is
undefined and must be masked by the caller).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

INF = jnp.float32(1e30)


@functools.partial(jax.jit, static_argnames=())
def linear_sum_assignment(cost: jnp.ndarray, num_valid: jnp.ndarray) -> jnp.ndarray:
    """Solve min-cost assignment of rows to distinct columns.

    Args:
      cost: (R, C) float32 cost matrix, R <= C. Only the first ``num_valid``
        rows are assigned.
      num_valid: scalar int, number of valid rows (<= R).

    Returns:
      col4row: (R,) int32 — column assigned to each row; garbage (-1) for
        rows >= num_valid.
    """
    R, C = cost.shape
    assert R <= C, f"need R <= C, got {cost.shape}"
    cost = cost.astype(jnp.float32)

    u0 = jnp.zeros((R,), jnp.float32)
    v0 = jnp.zeros((C,), jnp.float32)
    col4row0 = jnp.full((R,), -1, jnp.int32)
    row4col0 = jnp.full((C,), -1, jnp.int32)

    def assign_row(cur_row, state):
        u, v, col4row, row4col = state

        # --- Dijkstra over columns from cur_row ----------------------------
        shortest0 = jnp.full((C,), INF, jnp.float32)
        path0 = jnp.full((C,), -1, jnp.int32)
        sr0 = jnp.zeros((R,), jnp.bool_)       # rows in the alternating tree
        remaining0 = jnp.ones((C,), jnp.bool_)  # columns not yet scanned

        def dijkstra_cond(st):
            _, _, _, _, _, j_star, done = st
            del j_star
            return jnp.logical_not(done)

        def dijkstra_body(st):
            i, min_val, shortest, path, sr, remaining, _ = st
            sr = sr.at[i].set(True)
            reduced = min_val + cost[i] - u[i] - v
            better = jnp.logical_and(remaining, reduced < shortest)
            shortest = jnp.where(better, reduced, shortest)
            path = jnp.where(better, i, path)
            masked = jnp.where(remaining, shortest, INF)
            j_star = jnp.argmin(masked).astype(jnp.int32)
            min_val = masked[j_star]
            remaining = remaining.at[j_star].set(False)
            nxt_row = row4col[j_star]
            done = nxt_row < 0
            i = jnp.where(done, i, nxt_row)
            return (i, min_val, shortest, path, sr, remaining, j_star, done)

        # Peel dijkstra into while_loop with (state..., j_star, done) carry.
        st = (cur_row.astype(jnp.int32), jnp.float32(0.0), shortest0, path0,
              sr0, remaining0, jnp.int32(0), jnp.bool_(False))

        def cond(st):
            return jnp.logical_not(st[-1])

        def body(st):
            i, min_val, shortest, path, sr, remaining, j_star, done = st
            out = dijkstra_body((i, min_val, shortest, path, sr, remaining, j_star))
            return out

        i, min_val, shortest, path, sr, remaining, j_star, done = jax.lax.while_loop(
            cond, body, st)

        # --- dual updates ---------------------------------------------------
        # u[cur_row] += min_val; u[i in SR\{cur}] += min_val - shortest[col4row[i]]
        sc = jnp.logical_not(remaining)  # scanned columns
        col_of_row = jnp.where(col4row >= 0, col4row, 0)
        delta_u = jnp.where(
            sr,
            min_val - jnp.where(col4row >= 0, shortest[col_of_row], 0.0),
            0.0)
        delta_u = delta_u.at[cur_row].set(min_val)
        u = u + delta_u
        v = v - jnp.where(sc, min_val - shortest, 0.0)

        # --- augment along the alternating path -----------------------------
        def aug_cond(st):
            return jnp.logical_not(st[-1])

        def aug_body(st):
            j, col4row, row4col, _ = st
            i = path[j]
            row4col = row4col.at[j].set(i)
            prev_j = col4row[i]
            col4row = col4row.at[i].set(j)
            stop = i == cur_row
            j = jnp.where(stop, j, prev_j)
            return (j, col4row, row4col, stop)

        _, col4row, row4col, _ = jax.lax.while_loop(
            aug_cond, aug_body, (j_star, col4row, row4col, jnp.bool_(False)))

        return u, v, col4row, row4col

    # while (not fori) over rows: padded-GT rows beyond num_valid are never
    # visited, so the sequential trip count follows the REAL object count
    # (~35 on nuScenes) instead of the static max_gt=140 padding.  Under
    # vmap the loop runs until every lane's num_valid is reached.
    def outer_cond(st):
        return st[0] < num_valid

    def outer_body(st):
        r, state = st
        return r + 1, assign_row(r, state)

    _, (_, _, col4row, _) = jax.lax.while_loop(
        outer_cond, outer_body,
        (jnp.int32(0), (u0, v0, col4row0, row4col0)))
    return col4row
