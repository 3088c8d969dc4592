"""On-device Hungarian (linear sum assignment) for query-GT matching.

The reference calls mmdet's ``HungarianAssigner`` which drops to scipy's
``linear_sum_assignment`` on the host — one GPU->CPU sync per image per
decoder layer (reference ``mask2former_head.py:207-210``, SURVEY.md §2.2 N8).
Here the classic O(n³) shortest-augmenting-path algorithm (Jonker-Volgenant
potentials form) runs entirely on-device under ``lax`` control flow, vmapped
over (layers x batch), so matching fuses into the loss graph with no host
round-trip.

Algorithm: for each row, grow an alternating tree over columns using reduced
costs ``C[i,j] - u[i] - v[j]``; augment along the shortest path; update dual
potentials. Exact (same optimum as scipy) for any finite square cost matrix.

Padded GT columns must be pre-filled with a large constant (see
:func:`pad_cost`) — they act as interchangeable dummy columns and do not
perturb the real assignment.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_INF = jnp.float32(1e30)


def hungarian(cost: jax.Array) -> jax.Array:
    """Solve square linear sum assignment.

    Args:
      cost: (n, n) float cost matrix (finite entries).
    Returns:
      col_of_row: (n,) int32 — column assigned to each row.
    """
    n = cost.shape[0]
    # 1-indexed arrays with a virtual column 0 (sentinel);
    # p[j] = row currently assigned to column j (0 = free).
    c = jnp.pad(cost.astype(jnp.float32), ((1, 0), (1, 0)))
    u0 = jnp.zeros((n + 1,), jnp.float32)
    v0 = jnp.zeros((n + 1,), jnp.float32)
    p0 = jnp.zeros((n + 1,), jnp.int32)

    def assign_row(i, state):
        u, v, p = state
        p = p.at[0].set(i + 1)
        minv = jnp.full((n + 1,), _INF)
        used = jnp.zeros((n + 1,), bool)
        way = jnp.zeros((n + 1,), jnp.int32)

        def cond(s):
            _, _, _, _, _, j0, p_ = s
            return p_[j0] != 0

        def body(s):
            u, v, minv, used, way, j0, p_ = s
            used = used.at[j0].set(True)
            i0 = p_[j0]
            cur = c[i0] - u[i0] - v
            better = (cur < minv) & (~used)
            minv = jnp.where(better, cur, minv)
            way = jnp.where(better, j0, way)
            masked = jnp.where(used, _INF, minv)
            j1 = jnp.argmin(masked).astype(jnp.int32)
            delta = masked[j1]
            u = u.at[p_].add(jnp.where(used, delta, 0.0), mode="drop")
            v = jnp.where(used, v - delta, v)
            minv = jnp.where(used, minv, minv - delta)
            return u, v, minv, used, way, j1, p_

        u, v, minv, used, way, j0, p = jax.lax.while_loop(
            cond, body, (u, v, minv, used, way, jnp.int32(0), p))

        # augment: walk the alternating path back along `way`
        def aug_cond(s):
            j0, _ = s
            return j0 != 0

        def aug_body(s):
            j0, p_ = s
            j1 = way[j0]
            p_ = p_.at[j0].set(p_[j1])
            return j1, p_

        _, p = jax.lax.while_loop(aug_cond, aug_body, (j0, p))
        return u, v, p

    _, _, p = jax.lax.fori_loop(0, n, assign_row, (u0, v0, p0))
    # p[j] = row of column j (both 1-indexed); invert to col_of_row
    cols = jnp.arange(1, n + 1, dtype=jnp.int32)
    col_of_row = jnp.zeros((n,), jnp.int32).at[p[1:] - 1].set(
        cols - 1, mode="drop")
    return col_of_row


def hungarian_rows(cost: jax.Array, n_rows: jax.Array) -> jax.Array:
    """Assign the first ``n_rows`` rows of a rectangular (R, C) cost, R <= C.

    Same shortest-augmenting-path core as :func:`hungarian`, but the outer
    loop is a ``while_loop`` over a DYNAMIC row count: matching G valid GT
    instances against Q queries only pays G sequential augmentations instead
    of the square form's Q (the train-step's matcher ran 45 augmentations
    per problem for typically <= 10 real instances). Under ``vmap`` the
    lockstep trip count is ``max(n_rows)`` across the batch.

    Returns:
      row_of_col: (C,) int32 — assigned row per column, -1 for free columns.
    """
    r, ncol = cost.shape
    c = jnp.pad(cost.astype(jnp.float32), ((1, 0), (1, 0)))
    u0 = jnp.zeros((r + 1,), jnp.float32)
    v0 = jnp.zeros((ncol + 1,), jnp.float32)
    p0 = jnp.zeros((ncol + 1,), jnp.int32)

    def assign_row(i, u, v, p):
        p = p.at[0].set(i + 1)
        minv = jnp.full((ncol + 1,), _INF)
        used = jnp.zeros((ncol + 1,), bool)
        way = jnp.zeros((ncol + 1,), jnp.int32)

        def cond(s):
            _, _, _, _, _, j0, p_ = s
            return p_[j0] != 0

        def body(s):
            u, v, minv, used, way, j0, p_ = s
            used = used.at[j0].set(True)
            i0 = p_[j0]
            cur = c[i0] - u[i0] - v
            better = (cur < minv) & (~used)
            minv = jnp.where(better, cur, minv)
            way = jnp.where(better, j0, way)
            masked = jnp.where(used, _INF, minv)
            j1 = jnp.argmin(masked).astype(jnp.int32)
            delta = masked[j1]
            u = u.at[p_].add(jnp.where(used, delta, 0.0), mode="drop")
            v = jnp.where(used, v - delta, v)
            minv = jnp.where(used, minv, minv - delta)
            return u, v, minv, used, way, j1, p_

        u, v, minv, used, way, j0, p = jax.lax.while_loop(
            cond, body, (u, v, minv, used, way, jnp.int32(0), p))

        def aug_cond(s):
            j0, _ = s
            return j0 != 0

        def aug_body(s):
            j0, p_ = s
            j1 = way[j0]
            p_ = p_.at[j0].set(p_[j1])
            return j1, p_

        _, p = jax.lax.while_loop(aug_cond, aug_body, (j0, p))
        return u, v, p

    def outer_cond(s):
        i = s[0]
        return i < n_rows

    def outer_body(s):
        i, u, v, p = s
        u, v, p = assign_row(i, u, v, p)
        return i + 1, u, v, p

    _, _, _, p = jax.lax.while_loop(
        outer_cond, outer_body, (jnp.int32(0), u0, v0, p0))
    return p[1:] - 1


def pad_cost(cost: jax.Array, num_valid_cols: jax.Array,
             pad_value: float = 1e6) -> jax.Array:
    """Mask padded GT columns of a (Q, G) cost with a large constant.

    Columns >= num_valid_cols become interchangeable dummy columns so the
    square solve stays exact for the real columns.
    """
    g = cost.shape[1]
    col_valid = jnp.arange(g) < num_valid_cols
    return jnp.where(col_valid[None, :], cost, pad_value)


def match(cost: jax.Array, num_valid_cols: jax.Array):
    """Match Q queries to G<=Q (padded) GT instances.

    Args:
      cost: (Q, G) float cost; first ``num_valid_cols`` columns are real.
      num_valid_cols: scalar int array.
    Returns:
      gt_of_query: (Q,) int32 — matched column per query, -1 for queries
        assigned to padded columns;
      query_is_matched: (Q,) bool.
    """
    # transposed rectangular solve: rows = the num_valid_cols REAL GT
    # instances (dynamic), columns = queries — only G augmenting paths run,
    # not Q, and no dummy-column padding is needed. The restriction of the
    # padded square optimum to real columns equals this rectangular optimum
    # (dummy columns are interchangeable), so the matching is unchanged.
    gt_of_query = hungarian_rows(cost.T, num_valid_cols)
    matched = gt_of_query >= 0
    return gt_of_query.astype(jnp.int32), matched
