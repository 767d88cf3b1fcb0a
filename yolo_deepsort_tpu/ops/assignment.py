"""Masked linear-assignment / matching-cascade solver, fully on-chip.

Contracts (SURVEY.md Appendix B; reference deep_sort/sort/linear_assignment.py):

  * ``min_cost_matching`` (~25-80): clamp costs above ``max_distance`` to
    ``max_distance + 1e-5``, solve an optimal assignment (scipy Hungarian),
    drop pairs whose cost exceeds ``max_distance``.
  * ``matching_cascade`` (~85-140): for level L = 0..depth-1, run
    min_cost_matching restricted to rows with ``time_since_update == 1 + L``
    against the detections left unmatched by earlier levels.

Oracle: specs/assignment_np.py.

Design notes (TPU-first):

* The solver is Jonker-Volgenant successive shortest augmenting paths over a
  dense masked matrix, written as fixed-shape lax loops: one fori_loop over
  the R row slots, an inner while_loop Dijkstra whose every iteration is a
  vectorized scan over the C+R column axis (VPU-friendly), and a short
  augment walk. No data-dependent shapes, no host round-trips; it vmaps over
  a stream axis (loops run in lockstep, masked).

* "Unmatched" is modelled with one private dummy column per row priced at
  ``max_distance + 2e-5``: a row whose best real option is worse than the
  clamp takes its dummy. This reproduces scipy's clamp-then-drop exactly:
  clamped pairs are interchangeable with dummies for the valid-match set, so
  making over-threshold pairs ineligible and pricing the explicit "stay
  unmatched" option just above the threshold yields the same kept matches.

* The whole cascade is ONE JV pass: rows are processed in level order, and a
  column matched by an earlier level is frozen (excluded from later Dijkstra
  graphs, so no later augmenting path can reroute an earlier level's match).
  Successive-shortest-paths keeps every processed prefix optimal, so the
  matching after finishing level L's rows equals the per-level LSA of the
  cascade -- in a single O(R) augmentation sweep instead of ``depth``
  separate solves. Rows of inactive slots take their dummy in one Dijkstra
  iteration, so padded slots cost almost nothing.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

_BIG = 1e9  # "infinite" cost; arithmetic on it must stay finite
_LEVEL_INACTIVE = jnp.int32(2**30)  # level assigned to masked-out rows


def _augment_row(carry, row_idx, aug_cost, max_distance):
    """Run one JV augmentation for ``row_idx`` (a traced int32).

    carry: (row_assign (R,), col_owner (NC,), owner_level (NC,), v (NC,),
            levels (R,))
    aug_cost: (R, NC) augmented cost matrix (real cols + private dummies);
      ineligible entries hold _BIG.
    """
    row_assign, col_owner, owner_level, v, levels = carry
    r, nc = aug_cost.shape
    my_level = levels[row_idx]

    def row_costs(i):
        """Eligible costs of row i against the current frozen set."""
        frozen = owner_level < my_level
        return jnp.where(frozen, _BIG, aug_cost[i])

    c_row = row_costs(row_idx)
    d = c_row - v
    pred = jnp.full((nc,), row_idx, dtype=jnp.int32)
    todo = jnp.ones((nc,), dtype=bool)

    def dijkstra_cond(s):
        _, _, _, j_star, _ = s
        return j_star < 0

    def dijkstra_body(s):
        d, pred, todo, _, guard = s
        dj = jnp.where(todo, d, _BIG)
        j_min = jnp.argmin(dj)
        mu = dj[j_min]
        free = col_owner[j_min] < 0
        # if free we are done: signal via j_star >= 0
        j_star = jnp.where(free, j_min, -1)

        # scan j_min and relax through its owner
        todo = todo.at[j_min].set(False)
        i2 = jnp.maximum(col_owner[j_min], 0)
        c2 = row_costs(i2) - v
        alt = mu + c2 - c2[j_min]
        better = todo & (alt < d) & jnp.logical_not(free)
        d = jnp.where(better, alt, d)
        pred = jnp.where(better, i2, pred)
        return d, pred, todo, j_star, guard + 1

    d, pred, todo, j_star, _ = jax.lax.while_loop(
        dijkstra_cond,
        dijkstra_body,
        (d, pred, todo, jnp.int32(-1), jnp.int32(0)),
    )
    mu = d[j_star]

    # dual update on scanned columns keeps reduced costs feasible
    v = jnp.where(~todo, v + d - mu, v)

    # augment: walk the predecessor chain from j_star back to row_idx
    def walk_cond(s):
        _, _, _, done = s
        return jnp.logical_not(done)

    def walk_body(s):
        j, row_assign, col_owner, _ = s
        i2 = pred[j]
        prev_j = row_assign[i2]
        col_owner = col_owner.at[j].set(i2)
        row_assign = row_assign.at[i2].set(j)
        done = i2 == row_idx
        return jnp.where(done, j, prev_j), row_assign, col_owner, done

    _, row_assign, col_owner, _ = jax.lax.while_loop(
        walk_cond, walk_body, (j_star, row_assign, col_owner, False)
    )
    # every column (re)matched in this augmentation belongs to my_level now
    owner_has_level = jnp.where(
        col_owner >= 0, levels[jnp.maximum(col_owner, 0)], _LEVEL_INACTIVE
    )
    owner_level = owner_has_level
    return (row_assign, col_owner, owner_level, v, levels)


def _use_pallas_solver() -> bool:
    """Pallas JV kernel on TPU-class backends (keeps the whole nested solve
    on-core: measured 12.5 vs 21.8 ms/chunk for one stage at the honest
    bench load). YDT_JV_PALLAS=0/1 forces; default: auto by backend."""
    import os

    flag = os.environ.get("YDT_JV_PALLAS", "auto")
    if flag == "0":
        return False
    if flag == "1":
        return True
    try:
        return jax.default_backend() not in ("cpu", "gpu")
    except Exception:
        return False


def solve_cascade_assignment(
    cost: jnp.ndarray,
    row_levels: jnp.ndarray,
    row_mask: jnp.ndarray,
    col_mask: jnp.ndarray,
    max_distance: float | jnp.ndarray,
) -> jnp.ndarray:
    """Matching cascade as a single JV pass (see _solve_cascade_lax for the
    algorithm contract; on TPU dispatches to the Pallas kernel, identical
    outputs -- tested exact)."""
    if _use_pallas_solver():
        from .assignment_pallas import solve_cascade_assignment_pallas

        return solve_cascade_assignment_pallas(
            cost, row_levels, row_mask, col_mask, max_distance
        )
    return _solve_cascade_lax(cost, row_levels, row_mask, col_mask,
                              max_distance)


@partial(jax.jit, static_argnames=())
def _solve_cascade_lax(
    cost: jnp.ndarray,
    row_levels: jnp.ndarray,
    row_mask: jnp.ndarray,
    col_mask: jnp.ndarray,
    max_distance: float | jnp.ndarray,
) -> jnp.ndarray:
    """Matching cascade as a single JV pass.

    Args:
      cost: (R, C) float cost matrix (un-clamped; may contain INFTY gates).
      row_levels: (R,) int32 cascade level per row; lower levels match first
        (reference: level = time_since_update - 1). Rows sharing a level are
        solved jointly; later levels only see leftover columns.
      row_mask / col_mask: bool validity.
      max_distance: matching threshold; pairs with cost > max_distance are
        never matched.

    Returns:
      row_to_col: (R,) int32 matched column per row, or -1.
    """
    cost = cost.astype(jnp.float32)
    max_distance = jnp.asarray(max_distance, jnp.float32)
    r, c = cost.shape
    nc = c + r

    eligible = row_mask[:, None] & col_mask[None, :] & (cost <= max_distance)
    dummy_cost = max_distance + 2e-5

    real_block = jnp.where(eligible, cost, _BIG)  # (R, C)
    dummy_block = jnp.where(
        jnp.eye(r, dtype=bool), dummy_cost, _BIG
    )  # (R, R): private dummies
    aug_cost = jnp.concatenate([real_block, dummy_block], axis=1)  # (R, NC)

    levels = jnp.where(row_mask, row_levels.astype(jnp.int32), _LEVEL_INACTIVE)
    order = jnp.argsort(levels, stable=True)  # level-major, row-index minor

    carry = (
        jnp.full((r,), -1, dtype=jnp.int32),  # row_assign (into NC)
        jnp.full((nc,), -1, dtype=jnp.int32),  # col_owner
        jnp.full((nc,), _LEVEL_INACTIVE, dtype=jnp.int32),  # owner_level
        jnp.zeros((nc,), dtype=jnp.float32),  # v duals
        levels,
    )

    def body(k, carry):
        return _augment_row(carry, order[k], aug_cost, max_distance)

    # dynamic trip count: only the active rows (sorted first) are augmented;
    # padded slots never enter the loop. Under vmap this runs the max active
    # count across the batch -- typically ~10-30 of MAX_TRACKS=128 slots.
    n_active = jnp.sum(row_mask.astype(jnp.int32))
    row_assign, _, _, _, _ = jax.lax.fori_loop(0, n_active, body, carry)

    matched = (row_assign >= 0) & (row_assign < c) & row_mask
    return jnp.where(matched, row_assign, -1).astype(jnp.int32)


def solve_masked_assignment(
    cost: jnp.ndarray,
    row_mask: jnp.ndarray,
    col_mask: jnp.ndarray,
    max_distance: float | jnp.ndarray,
) -> jnp.ndarray:
    """Single-level min_cost_matching (all rows at cascade level 0)."""
    r = cost.shape[0]
    return solve_cascade_assignment(
        cost,
        jnp.zeros((r,), dtype=jnp.int32),
        row_mask,
        col_mask,
        max_distance,
    )


def solve_two_stage_assignment(
    cost_a: jnp.ndarray,       # (R, C) stage-A (cascade) costs
    levels_a: jnp.ndarray,     # (R,) cascade levels
    rows_a: jnp.ndarray,       # (R,) stage-A row mask
    cols: jnp.ndarray,         # (C,) detection mask (shared)
    maxd_a,                    # stage-A threshold
    cost_b: jnp.ndarray,       # (R, C) stage-B (IoU) costs
    rows_b_super: jnp.ndarray, # (R,) stage-B candidate rows BEFORE removing
    #   stage-A winners (i.e. tentative | (confirmed & tsu == 1)); rows that
    #   matched a real column in stage A are excluded automatically
    maxd_b,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """DeepSORT's two-stage match as one solve: the gated-cosine cascade,
    then IoU min_cost_matching over the leftover rows and detections
    (reference: tracker.py _match). On TPU both stages run in a single
    Pallas kernel dispatch; semantics identical to calling
    solve_cascade_assignment then solve_masked_assignment with
    det_taken-filtered columns."""
    if _use_pallas_solver():
        from .assignment_pallas import solve_two_stage_pallas

        return solve_two_stage_pallas(
            cost_a, levels_a, rows_a, cols, maxd_a, cost_b, rows_b_super,
            maxd_b,
        )
    match_a = _solve_cascade_lax(cost_a, levels_a, rows_a, cols, maxd_a)
    c = cost_a.shape[1]
    det_taken = jnp.zeros((c,), bool).at[
        jnp.where(match_a >= 0, match_a, c)
    ].set(True, mode="drop")
    rows_b = rows_b_super & (match_a < 0)
    match_b = _solve_cascade_lax(
        cost_b, jnp.zeros(cost_b.shape[:1], jnp.int32), rows_b,
        cols & ~det_taken, maxd_b,
    )
    return match_a, match_b
