"""Pallas TPU kernel for the JV cascade assignment solver.

Why: the lax implementation (ops/assignment.py) is a nested dynamic loop --
a fori over active rows around a Dijkstra while_loop -- over TINY tensors
(cost matrix ~128x164 f32 = 84 KB). On TPU each while iteration executes a
handful of micro-kernels, so the solve is bound by sequential per-op
overhead, not compute: measured 21.8 ms per 128-frame chunk for ONE stage
(the tracker runs two per frame; its scan cost is ~45 ms/chunk, ~14% of the
step). This kernel keeps the ENTIRE solve on-core: every vector lives in
VMEM/registers, loop iterations cost VPU-lane work instead of kernel
dispatches.

Same math as ops/assignment.py solve_cascade_assignment (single-pass JV
with level freezing; see its docstring for the algorithm contract), with
mask-select updates replacing scatters and min-encoded argmins replacing
jnp.argmin (lowest-index tie-breaking preserved). The cheap vectorized prep
(clamping, dummy augmentation, level sort) stays in XLA; the kernel runs
only the sequential part.

Batching: grid over the leading (stream) axis; jax.vmap is supported via a
custom_vmap rule that reshapes into the batched kernel (one level of vmap,
which is how tracker_step is used everywhere).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = 1e9
_LEVEL_INACTIVE = 2**30  # python int: jnp constants would be captured tracers
_IHUGE = 2**30


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _make_stage_runner(r_pad: int, nc_pad: int):
    """Shared in-kernel machinery: returns (run_stage, pick_r, iotas)."""
    iota_c = jax.lax.broadcasted_iota(jnp.int32, (1, nc_pad), 1)
    iota_r = jax.lax.broadcasted_iota(jnp.int32, (1, r_pad), 1)

    def pick_c(vec, j):
        """vec[(0, j)] as a scalar via masked reduction."""
        return jnp.sum(jnp.where(iota_c == j, vec, 0), dtype=vec.dtype)

    def pick_r(vec, i):
        return jnp.sum(jnp.where(iota_r == i, vec, 0), dtype=vec.dtype)

    def argmin_c(vec):
        """(min, lowest-index argmin) over lanes of a (1, NC) f32 vector."""
        mu = jnp.min(vec)
        cand = jnp.where(vec == mu, iota_c, _IHUGE)
        return mu, jnp.min(cand)

    def run_stage(aug_ref, order_v, levels_v, n_active, col_veto=None,
                  skip_row=None):
        """One JV cascade sweep.

        col_veto: optional (1, NC) i32 mask -- columns forced ineligible
          (stage B: real columns taken by stage A).
        skip_row: optional fn(row_idx) -> i32, nonzero = leave this row
          unmatched (stage B: rows that matched a real column in stage A).
        Returns (row_assign (1, R_pad), col_owner (1, NC_pad))."""

        def augment_row(k, carry):
            row_assign, col_owner, owner_level, v = carry
            row_idx = pick_r(order_v, k)
            my_level = pick_r(levels_v, row_idx)
            frozen = owner_level < my_level  # (1, NC)

            def row_costs(i):
                row = aug_ref[pl.ds(i, 1), :]  # dynamic sublane start
                row = jnp.where(frozen, _BIG, row)
                if col_veto is not None:
                    row = jnp.where(col_veto > 0, _BIG, row)
                return row

            def do_augment(carry):
                row_assign, col_owner, owner_level, v = carry
                d0 = row_costs(row_idx) - v
                pred0 = jnp.full((1, nc_pad), row_idx, jnp.int32)
                todo0 = jnp.ones((1, nc_pad), jnp.int32)  # i32: legal carry

                def dij_cond(s):
                    return s[3] < 0

                def dij_body(s):
                    d, pred, todo, _ = s
                    dj = jnp.where(todo > 0, d, _BIG)
                    mu, j_min = argmin_c(dj)
                    owner_j = pick_c(col_owner, j_min)
                    free = owner_j < 0
                    j_star = jnp.where(free, j_min, jnp.int32(-1))
                    todo = jnp.where(iota_c == j_min, 0, todo)
                    i2 = jnp.maximum(owner_j, 0)
                    c2 = row_costs(i2) - v
                    c2_jmin = pick_c(c2, j_min)
                    alt = mu + c2 - c2_jmin
                    better = (todo > 0) & (alt < d) & jnp.logical_not(free)
                    d = jnp.where(better, alt, d)
                    pred = jnp.where(better, i2, pred)
                    return d, pred, todo, j_star

                d, pred, todo, j_star = jax.lax.while_loop(
                    dij_cond, dij_body, (d0, pred0, todo0, jnp.int32(-1))
                )
                mu_star = pick_c(d, j_star)
                v = jnp.where(todo == 0, v + d - mu_star, v)

                def walk_cond(s):
                    return s[4] == 0

                def walk_body(s):
                    j, row_assign, col_owner, owner_level, _ = s
                    i2 = pick_c(pred, j)
                    prev_j = pick_r(row_assign, i2)
                    lvl_i2 = pick_r(levels_v, i2)
                    col_owner = jnp.where(iota_c == j, i2, col_owner)
                    owner_level = jnp.where(iota_c == j, lvl_i2, owner_level)
                    row_assign = jnp.where(iota_r == i2, j, row_assign)
                    done = (i2 == row_idx).astype(jnp.int32)
                    return (jnp.where(done > 0, j, prev_j), row_assign,
                            col_owner, owner_level, done)

                _, row_assign, col_owner, owner_level, _ = jax.lax.while_loop(
                    walk_cond, walk_body,
                    (j_star, row_assign, col_owner, owner_level,
                     jnp.int32(0)),
                )
                return row_assign, col_owner, owner_level, v

            if skip_row is None:
                return do_augment(carry)
            return jax.lax.cond(
                skip_row(row_idx) > 0, lambda c: c, do_augment, carry
            )

        carry0 = (
            jnp.full((1, r_pad), -1, jnp.int32),
            jnp.full((1, nc_pad), -1, jnp.int32),
            jnp.full((1, nc_pad), _LEVEL_INACTIVE, jnp.int32),
            jnp.zeros((1, nc_pad), jnp.float32),
        )
        row_assign, col_owner, _, _ = jax.lax.fori_loop(
            0, n_active, augment_row, carry0
        )
        return row_assign, col_owner

    return run_stage, pick_r, iota_c, iota_r


def _jv_kernel(nactive_ref, aug_ref, order_ref, levels_ref, out_ref,
               *, r_pad: int, nc_pad: int):
    """One stream's cascade solve.

    aug_ref: (R_pad, NC_pad) f32 augmented costs (_BIG where ineligible)
    order_ref/levels_ref: (1, R_pad) i32 (levels in row-index space)
    nactive_ref: (S, 1) i32 in SMEM (full array; indexed by program id)
    out_ref: (1, R_pad) i32 row->augmented-column assignment (-1 unmatched)
    """
    run_stage, _, _, _ = _make_stage_runner(r_pad, nc_pad)
    n_active = nactive_ref[pl.program_id(0), 0]
    row_assign, _ = run_stage(aug_ref, order_ref[...], levels_ref[...],
                              n_active)
    out_ref[...] = row_assign


def _two_stage_kernel(n_ref, aug_a_ref, order_a_ref, levels_a_ref,
                      aug_b_ref, order_b_ref, out_a_ref, out_b_ref,
                      *, r_pad: int, nc_pad: int, c_real: int):
    """DeepSORT's two-stage match in ONE dispatch per frame.

    n_ref: (S, 2) i32 SMEM -- [n_active_a, n_active_b_super] per stream.
    Stage A = gated-cosine cascade. Stage B = IoU single-level match over
    the leftover rows (order_b is the superset candidates; rows that took a
    REAL column in A are skipped) and leftover columns (A's col_owner IS
    the taken set)."""
    run_stage, pick_r, iota_c, _ = _make_stage_runner(r_pad, nc_pad)
    pid = pl.program_id(0)

    assign_a, col_owner_a = run_stage(
        aug_a_ref, order_a_ref[...], levels_a_ref[...], n_ref[pid, 0]
    )
    # real columns matched in stage A are ineligible in stage B; private
    # dummy lanes (>= c_real) stay available so B rows can go unmatched
    taken = ((col_owner_a >= 0) & (iota_c < c_real)).astype(jnp.int32)

    def skip_row(i):
        a = pick_r(assign_a, i)
        return ((a >= 0) & (a < c_real)).astype(jnp.int32)

    zeros_lv = jnp.zeros((1, r_pad), jnp.int32)
    assign_b, _ = run_stage(
        aug_b_ref, order_b_ref[...], zeros_lv, n_ref[pid, 1],
        col_veto=taken, skip_row=skip_row,
    )
    out_a_ref[...] = assign_a
    out_b_ref[...] = assign_b


def _solve_batched(aug_cost, order, levels, n_active, interpret=False):
    """(S, R_pad, NC_pad), (S, R_pad), (S, R_pad), (S, 1) -> (S, R_pad)."""
    s, r_pad, nc_pad = aug_cost.shape
    kernel = partial(_jv_kernel, r_pad=r_pad, nc_pad=nc_pad)
    return pl.pallas_call(
        kernel,
        grid=(s,),
        in_specs=[
            pl.BlockSpec((s, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((None, r_pad, nc_pad), lambda i: (i, 0, 0)),
            pl.BlockSpec((None, 1, r_pad), lambda i: (i, 0, 0)),
            pl.BlockSpec((None, 1, r_pad), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((None, 1, r_pad), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((s, 1, r_pad), jnp.int32),
        interpret=interpret,
    )(n_active, aug_cost, order[:, None, :], levels[:, None, :])[:, 0, :]


def _prep(cost, row_levels, row_mask, col_mask, max_distance):
    """XLA-side prep: build augmented costs, level order, active count."""
    cost = cost.astype(jnp.float32)
    max_distance = jnp.asarray(max_distance, jnp.float32)
    r, c = cost.shape
    r_pad = _round_up(r, 8)
    nc_pad = _round_up(c + r, 128)

    eligible = row_mask[:, None] & col_mask[None, :] & (cost <= max_distance)
    real_block = jnp.where(eligible, cost, _BIG)
    dummy_block = jnp.where(
        jnp.eye(r, dtype=bool), max_distance + 2e-5, _BIG
    )
    aug = jnp.concatenate([real_block, dummy_block], axis=1)
    aug = jnp.pad(aug, ((0, r_pad - r), (0, nc_pad - (c + r))),
                  constant_values=_BIG)

    levels = jnp.where(row_mask, row_levels.astype(jnp.int32),
                       _LEVEL_INACTIVE)
    order = jnp.argsort(levels, stable=True).astype(jnp.int32)
    order = jnp.pad(order, (0, r_pad - r))
    levels_p = jnp.pad(levels, (0, r_pad - r), constant_values=_LEVEL_INACTIVE)
    n_active = jnp.sum(row_mask.astype(jnp.int32)).reshape(1)
    return aug, order, levels_p, n_active, r, c


def _solve_two_batched_c(aug_a, order_a, levels_a, aug_b, order_b, n2,
                         c_real, interpret=False):
    """(S, R_pad, NC_pad) x2, (S, R_pad) x3, (S, 2) -> 2x (S, R_pad)."""
    s, r_pad, nc_pad = aug_a.shape
    kernel = partial(_two_stage_kernel, r_pad=r_pad, nc_pad=nc_pad,
                     c_real=c_real)
    out_a, out_b = pl.pallas_call(
        kernel,
        grid=(s,),
        in_specs=[
            pl.BlockSpec((s, 2), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((None, r_pad, nc_pad), lambda i: (i, 0, 0)),
            pl.BlockSpec((None, 1, r_pad), lambda i: (i, 0, 0)),
            pl.BlockSpec((None, 1, r_pad), lambda i: (i, 0, 0)),
            pl.BlockSpec((None, r_pad, nc_pad), lambda i: (i, 0, 0)),
            pl.BlockSpec((None, 1, r_pad), lambda i: (i, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((None, 1, r_pad), lambda i: (i, 0, 0)),
            pl.BlockSpec((None, 1, r_pad), lambda i: (i, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((s, 1, r_pad), jnp.int32),
            jax.ShapeDtypeStruct((s, 1, r_pad), jnp.int32),
        ],
        interpret=interpret,
    )(n2, aug_a, order_a[:, None, :], levels_a[:, None, :],
      aug_b, order_b[:, None, :])
    return out_a[:, 0, :], out_b[:, 0, :]


def _prep_two(cost_a, levels_a, rows_a, cols, maxd_a, cost_b, rows_b_super,
              maxd_b):
    aug_a, order_a, lv_a, n_a, r, c = _prep(
        cost_a, levels_a, rows_a, cols, maxd_a)
    zeros_lv = jnp.zeros(cost_b.shape[:1], jnp.int32)
    aug_b, order_b, _, n_b, _, _ = _prep(
        cost_b, zeros_lv, rows_b_super, cols, maxd_b)
    n2 = jnp.concatenate([n_a, n_b]).astype(jnp.int32)  # (2,)
    return aug_a, order_a, lv_a, aug_b, order_b, n2, r, c


@partial(jax.custom_batching.custom_vmap)
def solve_two_stage_pallas(cost_a, levels_a, rows_a, cols, maxd_a,
                           cost_b, rows_b_super, maxd_b):
    """Fused two-stage DeepSORT match (see assignment.py
    solve_two_stage_assignment); one kernel dispatch per frame."""
    aug_a, order_a, lv_a, aug_b, order_b, n2, r, c = _prep_two(
        cost_a, levels_a, rows_a, cols, maxd_a, cost_b, rows_b_super, maxd_b)
    out_a, out_b = _solve_two_batched_c(
        aug_a[None], order_a[None], lv_a[None], aug_b[None], order_b[None],
        n2[None], c_real=c,
    )
    a = out_a[0, :r]
    b = out_b[0, :r]
    match_a = jnp.where((a >= 0) & (a < c) & rows_a, a, -1).astype(jnp.int32)
    match_b = jnp.where((b >= 0) & (b < c) & rows_b_super, b, -1).astype(
        jnp.int32)
    return match_a, match_b


@solve_two_stage_pallas.def_vmap
def _two_stage_vmap_rule(axis_size, in_batched, cost_a, levels_a, rows_a,
                         cols, maxd_a, cost_b, rows_b_super, maxd_b):
    def bcast(x, batched):
        if batched:
            return x
        v = jnp.asarray(x)
        return jnp.broadcast_to(v[None], (axis_size,) + v.shape)

    args = [cost_a, levels_a, rows_a, cols, maxd_a, cost_b, rows_b_super,
            maxd_b]
    cost_a, levels_a, rows_a, cols, maxd_a, cost_b, rows_b_super, maxd_b = [
        bcast(a, b) for a, b in zip(args, in_batched)
    ]
    maxd_a = jnp.asarray(maxd_a, jnp.float32).reshape(axis_size, -1)[:, 0]
    maxd_b = jnp.asarray(maxd_b, jnp.float32).reshape(axis_size, -1)[:, 0]

    prep = jax.vmap(
        lambda ca, la, ra, co, ma, cb, rb, mb: _prep_two(
            ca, la, ra, co, ma, cb, rb, mb)[:6]
    )
    aug_a, order_a, lv_a, aug_b, order_b, n2 = prep(
        cost_a, levels_a, rows_a, cols, maxd_a, cost_b, rows_b_super, maxd_b)
    r, c = cost_a.shape[1], cost_a.shape[2]
    out_a, out_b = _solve_two_batched_c(
        aug_a, order_a, lv_a, aug_b, order_b, n2, c_real=c)
    a = out_a[:, :r]
    b = out_b[:, :r]
    match_a = jnp.where((a >= 0) & (a < c) & rows_a, a, -1).astype(jnp.int32)
    match_b = jnp.where((b >= 0) & (b < c) & rows_b_super, b, -1).astype(
        jnp.int32)
    return (match_a, match_b), (True, True)


@partial(jax.custom_batching.custom_vmap)
def solve_cascade_assignment_pallas(cost, row_levels, row_mask, col_mask,
                                    max_distance):
    """Drop-in for ops.assignment.solve_cascade_assignment on TPU."""
    aug, order, levels, n_active, r, c = _prep(
        cost, row_levels, row_mask, col_mask, max_distance
    )
    row_assign = _solve_batched(
        aug[None], order[None], levels[None], n_active[None]
    )[0, :r]
    matched = (row_assign >= 0) & (row_assign < c) & row_mask
    return jnp.where(matched, row_assign, -1).astype(jnp.int32)


@solve_cascade_assignment_pallas.def_vmap
def _solve_vmap_rule(axis_size, in_batched, cost, row_levels, row_mask,
                     col_mask, max_distance):
    def bcast(x, batched):
        if batched:
            return x
        v = jnp.asarray(x)
        return jnp.broadcast_to(v[None], (axis_size,) + v.shape)

    cost = bcast(cost, in_batched[0])
    row_levels = bcast(row_levels, in_batched[1])
    row_mask = bcast(row_mask, in_batched[2])
    col_mask = bcast(col_mask, in_batched[3])
    max_distance = bcast(max_distance, in_batched[4])
    max_distance = jnp.broadcast_to(
        jnp.asarray(max_distance, jnp.float32).reshape(axis_size, -1)[:, 0],
        (axis_size,),
    )

    prep = jax.vmap(
        lambda co, lv, rm, cm, md: _prep(co, lv, rm, cm, md)[:4]
    )
    aug, order, levels, n_active = prep(
        cost, row_levels, row_mask, col_mask, max_distance
    )
    r, c = cost.shape[1], cost.shape[2]
    row_assign = _solve_batched(aug, order, levels, n_active)[:, :r]
    matched = (row_assign >= 0) & (row_assign < c) & row_mask
    out = jnp.where(matched, row_assign, -1).astype(jnp.int32)
    return out, True
