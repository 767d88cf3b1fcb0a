"""On-chip auction assignment vs the scipy oracle (specs/assignment_np.py).

Random float matrices have a unique optimum almost surely, so the JAX solver
must recover scipy's exact match set after threshold filtering.
"""

import numpy as np
import pytest
from scipy.optimize import linear_sum_assignment

from yolo_deepsort_tpu.ops.assignment import solve_masked_assignment


def scipy_min_cost_matching(cost, max_distance):
    """Reference semantics (linear_assignment.py:~25-80) on a dense matrix."""
    cost = cost.copy()
    cost[cost > max_distance] = max_distance + 1e-5
    rows, cols = linear_sum_assignment(cost)
    matches = {}
    for r, c in zip(rows, cols):
        if cost[r, c] <= max_distance:
            matches[r] = c
    return matches


def run_case(cost, max_distance, row_mask=None, col_mask=None):
    r, c = cost.shape
    if row_mask is None:
        row_mask = np.ones(r, bool)
    if col_mask is None:
        col_mask = np.ones(c, bool)
    out = np.asarray(
        solve_masked_assignment(cost, row_mask, col_mask, max_distance)
    )
    return {int(i): int(out[i]) for i in range(r) if out[i] >= 0}


@pytest.mark.parametrize("seed", range(12))
@pytest.mark.parametrize("shape", [(4, 4), (7, 3), (3, 9), (12, 12)])
def test_matches_scipy_on_random_matrices(seed, shape):
    rng = np.random.default_rng(seed)
    cost = rng.uniform(0, 1, shape).astype(np.float32)
    maxd = 0.6
    expected = scipy_min_cost_matching(cost.astype(np.float64), maxd)
    got = run_case(cost, maxd)
    assert got == expected, f"\ncost=\n{cost}\nexp={expected}\ngot={got}"


@pytest.mark.parametrize("seed", range(6))
def test_matches_scipy_with_infty_gates(seed):
    rng = np.random.default_rng(100 + seed)
    cost = rng.uniform(0, 0.4, (8, 6)).astype(np.float32)
    gate = rng.uniform(size=(8, 6)) < 0.4
    cost[gate] = 1e5  # INFTY_COST gating, as gate_cost_matrix produces
    maxd = 0.2
    expected = scipy_min_cost_matching(cost.astype(np.float64), maxd)
    got = run_case(cost, maxd)
    assert got == expected


def test_masked_rows_cols_excluded():
    cost = np.full((5, 5), 0.1, np.float32)
    np.fill_diagonal(cost, 0.01)
    row_mask = np.array([True, True, False, True, False])
    col_mask = np.array([True, False, True, True, True])
    got = run_case(cost, 0.5, row_mask, col_mask)
    assert 2 not in got and 4 not in got
    assert all(c != 1 for c in got.values())
    # remaining diagonal pairs are optimal
    assert got[0] == 0 and got[3] == 3


def test_all_above_threshold_unmatched():
    cost = np.full((4, 4), 0.9, np.float32)
    assert run_case(cost, 0.5) == {}


def test_empty_masks():
    cost = np.zeros((4, 4), np.float32)
    got = run_case(cost, 0.5, np.zeros(4, bool), np.ones(4, bool))
    assert got == {}


def test_more_rows_than_cols_prefers_cheapest():
    cost = np.array([[0.5], [0.1], [0.3]], np.float32)
    got = run_case(cost, 0.6)
    assert got == {1: 0}


def test_large_masked_matrix_matches_scipy():
    rng = np.random.default_rng(7)
    r, c = 64, 48
    cost = rng.uniform(0, 1, (r, c)).astype(np.float32)
    row_mask = rng.uniform(size=r) < 0.7
    col_mask = rng.uniform(size=c) < 0.7
    maxd = 0.5
    sub_cost = cost[np.ix_(row_mask, col_mask)].astype(np.float64)
    expected_sub = scipy_min_cost_matching(sub_cost, maxd)
    ridx = np.flatnonzero(row_mask)
    cidx = np.flatnonzero(col_mask)
    expected = {int(ridx[r_]): int(cidx[c_]) for r_, c_ in expected_sub.items()}
    got = run_case(cost, maxd, row_mask, col_mask)
    assert got == expected


def test_pallas_solver_matches_lax(monkeypatch):
    """The Pallas JV kernel (interpret mode on CPU) is EXACTLY the lax
    solver, unbatched and vmapped, across random masked cascades. On-chip
    exactness was verified on the TPU (tools/bench_probes.py --probe
    jv-scan with JV_IMPL=pallas; 12.5 vs 21.8 ms/chunk)."""
    import jax

    import yolo_deepsort_tpu.ops.assignment_pallas as ap
    from yolo_deepsort_tpu.ops.assignment import _solve_cascade_lax

    orig = ap._solve_batched
    monkeypatch.setattr(
        ap, "_solve_batched", lambda *a, **k: orig(*a, interpret=True)
    )

    rng = np.random.default_rng(0)
    for trial in range(8):
        r, c = 32, 12
        cost = rng.uniform(0, 0.5, (r, c)).astype(np.float32)
        levels = rng.integers(0, 4, r).astype(np.int32)
        rm = rng.uniform(size=r) < 0.6
        cm = rng.uniform(size=c) < 0.8
        ref = np.asarray(_solve_cascade_lax(cost, levels, rm, cm, 0.25))
        got = np.asarray(
            ap.solve_cascade_assignment_pallas(cost, levels, rm, cm, 0.25)
        )
        np.testing.assert_array_equal(ref, got, err_msg=f"trial {trial}")

    s = 4
    cost = rng.uniform(0, 0.5, (s, 32, 12)).astype(np.float32)
    levels = rng.integers(0, 4, (s, 32)).astype(np.int32)
    rm = rng.uniform(size=(s, 32)) < 0.6
    cm = rng.uniform(size=(s, 12)) < 0.8
    ref = jax.vmap(
        lambda a, b, c_, d_: _solve_cascade_lax(a, b, c_, d_, 0.25)
    )(cost, levels, rm, cm)
    got = jax.vmap(
        lambda a, b, c_, d_: ap.solve_cascade_assignment_pallas(
            a, b, c_, d_, 0.25)
    )(cost, levels, rm, cm)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))


def test_two_stage_fused_matches_sequential(monkeypatch):
    """solve_two_stage_assignment == cascade then det_taken-filtered IoU
    stage: lax path by construction, pallas fused kernel (interpret mode)
    against it on random two-stage cases, unbatched and vmapped."""
    import jax

    import yolo_deepsort_tpu.ops.assignment_pallas as ap
    from yolo_deepsort_tpu.ops.assignment import _solve_cascade_lax

    orig = ap._solve_two_batched_c
    monkeypatch.setattr(
        ap, "_solve_two_batched_c",
        lambda *a, **k: orig(*a, **{**k, "interpret": True}),
    )

    def lax_two_stage(ca, la, ra, co, ma, cb, rb_super, mb):
        import jax.numpy as jnp

        match_a = _solve_cascade_lax(ca, la, ra, co, ma)
        c = ca.shape[1]
        taken = np.zeros(c, bool)
        for v in np.asarray(match_a):
            if v >= 0:
                taken[v] = True
        rows_b = np.asarray(rb_super) & (np.asarray(match_a) < 0)
        match_b = _solve_cascade_lax(
            cb, jnp.zeros(cb.shape[:1], jnp.int32), rows_b,
            np.asarray(co) & ~taken, mb,
        )
        return np.asarray(match_a), np.asarray(match_b)

    rng = np.random.default_rng(5)
    for trial in range(6):
        r, c = 24, 10
        ca = rng.uniform(0, 0.5, (r, c)).astype(np.float32)
        la = rng.integers(0, 4, r).astype(np.int32)
        ra = rng.uniform(size=r) < 0.5
        co = rng.uniform(size=c) < 0.85
        cb = rng.uniform(0, 1.2, (r, c)).astype(np.float32)
        rb_super = (rng.uniform(size=r) < 0.5) | ra
        ref_a, ref_b = lax_two_stage(ca, la, ra, co, 0.25, cb, rb_super, 0.7)
        got_a, got_b = ap.solve_two_stage_pallas(
            ca, la, ra, co, 0.25, cb, rb_super, 0.7)
        np.testing.assert_array_equal(ref_a, np.asarray(got_a),
                                      err_msg=f"trial {trial} stage A")
        np.testing.assert_array_equal(ref_b, np.asarray(got_b),
                                      err_msg=f"trial {trial} stage B")

    # vmapped (the production shape inside the stream vmap)
    s = 3
    ca = rng.uniform(0, 0.5, (s, 24, 10)).astype(np.float32)
    la = rng.integers(0, 4, (s, 24)).astype(np.int32)
    ra = rng.uniform(size=(s, 24)) < 0.5
    co = rng.uniform(size=(s, 10)) < 0.85
    cb = rng.uniform(0, 1.2, (s, 24, 10)).astype(np.float32)
    rb = (rng.uniform(size=(s, 24)) < 0.5) | ra
    got_a, got_b = jax.vmap(
        lambda a, b, c_, d_, e_, f_: ap.solve_two_stage_pallas(
            a, b, c_, d_, 0.25, e_, f_, 0.7)
    )(ca, la, ra, co, cb, rb)
    for i in range(s):
        ref_a, ref_b = lax_two_stage(ca[i], la[i], ra[i], co[i], 0.25,
                                     cb[i], rb[i], 0.7)
        np.testing.assert_array_equal(ref_a, np.asarray(got_a[i]))
        np.testing.assert_array_equal(ref_b, np.asarray(got_b[i]))
