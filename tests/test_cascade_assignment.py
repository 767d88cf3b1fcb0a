"""solve_cascade_assignment (single JV pass with level freezing) vs the
oracle's level-by-level matching_cascade (specs/assignment_np.py)."""

import numpy as np
import pytest

from specs.assignment_np import matching_cascade
from yolo_deepsort_tpu.ops.assignment import solve_cascade_assignment


class FakeTrack:
    def __init__(self, tsu):
        self.time_since_update = tsu


def oracle_cascade(cost, tsu, max_distance, cascade_depth):
    """Run the oracle cascade on a fixed cost matrix."""
    tracks = [FakeTrack(t) for t in tsu]
    detections = list(range(cost.shape[1]))

    def metric(tracks_, dets_, track_indices, detection_indices):
        return cost[np.ix_(track_indices, detection_indices)].astype(np.float64)

    matches, _, _ = matching_cascade(
        metric, max_distance, cascade_depth, tracks, detections
    )
    return dict(matches)


def run_jax(cost, tsu, row_mask, col_mask, max_distance):
    levels = np.asarray(tsu, np.int32) - 1
    out = np.asarray(
        solve_cascade_assignment(
            cost.astype(np.float32), levels, row_mask, col_mask, max_distance
        )
    )
    return {i: int(out[i]) for i in range(len(out)) if out[i] >= 0}


@pytest.mark.parametrize("seed", range(10))
def test_cascade_matches_oracle_random(seed):
    rng = np.random.default_rng(seed)
    r, c = 14, 10
    cost = rng.uniform(0, 0.4, (r, c)).astype(np.float32)
    tsu = rng.integers(1, 6, r)  # levels 0..4
    maxd = 0.2
    expected = oracle_cascade(cost.astype(np.float64), tsu, maxd, 70)
    got = run_jax(cost, tsu, np.ones(r, bool), np.ones(c, bool), maxd)
    assert got == expected, f"\ntsu={tsu}\nexp={expected}\ngot={got}"


@pytest.mark.parametrize("seed", range(5))
def test_cascade_with_gates_and_masks(seed):
    rng = np.random.default_rng(100 + seed)
    r, c = 20, 12
    cost = rng.uniform(0, 0.4, (r, c)).astype(np.float32)
    cost[rng.uniform(size=(r, c)) < 0.3] = 1e5  # Mahalanobis INFTY gates
    tsu = rng.integers(1, 8, r)
    row_mask = rng.uniform(size=r) < 0.8
    col_mask = rng.uniform(size=c) < 0.8
    maxd = 0.2
    sub_expected = oracle_cascade(
        np.where(
            row_mask[:, None] & col_mask[None, :], cost.astype(np.float64), 1e5
        ),
        tsu,
        maxd,
        70,
    )
    # entries forced to 1e5 can never match; oracle agrees
    got = run_jax(cost, tsu, row_mask, col_mask, maxd)
    assert got == sub_expected


def test_level_priority_beats_cost():
    # a fresh (level 0) track takes the det even though an older track is
    # cheaper -- the cascade's whole point
    cost = np.array([[0.15], [0.05]], np.float32)
    tsu = np.array([1, 2])  # row 0 at level 0, row 1 at level 1
    got = run_jax(cost, tsu, np.ones(2, bool), np.ones(1, bool), 0.2)
    assert got == {0: 0}


def test_same_level_solved_jointly():
    # both rows level 0: joint optimum is the cross assignment
    cost = np.array([[0.10, 0.11], [0.02, 0.10]], np.float32)
    tsu = np.array([1, 1])
    got = run_jax(cost, tsu, np.ones(2, bool), np.ones(2, bool), 0.2)
    # joint optimum: row0->col1 (0.11) + row1->col0 (0.02) = 0.13
    # vs greedy row1->col0... scipy optimum:
    assert got == {0: 1, 1: 0}


def test_deep_cascade_level():
    # a track missed 69 frames can still match if nothing fresher wants the det
    cost = np.array([[0.1]], np.float32)
    tsu = np.array([70])
    got = run_jax(cost, tsu, np.ones(1, bool), np.ones(1, bool), 0.2)
    assert got == {0: 0}
