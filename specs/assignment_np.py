"""Numpy/scipy oracle for DeepSORT's assignment machinery.

Contract: SURVEY.md Appendix B (reference: deep_sort/sort/linear_assignment.py:~1-190).

Operates on plain arrays + index lists so it can be driven both by the full
tracker oracle (specs/tracker_np.py) and directly by unit tests.
"""

from __future__ import annotations

from typing import Callable, List, Sequence, Tuple

import numpy as np
from scipy.optimize import linear_sum_assignment

from .kalman_np import KalmanFilterNp, chi2inv95

INFTY_COST = 1e5

# distance_metric(tracks, detections, track_indices, detection_indices)
#   -> cost matrix of shape (len(track_indices), len(detection_indices))
DistanceMetric = Callable[[list, list, Sequence[int], Sequence[int]], np.ndarray]


def min_cost_matching(
    distance_metric: DistanceMetric,
    max_distance: float,
    tracks: list,
    detections: list,
    track_indices: Sequence[int] | None = None,
    detection_indices: Sequence[int] | None = None,
) -> Tuple[List[Tuple[int, int]], List[int], List[int]]:
    """Hungarian matching with cost clamp + post-filter (linear_assignment.py:~25-80).

    Costs above ``max_distance`` are clamped to ``max_distance + 1e-5`` before
    the solve; pairs whose original cost exceeds ``max_distance`` are dropped
    from the result.
    """
    if track_indices is None:
        track_indices = np.arange(len(tracks))
    if detection_indices is None:
        detection_indices = np.arange(len(detections))

    if len(detection_indices) == 0 or len(track_indices) == 0:
        return [], list(track_indices), list(detection_indices)

    cost_matrix = distance_metric(tracks, detections, track_indices, detection_indices)
    cost_matrix[cost_matrix > max_distance] = max_distance + 1e-5

    row_indices, col_indices = linear_sum_assignment(cost_matrix)

    matches, unmatched_tracks, unmatched_detections = [], [], []
    for col, detection_idx in enumerate(detection_indices):
        if col not in col_indices:
            unmatched_detections.append(detection_idx)
    for row, track_idx in enumerate(track_indices):
        if row not in row_indices:
            unmatched_tracks.append(track_idx)
    for row, col in zip(row_indices, col_indices):
        track_idx = track_indices[row]
        detection_idx = detection_indices[col]
        if cost_matrix[row, col] > max_distance:
            unmatched_tracks.append(track_idx)
            unmatched_detections.append(detection_idx)
        else:
            matches.append((track_idx, detection_idx))
    return matches, unmatched_tracks, unmatched_detections


def matching_cascade(
    distance_metric: DistanceMetric,
    max_distance: float,
    cascade_depth: int,
    tracks: list,
    detections: list,
    track_indices: Sequence[int] | None = None,
    detection_indices: Sequence[int] | None = None,
) -> Tuple[List[Tuple[int, int]], List[int], List[int]]:
    """Age-prioritized matching cascade (linear_assignment.py:~85-140).

    Level ``L`` (0-based) matches only tracks with ``time_since_update == 1 + L``
    against the detections left unmatched by earlier levels.
    """
    if track_indices is None:
        track_indices = list(range(len(tracks)))
    if detection_indices is None:
        detection_indices = list(range(len(detections)))

    unmatched_detections = list(detection_indices)
    matches = []
    for level in range(cascade_depth):
        if len(unmatched_detections) == 0:
            break
        track_indices_l = [
            k for k in track_indices if tracks[k].time_since_update == 1 + level
        ]
        if len(track_indices_l) == 0:
            continue
        matches_l, _, unmatched_detections = min_cost_matching(
            distance_metric,
            max_distance,
            tracks,
            detections,
            track_indices_l,
            unmatched_detections,
        )
        matches += matches_l
    unmatched_tracks = list(set(track_indices) - set(k for k, _ in matches))
    return matches, unmatched_tracks, unmatched_detections


def gate_cost_matrix(
    kf: KalmanFilterNp,
    cost_matrix: np.ndarray,
    tracks: list,
    detections: list,
    track_indices: Sequence[int],
    detection_indices: Sequence[int],
    gated_cost: float = INFTY_COST,
    only_position: bool = False,
) -> np.ndarray:
    """Invalidate entries whose Mahalanobis distance exceeds the chi2 gate
    (linear_assignment.py:~145-190). 4-dof gate = 9.4877."""
    gating_dim = 2 if only_position else 4
    gating_threshold = chi2inv95[gating_dim]
    measurements = np.asarray([detections[i].to_xyah() for i in detection_indices])
    for row, track_idx in enumerate(track_indices):
        track = tracks[track_idx]
        gating_distance = kf.gating_distance(
            track.mean, track.covariance, measurements, only_position
        )
        cost_matrix[row, gating_distance > gating_threshold] = gated_cost
    return cost_matrix
