"""Full DeepSORT tracker oracle in numpy.

Contracts: SURVEY.md section 2.3 + section 3.3 + Appendices A/B (reference:
deep_sort/sort/{detection,track,tracker,nn_matching,iou_matching}.py and the
deep_sort/deep_sort.py facade, minus the ReID CNN -- features are passed in).

This is the golden model the vectorized JAX tracker
(yolo_deepsort_tpu/tracking/tracker.py) is tested against frame-by-frame.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import numpy as np

from .assignment_np import (
    INFTY_COST,
    gate_cost_matrix,
    matching_cascade,
    min_cost_matching,
)
from .kalman_np import KalmanFilterNp


class Detection:
    """Value type (tlwh, confidence, feature). sort/detection.py:~1-50."""

    def __init__(self, tlwh, confidence, feature):
        self.tlwh = np.asarray(tlwh, dtype=np.float64)
        self.confidence = float(confidence)
        self.feature = np.asarray(feature, dtype=np.float64)

    def to_tlbr(self):
        ret = self.tlwh.copy()
        ret[2:] += ret[:2]
        return ret

    def to_xyah(self):
        """(center x, center y, aspect = w/h, height)."""
        ret = self.tlwh.copy()
        ret[:2] += ret[2:] / 2
        ret[2] /= ret[3]
        return ret


class TrackState:
    Tentative = 1
    Confirmed = 2
    Deleted = 3


class Track:
    """sort/track.py:~1-170."""

    def __init__(self, mean, covariance, track_id, n_init, max_age, feature=None):
        self.mean = mean
        self.covariance = covariance
        self.track_id = track_id
        self.hits = 1
        self.age = 1
        self.time_since_update = 0

        self.state = TrackState.Tentative
        self.features: List[np.ndarray] = []
        if feature is not None:
            self.features.append(feature)

        self._n_init = n_init
        self._max_age = max_age

    def to_tlwh(self):
        ret = self.mean[:4].copy()
        ret[2] *= ret[3]
        ret[:2] -= ret[2:] / 2
        return ret

    def to_tlbr(self):
        ret = self.to_tlwh()
        ret[2:] = ret[:2] + ret[2:]
        return ret

    def predict(self, kf: KalmanFilterNp):
        self.mean, self.covariance = kf.predict(self.mean, self.covariance)
        self.age += 1
        self.time_since_update += 1

    def update(self, kf: KalmanFilterNp, detection: Detection):
        self.mean, self.covariance = kf.update(
            self.mean, self.covariance, detection.to_xyah()
        )
        self.features.append(detection.feature)

        self.hits += 1
        self.time_since_update = 0
        if self.state == TrackState.Tentative and self.hits >= self._n_init:
            self.state = TrackState.Confirmed

    def mark_missed(self):
        if self.state == TrackState.Tentative:
            self.state = TrackState.Deleted
        elif self.time_since_update > self._max_age:
            self.state = TrackState.Deleted

    def is_tentative(self):
        return self.state == TrackState.Tentative

    def is_confirmed(self):
        return self.state == TrackState.Confirmed

    def is_deleted(self):
        return self.state == TrackState.Deleted


def _cosine_distance(x, y, data_is_normalized=False):
    """1 - cosine similarity matrix. nn_matching.py:~20-45."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    if not data_is_normalized:
        x = x / np.linalg.norm(x, axis=1, keepdims=True)
        y = y / np.linalg.norm(y, axis=1, keepdims=True)
    return 1.0 - x @ y.T


def _nn_cosine_distance(x, y):
    return _cosine_distance(x, y).min(axis=0)


def _pdist(a, b):
    a, b = np.asarray(a, dtype=np.float64), np.asarray(b, dtype=np.float64)
    if len(a) == 0 or len(b) == 0:
        return np.zeros((len(a), len(b)))
    a2, b2 = np.square(a).sum(axis=1), np.square(b).sum(axis=1)
    r2 = -2.0 * a @ b.T + a2[:, None] + b2[None, :]
    return np.clip(r2, 0.0, None)


def _nn_euclidean_distance(x, y):
    return np.maximum(0.0, _pdist(x, y).min(axis=0))


class NearestNeighborDistanceMetric:
    """Per-track feature gallery + min-distance query. nn_matching.py:~60-180."""

    def __init__(self, metric: str, matching_threshold: float, budget: Optional[int] = None):
        if metric == "euclidean":
            self._metric = _nn_euclidean_distance
        elif metric == "cosine":
            self._metric = _nn_cosine_distance
        else:
            raise ValueError("Invalid metric; must be either 'euclidean' or 'cosine'")
        self.matching_threshold = matching_threshold
        self.budget = budget
        self.samples: Dict[int, List[np.ndarray]] = {}

    def partial_fit(self, features, targets, active_targets):
        for feature, target in zip(features, targets):
            self.samples.setdefault(target, []).append(feature)
            if self.budget is not None:
                self.samples[target] = self.samples[target][-self.budget:]
        self.samples = {k: self.samples[k] for k in active_targets}

    def distance(self, features, targets):
        cost_matrix = np.zeros((len(targets), len(features)))
        for i, target in enumerate(targets):
            cost_matrix[i, :] = self._metric(self.samples[target], features)
        return cost_matrix


def iou(bbox: np.ndarray, candidates: np.ndarray) -> np.ndarray:
    """tlwh IoU of one box against many. sort/iou_matching.py:~10-45."""
    bbox_tl, bbox_br = bbox[:2], bbox[:2] + bbox[2:]
    candidates_tl = candidates[:, :2]
    candidates_br = candidates[:, :2] + candidates[:, 2:]

    tl = np.c_[
        np.maximum(bbox_tl[0], candidates_tl[:, 0])[:, None],
        np.maximum(bbox_tl[1], candidates_tl[:, 1])[:, None],
    ]
    br = np.c_[
        np.minimum(bbox_br[0], candidates_br[:, 0])[:, None],
        np.minimum(bbox_br[1], candidates_br[:, 1])[:, None],
    ]
    wh = np.maximum(0.0, br - tl)

    area_intersection = wh.prod(axis=1)
    area_bbox = bbox[2:].prod()
    area_candidates = candidates[:, 2:].prod(axis=1)
    return area_intersection / (area_bbox + area_candidates - area_intersection)


def iou_cost(tracks, detections, track_indices=None, detection_indices=None):
    """1 - IoU cost; stale tracks (tsu > 1) forced to INFTY. iou_matching.py:~50-80."""
    if track_indices is None:
        track_indices = np.arange(len(tracks))
    if detection_indices is None:
        detection_indices = np.arange(len(detections))

    cost_matrix = np.zeros((len(track_indices), len(detection_indices)))
    for row, track_idx in enumerate(track_indices):
        if tracks[track_idx].time_since_update > 1:
            cost_matrix[row, :] = INFTY_COST
            continue
        bbox = tracks[track_idx].to_tlwh()
        candidates = np.asarray(
            [detections[i].tlwh for i in detection_indices], dtype=np.float64
        )
        cost_matrix[row, :] = 1.0 - iou(bbox, candidates)
    return cost_matrix


class Tracker:
    """sort/tracker.py:~1-140."""

    def __init__(
        self,
        metric: NearestNeighborDistanceMetric,
        max_iou_distance: float = 0.7,
        max_age: int = 70,
        n_init: int = 3,
    ):
        self.metric = metric
        self.max_iou_distance = max_iou_distance
        self.max_age = max_age
        self.n_init = n_init

        self.kf = KalmanFilterNp()
        self.tracks: List[Track] = []
        self._next_id = 1

    def predict(self):
        for track in self.tracks:
            track.predict(self.kf)

    def update(self, detections: Sequence[Detection]):
        matches, unmatched_tracks, unmatched_detections = self._match(detections)

        for track_idx, detection_idx in matches:
            self.tracks[track_idx].update(self.kf, detections[detection_idx])
        for track_idx in unmatched_tracks:
            self.tracks[track_idx].mark_missed()
        for detection_idx in unmatched_detections:
            self._initiate_track(detections[detection_idx])
        self.tracks = [t for t in self.tracks if not t.is_deleted()]

        # Update the distance metric's gallery with features observed this frame.
        active_targets = [t.track_id for t in self.tracks if t.is_confirmed()]
        features, targets = [], []
        for track in self.tracks:
            if not track.is_confirmed():
                continue
            features += track.features
            targets += [track.track_id for _ in track.features]
            track.features = []
        self.metric.partial_fit(features, targets, active_targets)

    def _match(self, detections):
        def gated_metric(tracks, dets, track_indices, detection_indices):
            features = np.array([dets[i].feature for i in detection_indices])
            targets = np.array([tracks[i].track_id for i in track_indices])
            cost_matrix = self.metric.distance(features, targets)
            cost_matrix = gate_cost_matrix(
                self.kf, cost_matrix, tracks, dets, track_indices, detection_indices
            )
            return cost_matrix

        confirmed_tracks = [i for i, t in enumerate(self.tracks) if t.is_confirmed()]
        unconfirmed_tracks = [
            i for i, t in enumerate(self.tracks) if not t.is_confirmed()
        ]

        # Stage 1: appearance-based matching cascade over confirmed tracks.
        matches_a, unmatched_tracks_a, unmatched_detections = matching_cascade(
            gated_metric,
            self.metric.matching_threshold,
            self.max_age,
            self.tracks,
            detections,
            confirmed_tracks,
        )

        # Stage 2: IoU matching for unconfirmed + just-missed confirmed tracks.
        iou_track_candidates = unconfirmed_tracks + [
            k for k in unmatched_tracks_a if self.tracks[k].time_since_update == 1
        ]
        unmatched_tracks_a = [
            k for k in unmatched_tracks_a if self.tracks[k].time_since_update != 1
        ]
        matches_b, unmatched_tracks_b, unmatched_detections = min_cost_matching(
            iou_cost,
            self.max_iou_distance,
            self.tracks,
            detections,
            iou_track_candidates,
            unmatched_detections,
        )

        matches = matches_a + matches_b
        unmatched_tracks = list(set(unmatched_tracks_a + unmatched_tracks_b))
        return matches, unmatched_tracks, unmatched_detections

    def _initiate_track(self, detection: Detection):
        mean, covariance = self.kf.initiate(detection.to_xyah())
        self.tracks.append(
            Track(
                mean,
                covariance,
                self._next_id,
                self.n_init,
                self.max_age,
                detection.feature,
            )
        )
        self._next_id += 1


class DeepSortLogic:
    """DeepSort facade minus the CNN (deep_sort/deep_sort.py:~1-120).

    ``update`` takes pre-computed features so the oracle stays model-free.
    Input boxes are (cx, cy, w, h) pixels; output rows are int
    [x1, y1, x2, y2, track_id] for confirmed tracks with tsu <= 1.
    """

    def __init__(
        self,
        max_dist: float = 0.2,
        min_confidence: float = 0.3,
        nms_max_overlap: float = 1.0,
        max_iou_distance: float = 0.7,
        max_age: int = 70,
        n_init: int = 3,
        nn_budget: Optional[int] = 100,
    ):
        self.min_confidence = min_confidence
        self.nms_max_overlap = nms_max_overlap
        metric = NearestNeighborDistanceMetric("cosine", max_dist, nn_budget)
        self.tracker = Tracker(
            metric, max_iou_distance=max_iou_distance, max_age=max_age, n_init=n_init
        )
        self.height = 0
        self.width = 0

    @staticmethod
    def _xywh_to_tlwh(bbox_xywh: np.ndarray) -> np.ndarray:
        bbox_tlwh = np.array(bbox_xywh, dtype=np.float64, copy=True)
        bbox_tlwh[:, 0] = bbox_xywh[:, 0] - bbox_xywh[:, 2] / 2.0
        bbox_tlwh[:, 1] = bbox_xywh[:, 1] - bbox_xywh[:, 3] / 2.0
        return bbox_tlwh

    def _tlwh_to_xyxy(self, bbox_tlwh) -> tuple:
        x, y, w, h = bbox_tlwh
        x1 = max(int(x), 0)
        x2 = min(int(x + w), self.width - 1)
        y1 = max(int(y), 0)
        y2 = min(int(y + h), self.height - 1)
        return x1, y1, x2, y2

    def update(
        self,
        bbox_xywh: np.ndarray,
        confidences: Sequence[float],
        features: np.ndarray,
        img_shape: tuple,
    ) -> np.ndarray:
        """One association step. img_shape = (height, width)."""
        self.height, self.width = img_shape[:2]
        bbox_xywh = np.asarray(bbox_xywh, dtype=np.float64).reshape(-1, 4)
        features = np.asarray(features, dtype=np.float64)

        bbox_tlwh = self._xywh_to_tlwh(bbox_xywh)
        detections = [
            Detection(bbox_tlwh[i], conf, features[i])
            for i, conf in enumerate(confidences)
            if conf > self.min_confidence
        ]

        # ROI NMS (no-op at nms_max_overlap=1.0; kept for contract completeness).
        if self.nms_max_overlap < 1.0:
            from .nms_np import roi_non_max_suppression

            boxes = np.array([d.tlwh for d in detections])
            scores = np.array([d.confidence for d in detections])
            indices = roi_non_max_suppression(boxes, self.nms_max_overlap, scores)
            detections = [detections[i] for i in indices]

        self.tracker.predict()
        self.tracker.update(detections)

        outputs = []
        for track in self.tracker.tracks:
            if not track.is_confirmed() or track.time_since_update > 1:
                continue
            box = track.to_tlwh()
            x1, y1, x2, y2 = self._tlwh_to_xyxy(box)
            outputs.append(np.array([x1, y1, x2, y2, track.track_id], dtype=np.int64))
        if len(outputs) > 0:
            return np.stack(outputs, axis=0)
        return np.zeros((0, 5), dtype=np.int64)
