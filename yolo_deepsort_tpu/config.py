"""Static configuration dataclasses.

The reference spreads configuration over darknet ``[net]`` sections, class
name files, and constructor kwargs (SURVEY.md section 5.6). Here everything
runtime-static is a frozen dataclass, hashable so it can close over jitted
functions.
"""

from __future__ import annotations

import dataclasses


@dataclasses.dataclass(frozen=True)
class TrackerConfig:
    """DeepSORT tracker parameters.

    Defaults mirror the reference facade's constructor
    (deep_sort/deep_sort.py:~15: max_dist=0.2, min_confidence=0.3,
    nms_max_overlap=1.0, max_iou_distance=0.7, max_age=70, n_init=3,
    nn_budget=100). The fixed-shape capacities (max_tracks / max_dets) are
    TPU additions: the reference's unbounded Python lists become masked
    arrays.
    """

    max_tracks: int = 128
    max_dets: int = 64
    feat_dim: int = 512
    nn_budget: int = 100
    max_dist: float = 0.2
    min_confidence: float = 0.3
    nms_max_overlap: float = 1.0
    max_iou_distance: float = 0.7
    max_age: int = 70
    n_init: int = 3


@dataclasses.dataclass(frozen=True)
class DetectorConfig:
    """Detection-side knobs (yolo3/detect wrappers + NMS defaults,
    utils.py:~250 signature)."""

    img_size: int = 416
    conf_thres: float = 0.5
    nms_thres: float = 0.4
    max_boxes: int = 512   # top-K candidates entering batched NMS
    max_dets: int = 64     # NMS output capacity
    half: bool = False     # bf16 inference (reference: fp16 `half` flag)
