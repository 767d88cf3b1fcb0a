"""Numpy oracle for the two NMS variants in the reference.

Contracts:
- SURVEY.md Appendix D: YOLO-side class-aware greedy NMS with **weighted box
  merging** (reference: yolo3/utils/utils.py:~250-300).
- SURVEY.md section 2.3 "ROI NMS": Malisiewicz-style class-agnostic keep-only
  NMS used on the DeepSORT side (reference: deep_sort/sort/preprocessing.py:~1-75);
  a no-op at the default ``nms_max_overlap=1.0``.
"""

from __future__ import annotations

from typing import List

import numpy as np


def xywh2xyxy(x: np.ndarray) -> np.ndarray:
    """(cx, cy, w, h) -> (x1, y1, x2, y2). utils.py:~55."""
    y = np.copy(x)
    y[..., 0] = x[..., 0] - x[..., 2] / 2
    y[..., 1] = x[..., 1] - x[..., 3] / 2
    y[..., 2] = x[..., 0] + x[..., 2] / 2
    y[..., 3] = x[..., 1] + x[..., 3] / 2
    return y


def bbox_iou_xyxy(box1: np.ndarray, box2: np.ndarray, eps: float = 1e-16) -> np.ndarray:
    """IoU of one box (4,) against many (N, 4), corner format. utils.py:~220."""
    b1_x1, b1_y1, b1_x2, b1_y2 = box1
    b2_x1, b2_y1, b2_x2, b2_y2 = box2[:, 0], box2[:, 1], box2[:, 2], box2[:, 3]

    inter_x1 = np.maximum(b1_x1, b2_x1)
    inter_y1 = np.maximum(b1_y1, b2_y1)
    inter_x2 = np.minimum(b1_x2, b2_x2)
    inter_y2 = np.minimum(b1_y2, b2_y2)

    inter = np.clip(inter_x2 - inter_x1, 0, None) * np.clip(inter_y2 - inter_y1, 0, None)
    area1 = (b1_x2 - b1_x1) * (b1_y2 - b1_y1)
    area2 = (b2_x2 - b2_x1) * (b2_y2 - b2_y1)
    return inter / (area1 + area2 - inter + eps)


def non_max_suppression(
    prediction: np.ndarray,
    conf_thres: float = 0.5,
    nms_thres: float = 0.4,
) -> List[np.ndarray | None]:
    """Class-aware greedy NMS with weighted-box merging. utils.py:~250-300.

    Args:
      prediction: (batch, num_boxes, 5 + num_classes) raw YOLO output,
        boxes in (cx, cy, w, h) pixels, col 4 = objectness, cols 5.. = class conf.

    Returns a list (length batch); each entry is None (no detections) or an
    array (K, 7) of rows (x1, y1, x2, y2, obj_conf, cls_conf, cls_pred).

    Semantics (the parity traps):
      * keep rows with objectness >= conf_thres
      * sort by score = obj_conf * max(class conf), descending
      * greedy: take the top row; rows with IoU > nms_thres AND same predicted
        class (including the top row itself) are merged: the emitted box is the
        objectness-weighted average of their coordinates; conf/class columns
        come from the top row. All merged rows are removed.
    """
    prediction = np.asarray(prediction, dtype=np.float64)
    output: List[np.ndarray | None] = [None for _ in range(len(prediction))]
    for image_i, image_pred in enumerate(prediction):
        image_pred = image_pred[image_pred[:, 4] >= conf_thres]
        if not image_pred.shape[0]:
            continue
        boxes_xyxy = xywh2xyxy(image_pred[:, :4])
        score = image_pred[:, 4] * image_pred[:, 5:].max(axis=1)
        # Stable sort: ties keep original (box-index) order, matching
        # torch.argsort's behavior on the reference's contiguous ranges closely
        # enough for parity tests (exact tie order is unspecified upstream).
        order = np.argsort(-score, kind="stable")
        image_pred = image_pred[order]
        boxes_xyxy = boxes_xyxy[order]
        class_confs = image_pred[:, 5:].max(axis=1, keepdims=True)
        class_preds = image_pred[:, 5:].argmax(axis=1)[:, None].astype(np.float64)
        detections = np.concatenate(
            [boxes_xyxy, image_pred[:, 4:5], class_confs, class_preds], axis=1
        )

        keep_boxes = []
        while detections.shape[0]:
            large_overlap = (
                bbox_iou_xyxy(detections[0, :4], detections[:, :4]) > nms_thres
            )
            label_match = detections[0, 6] == detections[:, 6]
            invalid = large_overlap & label_match
            weights = detections[invalid, 4:5]
            merged = detections[0].copy()
            merged[:4] = (weights * detections[invalid, :4]).sum(axis=0) / weights.sum()
            keep_boxes.append(merged)
            detections = detections[~invalid]
        if keep_boxes:
            output[image_i] = np.stack(keep_boxes)
    return output


def roi_non_max_suppression(
    boxes_tlwh: np.ndarray, max_bbox_overlap: float, scores: np.ndarray | None = None
) -> List[int]:
    """Malisiewicz NMS returning kept indices (preprocessing.py:~10-70).

    boxes are (top-left x, top-left y, w, h). Overlap is intersection over the
    *candidate* box area (not IoU), matching the reference. Called by DeepSort
    with max_bbox_overlap = nms_max_overlap = 1.0 => passthrough.
    """
    if len(boxes_tlwh) == 0:
        return []

    boxes = np.asarray(boxes_tlwh, dtype=np.float64)
    x1 = boxes[:, 0]
    y1 = boxes[:, 1]
    x2 = boxes[:, 2] + boxes[:, 0]
    y2 = boxes[:, 3] + boxes[:, 1]

    area = (x2 - x1 + 1) * (y2 - y1 + 1)
    if scores is not None:
        idxs = np.argsort(scores)
    else:
        idxs = np.argsort(y2)

    pick = []
    idxs = list(idxs)
    while len(idxs) > 0:
        last = len(idxs) - 1
        i = idxs[last]
        pick.append(int(i))

        rest = np.array(idxs[:last], dtype=int)
        xx1 = np.maximum(x1[i], x1[rest])
        yy1 = np.maximum(y1[i], y1[rest])
        xx2 = np.minimum(x2[i], x2[rest])
        yy2 = np.minimum(y2[i], y2[rest])

        w = np.maximum(0, xx2 - xx1 + 1)
        h = np.maximum(0, yy2 - yy1 + 1)
        overlap = (w * h) / area[rest]

        remove = set(np.where(overlap > max_bbox_overlap)[0].tolist()) | {last}
        idxs = [idxs[j] for j in range(len(idxs)) if j not in remove]
    return pick
