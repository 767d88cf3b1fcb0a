"""Numpy oracle for the YOLO detection-head decode.

Contract: SURVEY.md Appendix C (reference: yolo3/models.py YOLOLayer:~120-250).

Given the raw conv feature map of a YOLO head, produce decoded boxes in
input-image pixels (center format) with sigmoided objectness / class scores.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import numpy as np


def sigmoid(x: np.ndarray) -> np.ndarray:
    return 1.0 / (1.0 + np.exp(-x))


def yolo_decode(
    raw: np.ndarray,
    anchors: Sequence[Tuple[float, float]],
    num_classes: int,
    img_dim: int,
    scale_x_y: float = 1.0,
) -> np.ndarray:
    """Decode one YOLO head.

    Args:
      raw: (N, A*(5+C), G, G) raw conv output (darknet channel layout: for each
        anchor a contiguous block of 5+C channels [tx, ty, tw, th, to, c...]).
      anchors: A (pw, ph) pairs in input-image pixels (already mask-selected).
      num_classes: C.
      img_dim: network input size S (stride = S / G).

    Returns:
      (N, A*G*G, 5+C): (cx, cy, w, h) in input-image pixels, sigmoided
      objectness and per-class scores. Box-axis ordering is anchor-major then
      row-major over the grid (matches the reference's
      ``view(N, A, 5+C, G, G).permute(0,1,3,4,2)`` then flatten).
    """
    raw = np.asarray(raw, dtype=np.float64)
    n, ch, g, g2 = raw.shape
    assert g == g2, "square grids only"
    a = len(anchors)
    c = num_classes
    assert ch == a * (5 + c), (ch, a, c)
    stride = img_dim / g

    pred = raw.reshape(n, a, 5 + c, g, g).transpose(0, 1, 3, 4, 2)  # (N,A,G,G,5+C)

    grid_y, grid_x = np.meshgrid(np.arange(g), np.arange(g), indexing="ij")
    anchors_arr = np.asarray(anchors, dtype=np.float64)  # (A, 2), pixels
    scaled_anchors = anchors_arr / stride  # grid units

    # YOLOv4 center scaling: bx = s*sigma(tx) - (s-1)/2 + cx (s=1 -> v3)
    x = sigmoid(pred[..., 0]) * scale_x_y - 0.5 * (scale_x_y - 1.0)
    y = sigmoid(pred[..., 1]) * scale_x_y - 0.5 * (scale_x_y - 1.0)
    w = pred[..., 2]
    h = pred[..., 3]
    conf = sigmoid(pred[..., 4])
    cls = sigmoid(pred[..., 5:])

    bx = x + grid_x[None, None]
    by = y + grid_y[None, None]
    bw = np.exp(w) * scaled_anchors[None, :, 0, None, None]
    bh = np.exp(h) * scaled_anchors[None, :, 1, None, None]

    boxes = np.stack([bx, by, bw, bh], axis=-1) * stride  # input-image pixels
    out = np.concatenate([boxes, conf[..., None], cls], axis=-1)
    return out.reshape(n, a * g * g, 5 + c)


# Canonical anchor sets (from the stock darknet cfgs; SURVEY.md Appendix C/E.2).
YOLOV3_ANCHORS = [
    (10, 13), (16, 30), (33, 23),
    (30, 61), (62, 45), (59, 119),
    (116, 90), (156, 198), (373, 326),
]
YOLOV3_MASKS = [(6, 7, 8), (3, 4, 5), (0, 1, 2)]  # strides 32, 16, 8 head order

YOLOV3_TINY_ANCHORS = [
    (10, 14), (23, 27), (37, 58),
    (81, 82), (135, 169), (344, 319),
]
YOLOV3_TINY_MASKS = [(3, 4, 5), (1, 2, 3)]

YOLOV4_ANCHORS = [
    (12, 16), (19, 36), (40, 28),
    (36, 75), (76, 55), (72, 146),
    (142, 110), (192, 243), (459, 401),
]
YOLOV4_MASKS = [(0, 1, 2), (3, 4, 5), (6, 7, 8)]  # strides 8, 16, 32 head order
