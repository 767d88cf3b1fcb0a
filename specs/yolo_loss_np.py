"""Numpy oracle for the YOLO training loss.

Contract: SURVEY.md Appendix C (training branch) (reference: yolo3/models.py
YOLOLayer forward training path + yolo3/utils/utils.py build_targets:~300).

Targets are (N, 6) rows [batch_idx, class, cx, cy, w, h] with box coords
normalized to [0, 1] (Appendix G "train labels").
"""

from __future__ import annotations

from typing import Sequence, Tuple

import numpy as np

OBJ_SCALE = 1.0
NOOBJ_SCALE = 100.0


def bbox_wh_iou(wh1: np.ndarray, wh2: np.ndarray) -> np.ndarray:
    """IoU of width-height pairs assuming shared centers. utils.py:~235."""
    w1, h1 = wh1[0], wh1[1]
    w2, h2 = wh2[..., 0], wh2[..., 1]
    inter = np.minimum(w1, w2) * np.minimum(h1, h2)
    union = w1 * h1 + w2 * h2 - inter
    return inter / (union + 1e-16)


def bbox_iou_xywh(box1: np.ndarray, box2: np.ndarray) -> np.ndarray:
    """IoU of center-format boxes (elementwise over rows). utils.py bbox_iou
    with x1y1x2y2=False."""
    b1x1, b1x2 = box1[..., 0] - box1[..., 2] / 2, box1[..., 0] + box1[..., 2] / 2
    b1y1, b1y2 = box1[..., 1] - box1[..., 3] / 2, box1[..., 1] + box1[..., 3] / 2
    b2x1, b2x2 = box2[..., 0] - box2[..., 2] / 2, box2[..., 0] + box2[..., 2] / 2
    b2y1, b2y2 = box2[..., 1] - box2[..., 3] / 2, box2[..., 1] + box2[..., 3] / 2
    ix1 = np.maximum(b1x1, b2x1)
    iy1 = np.maximum(b1y1, b2y1)
    ix2 = np.minimum(b1x2, b2x2)
    iy2 = np.minimum(b1y2, b2y2)
    inter = np.clip(ix2 - ix1 + 1, 0, None) * np.clip(iy2 - iy1 + 1, 0, None)
    a1 = (b1x2 - b1x1 + 1) * (b1y2 - b1y1 + 1)
    a2 = (b2x2 - b2x1 + 1) * (b2y2 - b2y1 + 1)
    return inter / (a1 + a2 - inter + 1e-16)


def build_targets(
    pred_boxes: np.ndarray,  # (B, A, G, G, 4) decoded boxes in GRID units
    pred_cls: np.ndarray,  # (B, A, G, G, C) sigmoided
    target: np.ndarray,  # (N, 6) [b, cls, cx, cy, w, h] normalized
    anchors: np.ndarray,  # (A, 2) in GRID units (scaled_anchors)
    ignore_thres: float,
):
    nB, nA, nG = pred_boxes.shape[0], pred_boxes.shape[1], pred_boxes.shape[2]
    nC = pred_cls.shape[-1]

    obj_mask = np.zeros((nB, nA, nG, nG), bool)
    noobj_mask = np.ones((nB, nA, nG, nG), bool)
    class_mask = np.zeros((nB, nA, nG, nG), np.float64)
    iou_scores = np.zeros((nB, nA, nG, nG), np.float64)
    tx = np.zeros((nB, nA, nG, nG), np.float64)
    ty = np.zeros((nB, nA, nG, nG), np.float64)
    tw = np.zeros((nB, nA, nG, nG), np.float64)
    th = np.zeros((nB, nA, nG, nG), np.float64)
    tcls = np.zeros((nB, nA, nG, nG, nC), np.float64)

    if len(target):
        target_boxes = target[:, 2:6] * nG
        gxy = target_boxes[:, :2]
        gwh = target_boxes[:, 2:]
        ious = np.stack([bbox_wh_iou(a, gwh) for a in anchors])  # (A, N)
        best_n = ious.argmax(0)  # (N,)
        b = target[:, 0].astype(int)
        labels = target[:, 1].astype(int)
        gx, gy = gxy[:, 0], gxy[:, 1]
        gw, gh = gwh[:, 0], gwh[:, 1]
        gi = np.clip(gx.astype(int), 0, nG - 1)
        gj = np.clip(gy.astype(int), 0, nG - 1)

        obj_mask[b, best_n, gj, gi] = True
        noobj_mask[b, best_n, gj, gi] = False
        # ignore high-IoU non-best anchors for the no-obj loss
        for i in range(len(target)):
            over = ious[:, i] > ignore_thres
            noobj_mask[b[i], over, gj[i], gi[i]] = False

        tx[b, best_n, gj, gi] = gx - np.floor(gx)
        ty[b, best_n, gj, gi] = gy - np.floor(gy)
        tw[b, best_n, gj, gi] = np.log(gw / anchors[best_n, 0] + 1e-16)
        th[b, best_n, gj, gi] = np.log(gh / anchors[best_n, 1] + 1e-16)
        tcls[b, best_n, gj, gi, labels] = 1.0

        class_mask[b, best_n, gj, gi] = (
            pred_cls[b, best_n, gj, gi].argmax(-1) == labels
        ).astype(np.float64)
        iou_scores[b, best_n, gj, gi] = bbox_iou_xywh(
            pred_boxes[b, best_n, gj, gi], target_boxes
        )

    tconf = obj_mask.astype(np.float64)
    return (
        iou_scores, class_mask, obj_mask, noobj_mask,
        tx, ty, tw, th, tcls, tconf,
    )


def _bce(pred, tgt, eps=1e-12):
    pred = np.clip(pred, eps, 1 - eps)
    return -(tgt * np.log(pred) + (1 - tgt) * np.log(1 - pred))


def yolo_head_loss(
    raw: np.ndarray,  # (B, A*(5+C), G, G) raw conv output of one head
    target: np.ndarray,  # (N, 6) normalized
    anchors_px: Sequence[Tuple[float, float]],  # mask-selected, pixels
    num_classes: int,
    img_dim: int,
    ignore_thres: float = 0.5,
) -> Tuple[float, dict]:
    """Loss of one YOLO head (models.py YOLOLayer training branch):
    MSE(x,y,w,h | obj) + BCE(conf; obj*1 + noobj*100) + BCE(cls | obj)."""
    nB, ch, g, _ = raw.shape
    nA = len(anchors_px)
    nC = num_classes
    stride = img_dim / g
    pred = raw.reshape(nB, nA, 5 + nC, g, g).transpose(0, 1, 3, 4, 2)

    def sigmoid(v):
        return 1.0 / (1.0 + np.exp(-v))

    x = sigmoid(pred[..., 0])
    y = sigmoid(pred[..., 1])
    w = pred[..., 2]
    h = pred[..., 3]
    conf = sigmoid(pred[..., 4])
    cls = sigmoid(pred[..., 5:])

    anchors_g = np.asarray(anchors_px, np.float64) / stride
    grid_y, grid_x = np.meshgrid(np.arange(g), np.arange(g), indexing="ij")
    pred_boxes = np.stack(
        [
            x + grid_x[None, None],
            y + grid_y[None, None],
            np.exp(w) * anchors_g[None, :, 0, None, None],
            np.exp(h) * anchors_g[None, :, 1, None, None],
        ],
        axis=-1,
    )

    (iou_scores, class_mask, obj_mask, noobj_mask,
     tx, ty, tw, th, tcls, tconf) = build_targets(
        pred_boxes, cls, target, anchors_g, ignore_thres
    )

    if obj_mask.any():
        loss_x = np.mean((x[obj_mask] - tx[obj_mask]) ** 2)
        loss_y = np.mean((y[obj_mask] - ty[obj_mask]) ** 2)
        loss_w = np.mean((w[obj_mask] - tw[obj_mask]) ** 2)
        loss_h = np.mean((h[obj_mask] - th[obj_mask]) ** 2)
        loss_conf_obj = np.mean(_bce(conf[obj_mask], tconf[obj_mask]))
        loss_cls = np.mean(_bce(cls[obj_mask], tcls[obj_mask]))
    else:
        loss_x = loss_y = loss_w = loss_h = loss_conf_obj = loss_cls = 0.0
    loss_conf_noobj = np.mean(_bce(conf[noobj_mask], tconf[noobj_mask]))
    loss_conf = OBJ_SCALE * loss_conf_obj + NOOBJ_SCALE * loss_conf_noobj
    total = loss_x + loss_y + loss_w + loss_h + loss_conf + loss_cls
    metrics = {
        "loss_x": loss_x, "loss_y": loss_y, "loss_w": loss_w, "loss_h": loss_h,
        "loss_conf": loss_conf, "loss_cls": loss_cls,
        "cls_acc": float(class_mask[obj_mask].mean()) if obj_mask.any() else 0.0,
    }
    return float(total), metrics
