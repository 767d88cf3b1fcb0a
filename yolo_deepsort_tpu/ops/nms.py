"""Class-aware batched NMS with weighted-box merging, fully on-chip.

Contract: SURVEY.md Appendix D (reference: yolo3/utils/utils.py
non_max_suppression:~250-300). Oracle: specs/nms_np.py.

The reference runs a Python while-loop over GPU tensors per image -- many
tiny synced kernels (SURVEY.md section 3.1 calls this the perf cliff). Here:

  1. objectness filter + top-K (lax.top_k) selects MAX_BOXES candidates,
     sorted by score = obj * max_cls (top_k tie-breaking = lower index first,
     matching the reference's stable sort closely enough for parity),
  2. a fixed-iteration fori_loop emits up to MAX_DETS merged boxes: each step
     takes the best alive candidate, suppresses same-class overlaps, and
     emits the objectness-weighted average box (the parity trap: boxes are
     MERGED, not just kept) with the top candidate's conf/class columns.

Everything is masked fixed-shape; vmap over the batch axis.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from .boxes import iou_xyxy, xywh_to_xyxy


def _nms_single(
    pred: jnp.ndarray,  # (B, 5+C) raw rows for one image
    conf_thres: float,
    nms_thres: float,
    max_boxes: int,
    max_dets: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    num_classes = pred.shape[-1] - 5
    obj = pred[:, 4]
    cls_conf = jnp.max(pred[:, 5:], axis=1)
    cls_pred = jnp.argmax(pred[:, 5:], axis=1).astype(jnp.float32)
    valid = obj >= conf_thres
    score = jnp.where(valid, obj * cls_conf, -1.0)

    k = min(max_boxes, pred.shape[0])
    # saturation telemetry (no silent caps): candidates above threshold
    # that top-k dropped before NMS ever saw them
    n_valid = jnp.sum(valid.astype(jnp.int32))
    dropped_topk = jnp.maximum(n_valid - k, 0)
    top_score, top_idx = jax.lax.top_k(score, k)  # sorted desc
    rows = pred[top_idx]
    boxes = xywh_to_xyxy(rows[:, :4])  # (K, 4)
    obj_k = rows[:, 4]
    cls_conf_k = cls_conf[top_idx]
    cls_pred_k = cls_pred[top_idx]
    alive = top_score > 0.0  # invalid/below-threshold rows dropped

    iou = iou_xyxy(boxes, boxes)  # (K, K)
    same_class = cls_pred_k[:, None] == cls_pred_k[None, :]
    suppress = (iou > nms_thres) & same_class  # row i suppresses col j

    out = jnp.zeros((max_dets, 7), jnp.float32)
    out_mask = jnp.zeros((max_dets,), bool)

    def cond(carry):
        i, alive, _, _ = carry
        # early exit when nothing is left alive (vmapped: max across batch)
        return (i < max_dets) & jnp.any(alive)

    def body(carry):
        i, alive, out, out_mask = carry
        any_alive = jnp.any(alive)
        top = jnp.argmax(alive)  # first alive index == best score alive
        invalid = suppress[top] & alive  # includes `top` itself
        weights = jnp.where(invalid, obj_k, 0.0)
        wsum = jnp.sum(weights)
        merged_box = jnp.sum(weights[:, None] * boxes, axis=0) / jnp.maximum(
            wsum, 1e-20
        )
        row = jnp.concatenate(
            [
                merged_box,
                jnp.stack([obj_k[top], cls_conf_k[top], cls_pred_k[top]]),
            ]
        )
        out = jnp.where(any_alive, out.at[i].set(row), out)
        out_mask = out_mask.at[i].set(any_alive)
        alive = alive & ~invalid
        return i + 1, alive, out, out_mask

    _, alive_end, out, out_mask = jax.lax.while_loop(
        cond, body, (jnp.int32(0), alive, out, out_mask)
    )
    # candidates still alive when the output filled: max_dets saturated
    # (each would have emitted or merged into at least one more box)
    leftover = jnp.sum(alive_end.astype(jnp.int32))
    sat = jnp.stack([dropped_topk, leftover]).astype(jnp.int32)
    return out, out_mask, sat


@partial(
    jax.jit, static_argnames=("nms_thres", "max_boxes", "max_dets")
)
def _batched_nms_per_image(
    pred: jnp.ndarray,  # (N, B, 5+C)
    conf_thres: jnp.ndarray,  # (N,) per-image thresholds
    nms_thres: float,
    max_boxes: int,
    max_dets: int,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    fn = partial(
        _nms_single, nms_thres=nms_thres, max_boxes=max_boxes,
        max_dets=max_dets,
    )
    return jax.vmap(lambda p, c: fn(p, conf_thres=c))(pred, conf_thres)


def batched_nms(
    pred: jnp.ndarray,  # (N, B, 5+C) decoded YOLO output, boxes cxcywh px
    conf_thres=0.5,
    nms_thres: float = 0.4,
    max_boxes: int = 512,
    max_dets: int = 64,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (dets (N, MAX_DETS, 7), mask (N, MAX_DETS)); det rows are
    (x1, y1, x2, y2, obj_conf, cls_conf, cls_pred) like the reference.

    ``conf_thres`` is a scalar, or a per-image (N,) array (used by the
    load-equalized bench: per-stream thresholds keep detection counts --
    and so the selected capacity bucket -- uniform across streams)."""
    dets, mask, _ = batched_nms_with_stats(
        pred, conf_thres, nms_thres, max_boxes, max_dets
    )
    return dets, mask


def batched_nms_with_stats(
    pred: jnp.ndarray,
    conf_thres=0.5,
    nms_thres: float = 0.4,
    max_boxes: int = 512,
    max_dets: int = 64,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """batched_nms + per-image saturation counters (no silent caps).

    Third return: sat (N, 2) int32 = [dropped_topk, leftover_alive] --
    candidates above threshold that the ``max_boxes`` top-k pre-selection
    dropped, and candidates still alive when the ``max_dets`` output
    filled. Both are 0 whenever the fixed capacities held everything;
    nonzero values mean detections were silently capped and the caller
    should surface it (PipelineStats / bench JSON)."""
    if not isinstance(conf_thres, (float, int)):
        return _batched_nms_per_image(
            pred, jnp.asarray(conf_thres, jnp.float32), nms_thres, max_boxes,
            max_dets,
        )
    return _batched_nms_per_image(
        pred,
        jnp.full((pred.shape[0],), float(conf_thres), jnp.float32),
        nms_thres, max_boxes, max_dets,
    )


def roi_nms_mask(
    boxes_tlwh: jnp.ndarray,  # (D, 4)
    scores: jnp.ndarray,  # (D,)
    mask: jnp.ndarray,  # (D,) bool
    max_overlap: float,
) -> jnp.ndarray:
    """Malisiewicz ROI NMS keep-mask (deep_sort/sort/preprocessing.py), the
    DeepSort-side NMS. A no-op at the default nms_max_overlap=1.0 (callers
    skip it then); overlap = intersection / candidate area, +1 box extents."""
    boxes_tlwh = jnp.asarray(boxes_tlwh, jnp.float32)
    scores = jnp.asarray(scores, jnp.float32)
    mask = jnp.asarray(mask)
    x1 = boxes_tlwh[:, 0]
    y1 = boxes_tlwh[:, 1]
    x2 = boxes_tlwh[:, 2] + boxes_tlwh[:, 0]
    y2 = boxes_tlwh[:, 3] + boxes_tlwh[:, 1]
    area = (x2 - x1 + 1) * (y2 - y1 + 1)

    d = boxes_tlwh.shape[0]
    # process in descending score order (reference: ascending idxs popped
    # from the back)
    order = jnp.argsort(jnp.where(mask, -scores, jnp.inf), stable=True)

    xx1 = jnp.maximum(x1[:, None], x1[None, :])
    yy1 = jnp.maximum(y1[:, None], y1[None, :])
    xx2 = jnp.minimum(x2[:, None], x2[None, :])
    yy2 = jnp.minimum(y2[:, None], y2[None, :])
    w = jnp.maximum(0.0, xx2 - xx1 + 1)
    h = jnp.maximum(0.0, yy2 - yy1 + 1)
    overlap = (w * h) / area[None, :]  # overlap[i, j] vs candidate j's area

    # position of each box in processing order; a picked box only suppresses
    # boxes later in the order (the reference pops from the back of idxs and
    # only filters what remains)
    pos = jnp.argsort(order, stable=True)

    def body(k, keep):
        i = order[k]
        i_kept = keep[i] & mask[i]
        kill = (overlap[i] > max_overlap) & mask & (pos > k)
        return jnp.where(i_kept, keep & ~kill, keep)

    keep = jax.lax.fori_loop(0, d, body, mask)
    return keep
