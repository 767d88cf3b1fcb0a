"""Box-format conversions and IoU, vectorized for fixed-shape batches.

Coordinate conventions follow SURVEY.md Appendix G exactly:
  xyxy   : x1, y1, x2, y2            (corners, pixels)
  xywh   : cx, cy, w, h              (center, pixels)  -- DeepSort.update input
  tlwh   : top-left x, y, w, h                         -- sort/* internal
  xyah   : cx, cy, a=w/h, h                            -- Kalman state head
"""

from __future__ import annotations

import jax.numpy as jnp


def xywh_to_xyxy(b: jnp.ndarray) -> jnp.ndarray:
    cx, cy, w, h = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], axis=-1)


def xyxy_to_xywh(b: jnp.ndarray) -> jnp.ndarray:
    x1, y1, x2, y2 = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack([(x1 + x2) / 2, (y1 + y2) / 2, x2 - x1, y2 - y1], axis=-1)


def xywh_to_tlwh(b: jnp.ndarray) -> jnp.ndarray:
    cx, cy, w, h = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack([cx - w / 2, cy - h / 2, w, h], axis=-1)


def tlwh_to_xyah(b: jnp.ndarray, eps: float = 0.0) -> jnp.ndarray:
    """Aspect uses a guarded divide: padded (all-zero) rows map to a=0 instead
    of NaN; real boxes always have h > 0."""
    x, y, w, h = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    a = jnp.where(h > 0, w / jnp.where(h > 0, h, 1.0), eps)
    return jnp.stack([x + w / 2, y + h / 2, a, h], axis=-1)


def xyah_to_tlwh(b: jnp.ndarray) -> jnp.ndarray:
    cx, cy, a, h = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    w = a * h
    return jnp.stack([cx - w / 2, cy - h / 2, w, h], axis=-1)


def tlwh_to_xyxy(b: jnp.ndarray) -> jnp.ndarray:
    x, y, w, h = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack([x, y, x + w, y + h], axis=-1)


def iou_xyxy(a: jnp.ndarray, b: jnp.ndarray, eps: float = 1e-16) -> jnp.ndarray:
    """Pairwise IoU between (..., M, 4) and (..., N, 4) corner boxes ->
    (..., M, N). Matches utils.py:~220 bbox_iou (eps in the denominator)."""
    a = a[..., :, None, :]
    b = b[..., None, :, :]
    ix1 = jnp.maximum(a[..., 0], b[..., 0])
    iy1 = jnp.maximum(a[..., 1], b[..., 1])
    ix2 = jnp.minimum(a[..., 2], b[..., 2])
    iy2 = jnp.minimum(a[..., 3], b[..., 3])
    inter = jnp.clip(ix2 - ix1, 0) * jnp.clip(iy2 - iy1, 0)
    area_a = (a[..., 2] - a[..., 0]) * (a[..., 3] - a[..., 1])
    area_b = (b[..., 2] - b[..., 0]) * (b[..., 3] - b[..., 1])
    return inter / (area_a + area_b - inter + eps)


def iou_tlwh(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Pairwise IoU of tlwh boxes, matching sort/iou_matching.py:~10-45
    (no eps; padded zero-area pairs are masked by callers)."""
    ax = tlwh_to_xyxy(a)[..., :, None, :]
    bx = tlwh_to_xyxy(b)[..., None, :, :]
    ix1 = jnp.maximum(ax[..., 0], bx[..., 0])
    iy1 = jnp.maximum(ax[..., 1], bx[..., 1])
    ix2 = jnp.minimum(ax[..., 2], bx[..., 2])
    iy2 = jnp.minimum(ax[..., 3], bx[..., 3])
    inter = jnp.clip(ix2 - ix1, 0) * jnp.clip(iy2 - iy1, 0)
    area_a = a[..., :, None, 2] * a[..., :, None, 3]
    area_b = b[..., None, :, 2] * b[..., None, :, 3]
    denom = area_a + area_b - inter
    return jnp.where(denom > 0, inter / jnp.where(denom > 0, denom, 1.0), 0.0)
