"""Letterbox preprocessing (pad-to-square + resize) and box rescaling.

Contract: SURVEY.md Appendix F (reference: yolo3/dataset/datasets.py
pad_to_square/resize; yolo3/utils/utils.py rescale_boxes:~45).
Oracle: specs/letterbox_np.py.

Because frame geometry (H, W, S) is static per stream, all sampling indices
and bilinear weights are computed in numpy at TRACE time -- the compiled op
is just static gathers + a fused multiply-add on the VPU, with no dynamic
index math on-chip. A Pallas fused uint8->bf16 variant is the follow-up
(SURVEY.md north star); this XLA version is the correctness baseline.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def _pad_amounts(h: int, w: int):
    d = abs(h - w)
    p1, p2 = d // 2, d - d // 2
    if h <= w:
        return (p1, p2, 0, 0)  # top, bottom, left, right
    return (0, 0, p1, p2)


@partial(jax.jit, static_argnames=("size", "interp"))
def letterbox(
    frame_rgb: jnp.ndarray,  # (H, W, 3) uint8
    size: int,
    interp: str = "bilinear",
) -> jnp.ndarray:
    """(size, size, 3) float32 in [0, 1]: /255 -> pad_to_square(0) -> resize.

    interp='bilinear' (half-pixel centers, no antialias) is the SURVEY App. F
    contract; 'nearest' reproduces the upstream F.interpolate default
    (src = floor(dst * scale))."""
    h, w = int(frame_rgb.shape[0]), int(frame_rgb.shape[1])
    top, bottom, left, right = _pad_amounts(h, w)
    side = max(h, w)

    padded = jnp.pad(
        frame_rgb, ((top, bottom), (left, right), (0, 0)), constant_values=0
    )

    if interp == "nearest":
        ys = np.minimum((np.arange(size) * (side / size)).astype(np.int64), side - 1)
        xs = ys  # square
        out = padded[ys][:, xs].astype(jnp.float32) / 255.0
        return out

    # bilinear with static indices/weights
    coords = (np.arange(size) + 0.5) * (side / size) - 0.5
    i0 = np.clip(np.floor(coords), 0, side - 1).astype(np.int64)
    i1 = np.minimum(i0 + 1, side - 1)
    t = np.clip(coords - i0, 0.0, 1.0).astype(np.float32)

    img = padded.astype(jnp.float32)
    wy = jnp.asarray(t)[:, None, None]
    wx = jnp.asarray(t)[None, :, None]
    top_row = img[i0][:, i0] * (1 - wx) + img[i0][:, i1] * wx
    bot_row = img[i1][:, i0] * (1 - wx) + img[i1][:, i1] * wx
    return (top_row * (1 - wy) + bot_row * wy) / 255.0


def rescale_boxes(
    boxes_xyxy: jnp.ndarray, current_dim: int, orig_h: int, orig_w: int
) -> jnp.ndarray:
    """Map boxes from letterboxed network space back to the original frame
    (utils.py rescale_boxes, including its ``pad // 2`` floor)."""
    m = max(orig_h, orig_w)
    pad_x = max(orig_h - orig_w, 0) * (current_dim / m)
    pad_y = max(orig_w - orig_h, 0) * (current_dim / m)
    unpad_w = current_dim - pad_x
    unpad_h = current_dim - pad_y
    off_x = pad_x // 2
    off_y = pad_y // 2
    x1 = (boxes_xyxy[..., 0] - off_x) / unpad_w * orig_w
    y1 = (boxes_xyxy[..., 1] - off_y) / unpad_h * orig_h
    x2 = (boxes_xyxy[..., 2] - off_x) / unpad_w * orig_w
    y2 = (boxes_xyxy[..., 3] - off_y) / unpad_h * orig_h
    return jnp.stack([x1, y1, x2, y2], axis=-1)
