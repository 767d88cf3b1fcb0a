"""Batched crop-resize-normalize for ReID embedding, fully on-chip.

Contract: SURVEY.md Appendix F (ReID crops) + section 2.3 Extractor
(reference: deep_sort/deep_sort.py _get_features:~100 crops each box with
integer slicing, then feature_extractor.py resizes to (64W, 128H) with cv2
bilinear, scales /255 and ImageNet-normalizes).

TPU-first: instead of D host-side crops + a ragged resize, one gather-based
bilinear sampler maps every box to a fixed (128, 64) grid directly from the
full frame -- vmapped over the detection axis, jit/vmap/scan-friendly, and
the frame never leaves the device.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# plain numpy so importing this module never initializes a jax backend
REID_MEAN = np.asarray([0.485, 0.456, 0.406], np.float32)
REID_STD = np.asarray([0.229, 0.224, 0.225], np.float32)
CROP_H, CROP_W = 128, 64


def _bilinear_sample(img: jnp.ndarray, ys: jnp.ndarray, xs: jnp.ndarray):
    """img (H, W, C) float; ys (Oh,), xs (Ow,) source coords -> (Oh, Ow, C)."""
    h, w = img.shape[0], img.shape[1]
    y0 = jnp.clip(jnp.floor(ys), 0, h - 1).astype(jnp.int32)
    x0 = jnp.clip(jnp.floor(xs), 0, w - 1).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, h - 1)
    x1 = jnp.minimum(x0 + 1, w - 1)
    wy = jnp.clip(ys - y0, 0.0, 1.0)[:, None, None]
    wx = jnp.clip(xs - x0, 0.0, 1.0)[None, :, None]
    top = img[y0][:, x0] * (1 - wx) + img[y0][:, x1] * wx
    bot = img[y1][:, x0] * (1 - wx) + img[y1][:, x1] * wx
    return top * (1 - wy) + bot * wy


def crop_and_normalize(
    frame_rgb: jnp.ndarray,  # (H, W, 3) uint8 or float
    boxes_xyxy: jnp.ndarray,  # (D, 4) float, already clipped to the frame
) -> jnp.ndarray:
    """(D, 128, 64, 3) float32, /255 + ImageNet-normalized.

    Boxes are truncated to integer pixels like the reference's slicing
    (_tlwh_to_xyxy -> int crop); degenerate boxes produce garbage pixels that
    callers mask out downstream."""
    img = jnp.asarray(frame_rgb).astype(jnp.float32) / 255.0
    h, w = img.shape[0], img.shape[1]

    def one(box):
        x1 = jnp.clip(box[0].astype(jnp.int32), 0, w - 1)
        y1 = jnp.clip(box[1].astype(jnp.int32), 0, h - 1)
        x2 = jnp.clip(box[2].astype(jnp.int32), x1 + 1, w)
        y2 = jnp.clip(box[3].astype(jnp.int32), y1 + 1, h)
        ch = (y2 - y1).astype(jnp.float32)
        cw = (x2 - x1).astype(jnp.float32)
        # cv2.resize INTER_LINEAR: half-pixel-center source coordinates
        ys = y1 + (jnp.arange(CROP_H, dtype=jnp.float32) + 0.5) * ch / CROP_H - 0.5
        xs = x1 + (jnp.arange(CROP_W, dtype=jnp.float32) + 0.5) * cw / CROP_W - 0.5
        # clamp sampling inside the crop (slicing semantics: no bleed-over)
        ys = jnp.clip(ys, y1, y2 - 1)
        xs = jnp.clip(xs, x1, x2 - 1)
        return _bilinear_sample(img, ys, xs)

    crops = jax.vmap(one)(boxes_xyxy)  # (D, 128, 64, 3)
    return (crops - REID_MEAN) / REID_STD
