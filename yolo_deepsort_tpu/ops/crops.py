"""Batched crop-resize-normalize for ReID embedding, fully on-chip.

Contract: SURVEY.md Appendix F (ReID crops) + section 2.3 Extractor
(reference: deep_sort/deep_sort.py _get_features:~100 crops each box with
integer slicing, then feature_extractor.py resizes to (64W, 128H) with cv2
bilinear, scales /255 and ImageNet-normalizes).

TPU-first: per-pixel gather sampling is catastrophically slow on TPU (the
VPU has no efficient random gather; measured ~35 ms/step for 8x64 crops).
Instead, bilinear resampling is expressed as TWO MATRIX CONTRACTIONS on the
MXU: for each box, build interpolation matrices Wy (128, H) and Wx (64, W)
whose rows are the triangle (hat) kernel of the bilinear weights, then

    crop = Wy @ frame @ Wx^T        (per channel)

The matrices are constructed with pure elementwise ops (broadcasted iota,
clip) and the contractions batch over all boxes: einsum('dxw,hwc->dhxc')
then einsum('dyh,dhxc->dyxc') -- large, dense, bf16 MXU work instead of 25M
scalar gathers. Sampling coordinates exactly reproduce the gather version
(half-pixel centers, clamped inside the integer crop window), so cv2 parity
is preserved.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# plain numpy so importing this module never initializes a jax backend
REID_MEAN = np.asarray([0.485, 0.456, 0.406], np.float32)
REID_STD = np.asarray([0.229, 0.224, 0.225], np.float32)
CROP_H, CROP_W = 128, 64


def _interp_matrix(starts, ends, limit: int, out_size: int, dtype,
                   offsets=None):
    """(D, out_size, limit) triangle-kernel interpolation weights.

    Row r of matrix d holds the bilinear weights for output position r of
    box d, sampling source coords clamped to [start, end-1] (integer crop
    window semantics: no bleed past the slice, replicate at the edge).

    ``offsets`` (D,) int shifts the tap positions: column j of matrix d
    weights source pixel ``offsets[d] + j``. The windowed resampler passes
    its integer window origins here so coords and weights are computed in
    ABSOLUTE frame coordinates with the exact same f32 ops as the dense
    path -- fl(y1+t) vs fl((y1-oy)+t) can round differently, so shifting
    the coords instead of the taps would break bit-exactness with dense."""
    starts = starts.astype(jnp.float32)
    span = (ends - starts).astype(jnp.float32)
    r = (jnp.arange(out_size, dtype=jnp.float32) + 0.5) / out_size  # (O,)
    coords = starts[:, None] + r[None, :] * span[:, None] - 0.5  # (D, O)
    coords = jnp.clip(
        coords, starts[:, None], jnp.maximum(ends[:, None] - 1.0, starts[:, None])
    )
    k = jnp.arange(limit, dtype=jnp.float32)  # (L,)
    if offsets is not None:
        k = offsets.astype(jnp.float32)[:, None, None] + k[None, None, :]
    else:
        k = k[None, None, :]
    w = jnp.clip(1.0 - jnp.abs(coords[:, :, None] - k), 0.0, 1.0)
    # normalize: at clamped edges only one tap may fall in range
    w = w / jnp.maximum(jnp.sum(w, axis=-1, keepdims=True), 1e-6)
    return w.astype(dtype)


def crop_window_bounds(boxes_xyxy, frame_h: int, frame_w: int):
    """Integer crop-window corners exactly as crop_and_normalize computes
    them: (x1, y1, x2, y2) int32 with x2/y2 exclusive and at least 1 px."""
    x1 = jnp.clip(boxes_xyxy[..., 0].astype(jnp.int32), 0, frame_w - 1)
    y1 = jnp.clip(boxes_xyxy[..., 1].astype(jnp.int32), 0, frame_h - 1)
    x2 = jnp.clip(boxes_xyxy[..., 2].astype(jnp.int32), x1 + 1, frame_w)
    y2 = jnp.clip(boxes_xyxy[..., 3].astype(jnp.int32), y1 + 1, frame_h)
    return x1, y1, x2, y2


def crop_and_normalize(
    frame_rgb: jnp.ndarray,  # (H, W, 3) uint8 or float
    boxes_xyxy: jnp.ndarray,  # (D, 4) float, already clipped to the frame
    compute_dtype=jnp.float32,
) -> jnp.ndarray:
    """(D, 128, 64, 3) float32, /255 + ImageNet-normalized.

    Boxes are truncated to integer pixels like the reference's slicing
    (_tlwh_to_xyxy -> int crop); degenerate boxes produce edge-replicated
    pixels that callers mask out downstream."""
    img = jnp.asarray(frame_rgb)
    h, w = img.shape[0], img.shape[1]

    x1, y1, x2, y2 = crop_window_bounds(boxes_xyxy, h, w)

    wy = _interp_matrix(y1, y2, h, CROP_H, compute_dtype)  # (D, 128, H)
    wx = _interp_matrix(x1, x2, w, CROP_W, compute_dtype)  # (D, 64, W)

    imgc = img.astype(compute_dtype)
    # contract the (usually larger) W axis first: (D,64,W) x (H,W,C)
    tmp = jnp.einsum(
        "dxw,hwc->dhxc", wx, imgc, preferred_element_type=jnp.float32
    ).astype(compute_dtype)
    crops = jnp.einsum(
        "dyh,dhxc->dyxc", wy, tmp, preferred_element_type=jnp.float32
    )  # (D, 128, 64, 3) f32

    crops = crops / 255.0
    return (crops - REID_MEAN) / REID_STD


def crop_and_normalize_windowed(
    frame_rgb: jnp.ndarray,  # (H, W, 3) uint8 or float
    boxes_xyxy: jnp.ndarray,  # (D, 4) float, already clipped to the frame
    win_h: int,
    win_w: int,
    compute_dtype=jnp.float32,
) -> jnp.ndarray:
    """crop_and_normalize through a fixed (win_h, win_w) source window.

    The dense resampler contracts the FULL frame axes for every box -- at
    1080p that is ~400 MMAC/crop of which typically <20% lands inside the
    crop. Here each box dynamic_slices a (win_h, win_w, 3) window anchored
    at its (clipped) top-left corner and both interpolation contractions run
    inside the window: compute and intermediate HBM traffic scale with the
    window, not the frame.

    EXACT (bit-identical sampling to crop_and_normalize) whenever every
    box's integer crop extent fits the window: (y2-y1) <= win_h and
    (x2-x1) <= win_w per crop_window_bounds. Callers guarantee this by
    selecting the window from the batch's measured max crop extent (see
    parallel/streams.py BucketedScannedStep); oversized boxes resample a
    truncated window (finite, garbage -- callers only let that happen on
    masked-out rows). Output rows whose sample coords fall wholly outside
    the window get zero weight sums and normalize to the -mean/std color."""
    img = jnp.asarray(frame_rgb)
    h, w = img.shape[0], img.shape[1]
    win_h, win_w = min(int(win_h), h), min(int(win_w), w)

    x1, y1, x2, y2 = crop_window_bounds(boxes_xyxy, h, w)
    ox = jnp.clip(x1, 0, w - win_w)  # window origin: box corner, pulled
    oy = jnp.clip(y1, 0, h - win_h)  # inside the frame near the edges

    windows = jax.vmap(
        lambda yo, xo: jax.lax.dynamic_slice(img, (yo, xo, 0), (win_h, win_w, 3))
    )(oy, ox)  # (D, win_h, win_w, 3)

    # absolute-coordinate weights with window-offset taps: bit-identical
    # math to the dense path (see _interp_matrix's offsets note)
    wy = _interp_matrix(y1, y2, win_h, CROP_H, compute_dtype, offsets=oy)
    wx = _interp_matrix(x1, x2, win_w, CROP_W, compute_dtype, offsets=ox)

    winc = windows.astype(compute_dtype)
    tmp = jnp.einsum(
        "dxw,dhwc->dhxc", wx, winc, preferred_element_type=jnp.float32
    ).astype(compute_dtype)
    crops = jnp.einsum(
        "dyh,dhxc->dyxc", wy, tmp, preferred_element_type=jnp.float32
    )  # (D, 128, 64, 3) f32

    crops = crops / 255.0
    return (crops - REID_MEAN) / REID_STD
