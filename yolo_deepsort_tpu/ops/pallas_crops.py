"""Fused windowed crop-resample-normalize as a Pallas TPU kernel.

The ReID crop stage (reference: deep_sort/deep/feature_extractor.py:~30
crop -> cv2 bilinear resize to 64x128 -> /255 -> ImageNet normalize) is
HBM-traffic-bound on TPU: the XLA windowed resampler (ops/crops.py
crop_and_normalize_windowed) pays an XLA gather to materialize each box's
source window, which measures ~3x slower than the bytes moved justify.

This kernel does, per (frame, box) grid cell:

  1. ONE strided async DMA per channel: the box's aligned source window
     (rows 8-aligned, columns 128-aligned -- tile-aligned offsets keep the
     copy on the DMA fast path) from the planar HBM frame into VMEM,
  2. builds the bilinear weight matrices IN-KERNEL from the box's integer
     crop bounds (scalar-prefetched; same half-pixel-center clamped-tap
     math as ops/crops.py _interp_matrix, /255 folded into the row
     weights),
  3. two MXU matmuls (Y-resample then X-resample) and the ImageNet affine,
     writing the (3, 128, 64) crop directly.

Compute and traffic scale with the WINDOW, not the frame: at a (320, 192)
window the whole 1080p crop stage moves ~0.3 MB/box instead of contracting
12 MB/box. Exactness contract is the same as the XLA windowed path: boxes
whose integer crop extent fits (win_h, win_w) resample identically
(callers guarantee it via the chunk-stats readback, parallel/streams.py);
oversized boxes land on masked rows only.

Geometry requirements (else callers must fall back to the XLA path, see
pallas_crops_supported): H % 8 == 0, W % 128 == 0, padded window fits the
frame.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .crops import CROP_H, CROP_W, REID_MEAN, REID_STD, crop_window_bounds


def _pad_window(win_h: int, win_w: int, h: int, w: int):
    """Aligned window dims: 8-row slack for the row alignment, 128-lane
    slack for the column alignment, rounded to the tile grid."""
    wh = min((win_h + 8 + 7) // 8 * 8, h)
    ww = min((win_w + 128 + 127) // 128 * 128, w)
    return wh, ww


def pallas_crops_supported(h: int, w: int, win_h: int, win_w: int) -> bool:
    """Frame tiling is the only gate: _pad_window clamps to the frame, and
    a frame-clamped window still covers every in-frame box, so any window
    size works once H/W are tile-divisible."""
    del win_h, win_w
    return h % 8 == 0 and w % 128 == 0


def use_pallas_crops_default() -> bool:
    """Kernel on TPU-class backends (measured 15.5 vs 36.3 ms/chunk dense at
    the honest bench load, cap 40). YDT_CROPS_PALLAS=0/1 forces; default:
    auto by backend (same convention as the JV solver kernel)."""
    import os

    flag = os.environ.get("YDT_CROPS_PALLAS", "auto")
    if flag == "0":
        return False
    if flag == "1":
        return True
    try:
        return jax.default_backend() not in ("cpu", "gpu")
    except Exception:
        return False


def pallas_crop_and_normalize_batch(
    frames_rgb: jnp.ndarray,  # (B, H, W, 3) uint8
    boxes_xyxy: jnp.ndarray,  # (B, D, 4) float, clipped to the frame
    win_h: int,
    win_w: int,
    crops_per_program: int = 4,
    interpret: bool = False,
) -> jnp.ndarray:
    """(B, D, 128, 64, 3) float32, /255 + ImageNet-normalized.

    Matches crop_and_normalize_windowed(..., compute_dtype=bfloat16) up to
    bf16 accumulation-order differences (the production compute dtype).

    Dispatches between the planar kernel (default; pays a NHWC->planar
    relayout of the frame batch, which the production graph absorbs
    cheaply) and the interleaved-RGB kernel (YDT_CROPS_LAYOUT=interleaved;
    a twice-measured NEGATIVE kept for reproducible A/B -- its in-kernel
    channel-blocked weight construction costs more than the transpose it
    avoids: production track stage 142.3 vs 132.9 ms/chunk at cap 36, see
    docs/DESIGN.md)."""
    import os

    if os.environ.get("YDT_CROPS_LAYOUT", "planar") == "interleaved":
        return _pallas_crops_interleaved(
            frames_rgb, boxes_xyxy, win_h, win_w,
            crops_per_program=crops_per_program, interpret=interpret)
    return _pallas_crops_planar(
        frames_rgb, boxes_xyxy, win_h, win_w,
        crops_per_program=crops_per_program, interpret=interpret)


@partial(jax.jit,
         static_argnames=("win_h", "win_w", "crops_per_program", "interpret"))
def _pallas_crops_planar(
    frames_rgb: jnp.ndarray,
    boxes_xyxy: jnp.ndarray,
    win_h: int,
    win_w: int,
    crops_per_program: int = 4,
    interpret: bool = False,
) -> jnp.ndarray:
    """Planar-layout kernel: one DMA per channel per box from a (B, 3, H, W)
    transpose of the frames.

    ``crops_per_program`` batches several boxes into one grid cell: the
    per-program dispatch overhead dominates at one ~50 MMAC box per cell
    (measured ~15 ms floor over 5120 cells), and G boxes per cell amortize
    it G-fold while their window DMAs overlap."""
    b, h, w = (int(frames_rgb.shape[0]), int(frames_rgb.shape[1]),
               int(frames_rgb.shape[2]))
    d = int(boxes_xyxy.shape[1])
    g = max(1, min(int(crops_per_program), d))
    dp = (d + g - 1) // g * g
    if dp != d:  # pad to a g-multiple with degenerate (1px) boxes
        boxes_xyxy = jnp.concatenate(
            [boxes_xyxy, jnp.zeros((b, dp - d, 4), boxes_xyxy.dtype)], axis=1
        )
    wh, ww = _pad_window(win_h, win_w, h, w)
    assert pallas_crops_supported(h, w, win_h, win_w), (h, w, win_h, win_w)

    x1, y1, x2, y2 = crop_window_bounds(
        boxes_xyxy.reshape(b * dp, 4), h, w
    )
    oy = (jnp.clip(y1, 0, h - wh) // 8) * 8
    ox = (jnp.clip(x1, 0, w - ww) // 128) * 128
    # (6, B*D): the box-count axis must be the SMEM lane axis -- a (B*D, 6)
    # layout lane-pads 6 -> 128 and overflows SMEM at chunk scale
    scalars = jnp.stack([y1, y2, x1, x2, oy, ox], axis=0)

    frames_planar = jnp.transpose(frames_rgb, (0, 3, 1, 2))  # (B, 3, H, W)

    def kernel(scal_ref, frame_hbm, out_ref, win_vmem, sems):
        bi = pl.program_id(0)
        dj = pl.program_id(1)

        def origins(gi):
            flat = (bi * dp + dj * g) + gi
            return (pl.multiple_of(scal_ref[4, flat], 8),
                    pl.multiple_of(scal_ref[5, flat], 128))

        for gi in range(g):  # start every window DMA up front
            oy_s, ox_s = origins(gi)
            for c in range(3):
                pltpu.make_async_copy(
                    frame_hbm.at[bi, c, pl.ds(oy_s, wh), pl.ds(ox_s, ww)],
                    win_vmem.at[gi, c],
                    sems.at[gi, c],
                ).start()

        def interp(start, end, origin, n_out, n_src):
            # == ops/crops.py _interp_matrix in window-relative coords
            # (Mosaic iota is integer-only; widen to f32 after)
            r = jax.lax.broadcasted_iota(
                jnp.int32, (n_out, n_src), 0).astype(jnp.float32)
            k = jax.lax.broadcasted_iota(
                jnp.int32, (n_out, n_src), 1).astype(jnp.float32)
            coords = start + (r + 0.5) / n_out * (end - start) - 0.5
            coords = jnp.clip(coords, start, jnp.maximum(end - 1.0, start))
            wgt = jnp.clip(1.0 - jnp.abs(coords - (k + origin)), 0.0, 1.0)
            return wgt / jnp.maximum(
                jnp.sum(wgt, axis=1, keepdims=True), 1e-6)

        for gi in range(g):
            flat = (bi * dp + dj * g) + gi
            oy_s, ox_s = origins(gi)
            y1f = scal_ref[0, flat].astype(jnp.float32)
            y2f = scal_ref[1, flat].astype(jnp.float32)
            x1f = scal_ref[2, flat].astype(jnp.float32)
            x2f = scal_ref[3, flat].astype(jnp.float32)
            oyf = oy_s.astype(jnp.float32)
            oxf = ox_s.astype(jnp.float32)

            wy = (interp(y1f, y2f, oyf, CROP_H, wh) / 255.0
                  ).astype(jnp.bfloat16)
            wxt = interp(x1f, x2f, oxf, CROP_W, ww).astype(jnp.bfloat16)

            for c in range(3):
                pltpu.make_async_copy(
                    frame_hbm.at[bi, c, pl.ds(oy_s, wh), pl.ds(ox_s, ww)],
                    win_vmem.at[gi, c],
                    sems.at[gi, c],
                ).wait()
                band = win_vmem[gi, c].astype(jnp.int32).astype(
                    jnp.float32).astype(jnp.bfloat16)
                rows = jax.lax.dot_general(
                    wy, band, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ).astype(jnp.bfloat16)  # (CROP_H, ww)
                crop = jax.lax.dot_general(
                    rows, wxt, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # (CROP_H, CROP_W)
                inv_std = 1.0 / float(REID_STD[c])
                out_ref[0, gi, c] = (crop * inv_std
                                     - float(REID_MEAN[c]) * inv_std)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, dp // g),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # planar frames stay in HBM
        ],
        out_specs=pl.BlockSpec(
            (1, g, 3, CROP_H, CROP_W), lambda bi, dj, scal: (bi, dj, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((g, 3, wh, ww), jnp.uint8),
            pltpu.SemaphoreType.DMA((g, 3)),
        ],
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(
            (b, dp, 3, CROP_H, CROP_W), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(scalars, frames_planar)
    return jnp.transpose(out[:, :d], (0, 1, 3, 4, 2))  # (B, D, 128, 64, 3)


@partial(jax.jit,
         static_argnames=("win_h", "win_w", "crops_per_program", "interpret"))
def _pallas_crops_interleaved(
    frames_rgb: jnp.ndarray,
    boxes_xyxy: jnp.ndarray,
    win_h: int,
    win_w: int,
    crops_per_program: int = 4,
    interpret: bool = False,
) -> jnp.ndarray:
    """Interleaved-RGB kernel: consumes the frame viewed as (B, H, W*3)
    uint8 (free trailing reshape -- no planar transpose), one DMA per box.
    The X-resample weight matrix is CHANNEL-BLOCKED --
    Wxc[w*3+c, x*3+c'] = wx[x, w] * [c == c'] -- so the interleaved lanes
    resample without deinterleaving, and the (128, 64*3) result IS the
    final NHWC crop (no output transpose either). ~10 ms/chunk more
    in-kernel work than the planar variant (bigger X matmul + in-kernel
    Wxc construction) but skips the production graph's ~50 ms relayout."""
    b, h, w = (int(frames_rgb.shape[0]), int(frames_rgb.shape[1]),
               int(frames_rgb.shape[2]))
    d = int(boxes_xyxy.shape[1])
    g = max(1, min(int(crops_per_program), d))
    dp = (d + g - 1) // g * g
    if dp != d:  # pad to a g-multiple with degenerate (1px) boxes
        boxes_xyxy = jnp.concatenate(
            [boxes_xyxy, jnp.zeros((b, dp - d, 4), boxes_xyxy.dtype)], axis=1
        )
    wh, ww = _pad_window(win_h, win_w, h, w)
    ww3 = ww * 3  # ww is a 128-multiple, so ww3 is a 384-multiple
    cw3 = CROP_W * 3
    assert pallas_crops_supported(h, w, win_h, win_w), (h, w, win_h, win_w)

    x1, y1, x2, y2 = crop_window_bounds(
        boxes_xyxy.reshape(b * dp, 4), h, w
    )
    oy = (jnp.clip(y1, 0, h - wh) // 8) * 8
    ox = (jnp.clip(x1, 0, w - ww) // 128) * 128
    # (6, B*D): box-count axis on the SMEM lane dim (see planar kernel)
    scalars = jnp.stack([y1, y2, x1, x2, oy, ox], axis=0)

    frames_flat = frames_rgb.reshape(b, h, w * 3)  # interleaved view, free

    def kernel(scal_ref, frame_hbm, out_ref, win_vmem, sems):
        bi = pl.program_id(0)
        dj = pl.program_id(1)

        def origins(gi):
            flat = (bi * dp + dj * g) + gi
            oy_s = pl.multiple_of(scal_ref[4, flat], 8)
            ox3 = pl.multiple_of(scal_ref[5, flat] * 3, 384)
            return oy_s, ox3

        for gi in range(g):  # start every window DMA up front
            oy_s, ox3 = origins(gi)
            pltpu.make_async_copy(
                frame_hbm.at[bi, pl.ds(oy_s, wh), pl.ds(ox3, ww3)],
                win_vmem.at[gi],
                sems.at[gi],
            ).start()

        # channel-lane selectors for the affine, shared across the group
        lane_c = jax.lax.broadcasted_iota(jnp.int32, (CROP_H, cw3), 1) % 3
        inv_std = [1.0 / float(REID_STD[c]) for c in range(3)]
        scale = jnp.where(
            lane_c == 0, inv_std[0],
            jnp.where(lane_c == 1, inv_std[1], inv_std[2]))
        bias = jnp.where(
            lane_c == 0, float(REID_MEAN[0]) * inv_std[0],
            jnp.where(lane_c == 1, float(REID_MEAN[1]) * inv_std[1],
                      float(REID_MEAN[2]) * inv_std[2]))

        for gi in range(g):
            flat = (bi * dp + dj * g) + gi
            oy_s, ox3 = origins(gi)
            y1f = scal_ref[0, flat].astype(jnp.float32)
            y2f = scal_ref[1, flat].astype(jnp.float32)
            x1f = scal_ref[2, flat].astype(jnp.float32)
            x2f = scal_ref[3, flat].astype(jnp.float32)
            oyf = oy_s.astype(jnp.float32)
            oxf = scal_ref[5, flat].astype(jnp.float32)

            # Y weights: == ops/crops.py _interp_matrix in window coords
            r = jax.lax.broadcasted_iota(
                jnp.int32, (CROP_H, wh), 0).astype(jnp.float32)
            k = jax.lax.broadcasted_iota(
                jnp.int32, (CROP_H, wh), 1).astype(jnp.float32)
            cy = y1f + (r + 0.5) / CROP_H * (y2f - y1f) - 0.5
            cy = jnp.clip(cy, y1f, jnp.maximum(y2f - 1.0, y1f))
            wy = jnp.clip(1.0 - jnp.abs(cy - (k + oyf)), 0.0, 1.0)
            wy = wy / jnp.maximum(jnp.sum(wy, axis=1, keepdims=True), 1e-6)
            wy = (wy / 255.0).astype(jnp.bfloat16)

            # channel-blocked X weights on interleaved lanes
            j = jax.lax.broadcasted_iota(jnp.int32, (ww3, cw3), 0)
            o = jax.lax.broadcasted_iota(jnp.int32, (ww3, cw3), 1)
            w_src = (j // 3).astype(jnp.float32)
            x_out = (o // 3).astype(jnp.float32)
            cx = x1f + (x_out + 0.5) / CROP_W * (x2f - x1f) - 0.5
            cx = jnp.clip(cx, x1f, jnp.maximum(x2f - 1.0, x1f))
            wgt = jnp.clip(1.0 - jnp.abs(cx - (w_src + oxf)), 0.0, 1.0)
            wgt = jnp.where((j % 3) == (o % 3), wgt, 0.0)
            wxc = (wgt / jnp.maximum(
                jnp.sum(wgt, axis=0, keepdims=True), 1e-6)
            ).astype(jnp.bfloat16)

            pltpu.make_async_copy(
                frame_hbm.at[bi, pl.ds(oy_s, wh), pl.ds(ox3, ww3)],
                win_vmem.at[gi],
                sems.at[gi],
            ).wait()
            band = win_vmem[gi].astype(jnp.int32).astype(
                jnp.float32).astype(jnp.bfloat16)
            rows = jax.lax.dot_general(
                wy, band, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(jnp.bfloat16)  # (CROP_H, ww3) interleaved
            crop = jax.lax.dot_general(
                rows, wxc, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (CROP_H, CROP_W*3) interleaved
            out_ref[0, gi] = crop * scale - bias

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, dp // g),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # interleaved frames in HBM
        ],
        out_specs=pl.BlockSpec(
            (1, g, CROP_H, cw3), lambda bi, dj, scal: (bi, dj, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((g, wh, ww3), jnp.uint8),
            pltpu.SemaphoreType.DMA((g,)),
        ],
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, dp, CROP_H, cw3), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(scalars, frames_flat)
    return out[:, :d].reshape(b, d, CROP_H, CROP_W, 3)
