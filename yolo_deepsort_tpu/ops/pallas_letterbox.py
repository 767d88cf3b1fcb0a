"""Fused letterbox preprocessor as a Pallas TPU kernel.

North-star item (BASELINE.json: "host-side video decode feeds a fused
letterbox-resize/pad/normalize Pallas preprocessor"). The XLA letterbox
(ops/letterbox.py) first materializes the padded square frame in HBM
(1920x1920x3 for 1080p) and then resizes; this kernel streams each source
row band HBM -> VMEM exactly once via manual async DMA, never materializes
the padded image, and emits scaled float output directly.

Mosaic-friendly structure (it rejects minor-dim transposes/shape casts and
uint8->f32 casts):

  * the frame is fed PLANAR (3, H, W) -- one cheap XLA transpose outside;
    inside, everything is per-channel 2D MXU matmuls:
        rows = Wy_tile (TILE, BAND) @ band_c (BAND, W)
        out  = rows @ Wx^T (W, S)
  * uint8 widens via int32 (the supported cast chain); /255 and zero padding
    are folded into the weight matrices (out-of-image taps have zero weight),
  * grid over (output row tile, channel); each tile's source band start is a
    scalar-prefetch operand driving a dynamic-slice DMA from HBM.

Geometry (H, W, S) is static, so all weights/bounds are numpy at trace time.
Matches ops/letterbox.py 'bilinear' (oracle: specs/letterbox_np.py).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .letterbox import _pad_amounts


def _weights_1d(n_src: int, offset: int, side: int, size: int) -> np.ndarray:
    """(size, n_src) bilinear weights from padded-square output space to the
    source axis; taps landing in the pad region contribute zero."""
    coords = (np.arange(size) + 0.5) * (side / size) - 0.5  # padded coords
    coords = np.clip(coords, 0, side - 1)
    src = coords - offset  # source-axis coords; may be out of [0, n_src)
    k = np.arange(n_src)
    w = np.clip(1.0 - np.abs(src[:, None] - k[None, :]), 0.0, 1.0)
    return w.astype(np.float32)


@partial(jax.jit, static_argnames=("size", "tile", "interpret"))
def pallas_letterbox(
    frame_rgb: jnp.ndarray,  # (H, W, 3) uint8
    size: int = 416,
    tile: int = 8,
    interpret: bool = False,
) -> jnp.ndarray:
    """(size, size, 3) float32 in [0, 1]; bilinear pad-to-square letterbox."""
    return pallas_letterbox_batch(
        frame_rgb[None], size=size, tile=tile, interpret=interpret
    )[0]


@partial(jax.jit, static_argnames=("size", "tile", "interpret"))
def pallas_letterbox_batch(
    frames_rgb: jnp.ndarray,  # (B, H, W, 3) uint8
    size: int = 416,
    tile: int = 8,
    interpret: bool = False,
) -> jnp.ndarray:
    """Batched fused letterbox: (B, size, size, 3) float32.

    The batch is a leading grid dimension (vmap cannot block an ANY-space
    operand, so batching lives inside the kernel: the DMA indexes the frame
    by the batch program id)."""
    b = int(frames_rgb.shape[0])
    h, w = int(frames_rgb.shape[1]), int(frames_rgb.shape[2])
    top, _, left, _ = _pad_amounts(h, w)
    side = max(h, w)
    assert size % tile == 0, (size, tile)
    n_tiles = size // tile

    wy_full = _weights_1d(h, top, side, size)  # (S, H)
    wx_full = _weights_1d(w, left, side, size)  # (S, W)

    # per output row tile: static-size source row band [start, start+band_len);
    # Mosaic requires DMA slice shapes (and offsets, conservatively) aligned
    # to the 8-row sublane tiling
    def _align8_up(v):
        return (v + 7) // 8 * 8

    band_len = min(_align8_up(int(np.ceil(tile * side / size)) + 2 + 7), h)
    nz = wy_full > 0
    band_starts = []
    for t in range(n_tiles):
        rows = nz[t * tile : (t + 1) * tile]
        idx = np.where(rows.any(axis=0))[0]
        start = (int(idx[0]) // 8 * 8) if len(idx) else 0
        band_starts.append(max(min(start, h - band_len), 0))
    band_starts = np.asarray(band_starts, np.int32)

    wy_tiles = np.zeros((n_tiles, tile, band_len), np.float32)
    for t in range(n_tiles):
        s0 = band_starts[t]
        wy_tiles[t] = wy_full[t * tile : (t + 1) * tile, s0 : s0 + band_len]
    wy_tiles /= 255.0  # fold the uint8 scale into the row weights

    frames_planar = jnp.transpose(frames_rgb, (0, 3, 1, 2))  # (B, 3, H, W)

    def kernel(starts_ref, frame_hbm, wy_ref, wx_ref, out_ref, band_vmem, sem):
        bi = pl.program_id(0)
        t = pl.program_id(1)
        c = pl.program_id(2)
        # band starts are 8-aligned by construction (see _align8 above); the
        # hint lets Mosaic prove the DMA offset respects sublane tiling
        start = pl.multiple_of(starts_ref[t], 8)
        dma = pltpu.make_async_copy(
            frame_hbm.at[bi, c, pl.ds(start, band_len)], band_vmem, sem
        )
        dma.start()
        dma.wait()
        # Mosaic has no direct uint8->f32 cast; widen through int32 first
        band = band_vmem[...].astype(jnp.int32).astype(jnp.float32)
        rows = jnp.dot(wy_ref[0], band, preferred_element_type=jnp.float32)
        out_ref[0, 0] = jnp.dot(
            rows, wx_ref[...], preferred_element_type=jnp.float32
        )  # (tile, S)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, n_tiles, 3),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # planar frames stay in HBM
            pl.BlockSpec(
                (1, tile, band_len), lambda bi, t, c, starts: (t, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (w, size), lambda bi, t, c, starts: (0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, tile, size), lambda bi, t, c, starts: (bi, c, t, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((band_len, w), jnp.uint8),
            pltpu.SemaphoreType.DMA,
        ],
    )
    out_planar = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, 3, size, size), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(jnp.asarray(band_starts), frames_planar, jnp.asarray(wy_tiles),
      jnp.asarray(wx_full.T))
    return jnp.transpose(out_planar, (0, 2, 3, 1))  # (B, S, S, 3)


def use_pallas_letterbox_default() -> bool:
    """Kernel on TPU-class backends. The XLA letterbox's static-index
    gathers cost 200-550 ms/frame at 1080p on TPU (round-3 measurement:
    the api-path chunk step spent 3-9 s of its dispatch in 16 frames of
    XLA letterbox while the whole track stage ran in 70 ms), which is why
    the fused kernel exists. YDT_LETTERBOX_PALLAS=0/1 forces; default:
    auto by backend (same convention as the crop and JV kernels)."""
    import os

    flag = os.environ.get("YDT_LETTERBOX_PALLAS", "auto")
    if flag == "0":
        return False
    if flag == "1":
        return True
    try:
        return jax.default_backend() not in ("cpu", "gpu")
    except Exception:
        return False
