"""Fused letterbox preprocessor as a Pallas TPU kernel.

North-star item (BASELINE.json: "host-side video decode feeds a fused
letterbox-resize/pad/normalize Pallas preprocessor"). The XLA letterbox
(ops/letterbox.py) first materializes the padded square frame in HBM
(1920x1920x3 for 1080p) and then resizes; this kernel streams each source
row band HBM -> VMEM exactly once via manual async DMA, never materializes
the padded image, and emits normalized float output directly:

  * grid over output row tiles; each tile's source row band start is a
    scalar-prefetch operand driving a dynamic-slice DMA from the HBM frame,
  * inside the kernel both interpolation contractions run on the MXU:
    rows:  (TILE, BAND) @ (BAND, W*3)   -- per-tile row weights
    cols:  (TILE*3, W) @ (W, S)         -- shared column-weight matrix
  * uint8 -> float conversion, /255 scaling and zero padding are fused into
    the weight matrices (taps landing in the pad region have zero weight).

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
    h, w = int(frame_rgb.shape[0]), int(frame_rgb.shape[1])
    top, _, left, _ = _pad_amounts(h, w)
    side = max(h, w)
    assert size % tile == 0, (size, tile)
    n_tiles = size // tile

    wy_full = _weights_1d(h, top, side, size)  # (S, H)
    wx_full = _weights_1d(w, left, side, size)  # (S, W)

    # per output row tile: static-size source row band [start, start+band_len)
    band_len = min(int(np.ceil(tile * side / size)) + 2, h)
    nz = wy_full > 0
    band_starts = []
    for t in range(n_tiles):
        rows = nz[t * tile : (t + 1) * tile]
        idx = np.where(rows.any(axis=0))[0]
        start = int(idx[0]) if len(idx) else 0
        band_starts.append(min(start, h - band_len))
    band_starts = np.asarray(band_starts, np.int32)

    wy_tiles = np.zeros((n_tiles, tile, band_len), np.float32)
    for t in range(n_tiles):
        s0 = band_starts[t]
        wy_tiles[t] = wy_full[t * tile : (t + 1) * tile, s0 : s0 + band_len]
    wy_tiles /= 255.0  # fold the uint8 scale into the row weights

    def kernel(starts_ref, frame_hbm, wy_ref, wx_ref, out_ref, band_vmem, sem):
        t = pl.program_id(0)
        start = starts_ref[t]
        dma = pltpu.make_async_copy(
            frame_hbm.at[pl.ds(start, band_len)], band_vmem, sem
        )
        dma.start()
        dma.wait()
        band = band_vmem[...].astype(jnp.float32)  # (band, W, 3)
        bw3 = band.reshape(band_len, w * 3)
        rows = jnp.dot(wy_ref[0], bw3, preferred_element_type=jnp.float32)
        rows = rows.reshape(tile, w, 3).transpose(0, 2, 1).reshape(tile * 3, w)
        cols = jnp.dot(rows, wx_ref[...], preferred_element_type=jnp.float32)
        out_ref[...] = cols.reshape(tile, 3, size).transpose(0, 2, 1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # frame stays in HBM
            pl.BlockSpec(
                (1, tile, band_len), lambda t, starts: (t, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (w, size), lambda t, starts: (0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (tile, size, 3), lambda t, starts: (t, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((band_len, w, 3), jnp.uint8),
            pltpu.SemaphoreType.DMA,
        ],
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((size, size, 3), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(jnp.asarray(band_starts), frame_rgb, jnp.asarray(wy_tiles),
      jnp.asarray(wx_full.T))
