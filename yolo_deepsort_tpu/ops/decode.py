"""YOLO detection-head decode, vectorized on-chip.

Contract: SURVEY.md Appendix C (reference: yolo3/models.py YOLOLayer
forward:~120-250). Oracle: specs/decode_np.py.

Operates on NHWC feature maps (the TPU-native layout). Box-axis ordering of
the output matches the reference exactly (anchor-major, then row-major grid)
so downstream NMS tie-breaking is comparable.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp


def yolo_decode(
    raw_nhwc: jnp.ndarray,
    anchors: Sequence[Tuple[float, float]],
    num_classes: int,
    img_dim: int,
    scale_x_y: float = 1.0,
) -> jnp.ndarray:
    """Decode one YOLO head.

    Args:
      raw_nhwc: (N, G, G, A*(5+C)) raw conv output; channel layout is
        anchor-major blocks of [tx, ty, tw, th, to, classes...].
      anchors: A mask-selected (pw, ph) pairs in input-image pixels.
      num_classes: C.
      img_dim: network input size S; stride = S / G.
      scale_x_y: YOLOv4 center-scaling (cfg ``scale_x_y``); 1.0 = v3 behavior
        ``bx = sigmoid(tx) + cx``; otherwise
        ``bx = scale*sigmoid(tx) - 0.5*(scale-1) + cx``.

    Returns:
      (N, A*G*G, 5+C) float32: (cx, cy, w, h) in input-image pixels,
      sigmoided objectness + class scores.
    """
    n, g, g2, ch = raw_nhwc.shape
    a = len(anchors)
    c = num_classes
    assert g == g2 and ch == a * (5 + c), (raw_nhwc.shape, a, c)
    stride = img_dim / g

    pred = raw_nhwc.reshape(n, g, g, a, 5 + c)

    grid_x = jnp.arange(g, dtype=jnp.float32)[None, None, :, None]
    grid_y = jnp.arange(g, dtype=jnp.float32)[None, :, None, None]
    anchors_arr = jnp.asarray(anchors, dtype=jnp.float32)  # (A, 2) pixels

    xy = jnp.asarray(pred[..., 0:2], jnp.float32)
    sxy = jnp.asarray(scale_x_y, jnp.float32)
    sig_xy = jnp.float32(1.0) / (1.0 + jnp.exp(-xy))
    sig_xy = sig_xy * sxy - 0.5 * (sxy - 1.0)
    bx = (sig_xy[..., 0] + grid_x) * stride
    by = (sig_xy[..., 1] + grid_y) * stride
    wh = jnp.exp(jnp.asarray(pred[..., 2:4], jnp.float32))
    bw = wh[..., 0] * anchors_arr[None, None, None, :, 0]
    bh = wh[..., 1] * anchors_arr[None, None, None, :, 1]
    conf_cls = jax_sigmoid(jnp.asarray(pred[..., 4:], jnp.float32))

    out = jnp.concatenate(
        [jnp.stack([bx, by, bw, bh], axis=-1), conf_cls], axis=-1
    )  # (N, G, G, A, 5+C)
    # reference ordering: (N, A, G, G) flattened anchor-major
    out = out.transpose(0, 3, 1, 2, 4).reshape(n, a * g * g, 5 + c)
    return out


def jax_sigmoid(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.float32(1.0) / (1.0 + jnp.exp(-x))
