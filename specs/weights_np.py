"""Numpy oracle for the darknet ``.weights`` binary format.

Contract: SURVEY.md Appendix E.1 (reference: yolo3/models.py
load_darknet_weights:~330 / save_darknet_weights).

Layout (little-endian):
  header: 5 x int32 = [major, minor, revision, seen, _]
  then raw float32, only for [convolutional] layers, in cfg order:
    with batch_normalize: bn_bias[oc], bn_weight[oc], bn_mean[oc], bn_var[oc],
                          conv_weight[oc*ic*k*k]   (no conv bias)
    without:              conv_bias[oc], conv_weight[oc*ic*k*k]
  conv_weight is OIHW row-major.
"""

from __future__ import annotations

import io
from typing import Dict, Sequence

import numpy as np


def conv_layer_shapes(module_defs: Sequence[dict], in_channels: int = 3):
    """Walk module_defs (cfg-parser output, '[net]' excluded) tracking channel
    counts, yielding (module_index, out_c, in_c, k, has_bn) per conv layer.

    Handles route (incl. v4 groups) / shortcut / upsample / maxpool / yolo
    channel bookkeeping the same way create_modules does (models.py:~15-95).
    """
    output_filters = [in_channels]
    shapes = []
    for i, mdef in enumerate(module_defs):
        t = mdef["type"]
        if t == "convolutional":
            bn = int(mdef.get("batch_normalize", 0))
            filters = int(mdef["filters"])
            k = int(mdef["size"])
            shapes.append((i, filters, output_filters[-1], k, bool(bn)))
        elif t in ("maxpool", "upsample"):
            filters = output_filters[-1]
        elif t == "route":
            layers = [int(x) for x in str(mdef["layers"]).split(",")]
            filters = sum(
                output_filters[l + 1 if l >= 0 else len(output_filters) + l]
                for l in layers
            )
            groups = int(mdef.get("groups", 1))
            if groups > 1:
                filters //= groups
        elif t == "shortcut":
            frm = int(mdef["from"])
            filters = output_filters[frm + 1 if frm >= 0 else len(output_filters) + frm]
        elif t == "yolo":
            filters = output_filters[-1]
        else:
            raise ValueError(f"unknown module type {t!r}")
        if t == "convolutional":
            filters = int(mdef["filters"])
        output_filters.append(filters)
    return shapes


def read_darknet_weights(
    data: bytes, module_defs: Sequence[dict], in_channels: int = 3, cutoff: int | None = None
):
    """Parse a .weights byte string.

    Returns (header, params) where header is the 5 int32s and params is a dict
    module_index -> {'conv_weight': OIHW, 'conv_bias'?, 'bn_bias', 'bn_weight',
    'bn_mean', 'bn_var'}.
    """
    buf = np.frombuffer(data, dtype=np.uint8)
    header = np.frombuffer(buf[:20].tobytes(), dtype=np.int32).copy()
    weights = np.frombuffer(buf[20:].tobytes(), dtype=np.float32)

    params: Dict[int, Dict[str, np.ndarray]] = {}
    ptr = 0
    for n, (idx, oc, ic, k, has_bn) in enumerate(
        conv_layer_shapes(module_defs, in_channels)
    ):
        if cutoff is not None and idx >= cutoff:
            break
        layer: Dict[str, np.ndarray] = {}
        if has_bn:
            for name in ("bn_bias", "bn_weight", "bn_mean", "bn_var"):
                layer[name] = weights[ptr : ptr + oc].copy()
                ptr += oc
        else:
            layer["conv_bias"] = weights[ptr : ptr + oc].copy()
            ptr += oc
        nw = oc * ic * k * k
        layer["conv_weight"] = weights[ptr : ptr + nw].reshape(oc, ic, k, k).copy()
        ptr += nw
        params[idx] = layer
    if cutoff is None and ptr != len(weights):
        raise ValueError(
            f"weight file size mismatch: consumed {ptr} of {len(weights)} floats"
        )
    return header, params


def write_darknet_weights(
    header: np.ndarray,
    params: Dict[int, Dict[str, np.ndarray]],
    module_defs: Sequence[dict],
    in_channels: int = 3,
) -> bytes:
    """Serialize params back to the .weights byte format (save_darknet_weights)."""
    out = io.BytesIO()
    out.write(np.asarray(header, dtype=np.int32).tobytes())
    for idx, oc, ic, k, has_bn in conv_layer_shapes(module_defs, in_channels):
        layer = params[idx]
        if has_bn:
            for name in ("bn_bias", "bn_weight", "bn_mean", "bn_var"):
                out.write(np.asarray(layer[name], dtype=np.float32).tobytes())
        else:
            out.write(np.asarray(layer["conv_bias"], dtype=np.float32).tobytes())
        out.write(
            np.asarray(layer["conv_weight"], dtype=np.float32)
            .reshape(oc, ic, k, k)
            .tobytes()
        )
    return out.getvalue()


def random_darknet_weights(
    module_defs: Sequence[dict], in_channels: int = 3, seed: int = 0,
    well_conditioned: bool = False,
) -> bytes:
    """Synthesize a random-but-valid .weights blob for round-trip/parity tests.

    well_conditioned=True scales conv weights by 1/sqrt(fan_in) so
    activations stay O(1) through deep nets — without it, layer-wise gain
    compounds and the yolo exp() decode overflows f32, which makes
    per-layer parity diffs degenerate (inf/nan vs inf/nan proves nothing
    about weight layout)."""
    rng = np.random.default_rng(seed)
    params: Dict[int, Dict[str, np.ndarray]] = {}
    for idx, oc, ic, k, has_bn in conv_layer_shapes(module_defs, in_channels):
        layer: Dict[str, np.ndarray] = {}
        if has_bn:
            b_std, w_std = (0.1, 0.1) if well_conditioned else (0.5, 0.3)
            layer["bn_bias"] = rng.normal(0, b_std, oc).astype(np.float32)
            layer["bn_weight"] = rng.normal(1, w_std, oc).astype(np.float32)
            layer["bn_mean"] = rng.normal(0, b_std, oc).astype(np.float32)
            layer["bn_var"] = rng.uniform(0.5, 2.0, oc).astype(np.float32)
        else:
            layer["conv_bias"] = rng.normal(0, 0.1 if well_conditioned
                                            else 0.5, oc).astype(np.float32)
        w_sigma = (ic * k * k) ** -0.5 if well_conditioned else 0.2
        layer["conv_weight"] = (
            rng.normal(0, w_sigma, (oc, ic, k, k)).astype(np.float32)
        )
        params[idx] = layer
    header = np.array([0, 2, 0, 0, 0], dtype=np.int32)
    return write_darknet_weights(header, params, module_defs, in_channels)
