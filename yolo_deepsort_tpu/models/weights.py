"""Darknet ``.weights`` binary IO and parameter preparation.

Contract: SURVEY.md section 3.4 + Appendix E.1 (reference: yolo3/models.py
load_darknet_weights:~330 / save_darknet_weights). Oracle: specs/weights_np.py.

The byte stream is the weight-compatibility contract: little-endian header
5 x int32 [major, minor, revision, seen, _], then float32 params for every
[convolutional] layer in cfg order (bn_bias, bn_weight, bn_mean, bn_var,
conv OIHW -- or conv_bias, conv OIHW without BN).

For inference we fold BN into the conv (w' = w * gamma/sqrt(var+eps),
b' = beta - mean * gamma/sqrt(var+eps)) and transpose OIHW -> HWIO (the
TPU-native conv layout); this is mathematically identical to eval-mode
BatchNorm (eps=1e-5, models.py BatchNorm2d).
"""

from __future__ import annotations

import os
from typing import Dict, List, Sequence, Tuple

import numpy as np

BN_EPS = 1e-5

RawParams = Dict[int, Dict[str, np.ndarray]]
InferenceParams = Dict[int, Dict[str, np.ndarray]]


def conv_layer_shapes(
    module_defs: Sequence[dict], in_channels: int = 3
) -> List[Tuple[int, int, int, int, bool]]:
    """(module_index, out_c, in_c, kernel, has_bn) per conv layer, walking the
    channel bookkeeping exactly like create_modules (models.py:~15-95)."""
    output_filters = [in_channels]
    shapes = []
    for i, mdef in enumerate(module_defs):
        t = mdef["type"]
        if t == "convolutional":
            filters = int(mdef["filters"])
            shapes.append(
                (
                    i,
                    filters,
                    output_filters[-1],
                    int(mdef["size"]),
                    bool(int(mdef.get("batch_normalize", 0))),
                )
            )
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
        elif t in ("maxpool", "upsample", "yolo"):
            filters = output_filters[-1]
        else:
            raise ValueError(f"unknown module type {t!r}")
        output_filters.append(filters)
    return shapes


def load_darknet_weights(
    source: str | os.PathLike | bytes,
    module_defs: Sequence[dict],
    in_channels: int = 3,
    cutoff: int | None = None,
) -> Tuple[np.ndarray, RawParams]:
    """Parse a .weights file/bytes into (header, raw params with OIHW convs).

    ``cutoff`` stops loading at that module index (backbone-only checkpoints:
    the reference auto-cuts darknet53.conv.74 at 75)."""
    if isinstance(source, bytes):
        data = source
    else:
        if str(source).endswith("darknet53.conv.74") and cutoff is None:
            cutoff = 75
        with open(source, "rb") as f:
            data = f.read()

    header = np.frombuffer(data[:20], dtype=np.int32).copy()
    weights = np.frombuffer(data[20:], dtype=np.float32)

    params: RawParams = {}
    ptr = 0
    for idx, oc, ic, k, has_bn in conv_layer_shapes(module_defs, in_channels):
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
            f"weight file mismatch: consumed {ptr} of {len(weights)} floats -- "
            "cfg and weights disagree"
        )
    return header, params


def save_darknet_weights(
    path: str | os.PathLike,
    header: np.ndarray,
    params: RawParams,
    module_defs: Sequence[dict],
    in_channels: int = 3,
    cutoff: int | None = None,
) -> None:
    """Serialize raw params back to the .weights byte format."""
    with open(path, "wb") as f:
        f.write(np.asarray(header, dtype=np.int32).tobytes())
        for idx, oc, ic, k, has_bn in conv_layer_shapes(module_defs, in_channels):
            if cutoff is not None and idx >= cutoff:
                break
            layer = params[idx]
            if has_bn:
                for name in ("bn_bias", "bn_weight", "bn_mean", "bn_var"):
                    f.write(np.asarray(layer[name], dtype=np.float32).tobytes())
            else:
                f.write(np.asarray(layer["conv_bias"], dtype=np.float32).tobytes())
            f.write(
                np.asarray(layer["conv_weight"], dtype=np.float32)
                .reshape(oc, ic, k, k)
                .tobytes()
            )


def fold_inference_params(
    raw: RawParams, module_defs: Sequence[dict], in_channels: int = 3
) -> InferenceParams:
    """Fold BN into conv and transpose OIHW -> HWIO. Missing layers (cutoff
    loads) are skipped -- callers must random-init them."""
    out: InferenceParams = {}
    for idx, oc, ic, k, has_bn in conv_layer_shapes(module_defs, in_channels):
        if idx not in raw:
            continue
        layer = raw[idx]
        w = np.asarray(layer["conv_weight"], np.float32)  # OIHW
        if has_bn:
            gamma = np.asarray(layer["bn_weight"], np.float32)
            beta = np.asarray(layer["bn_bias"], np.float32)
            mean = np.asarray(layer["bn_mean"], np.float32)
            var = np.asarray(layer["bn_var"], np.float32)
            scale = gamma / np.sqrt(var + BN_EPS)
            w = w * scale[:, None, None, None]
            b = beta - mean * scale
        else:
            b = np.asarray(layer["conv_bias"], np.float32)
        out[idx] = {"w": np.ascontiguousarray(w.transpose(2, 3, 1, 0)), "b": b}
    return out


def random_raw_params(
    module_defs: Sequence[dict], in_channels: int = 3, seed: int = 0
) -> RawParams:
    """Random raw params (He-ish scaling) for tests and training init."""
    rng = np.random.default_rng(seed)
    params: RawParams = {}
    for idx, oc, ic, k, has_bn in conv_layer_shapes(module_defs, in_channels):
        layer: Dict[str, np.ndarray] = {}
        std = float(np.sqrt(2.0 / (ic * k * k)))
        layer["conv_weight"] = rng.normal(0, std, (oc, ic, k, k)).astype(np.float32)
        if has_bn:
            layer["bn_weight"] = np.ones(oc, np.float32)
            layer["bn_bias"] = np.zeros(oc, np.float32)
            layer["bn_mean"] = np.zeros(oc, np.float32)
            layer["bn_var"] = np.ones(oc, np.float32)
        else:
            layer["conv_bias"] = np.zeros(oc, np.float32)
        params[idx] = layer
    return params


def count_params(module_defs: Sequence[dict], in_channels: int = 3) -> int:
    """Total float count of the .weights payload (excluding the header)."""
    total = 0
    for _, oc, ic, k, has_bn in conv_layer_shapes(module_defs, in_channels):
        total += oc * ic * k * k + (4 * oc if has_bn else oc)
    return total
