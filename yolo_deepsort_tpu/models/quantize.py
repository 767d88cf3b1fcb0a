"""int8 (W8A8) quantization for the ReID embed net.

The embed stage is the ranked perf lever for an int8 MXU path
(docs/ROADMAP.md lever 2: v5e int8 matmul peak is 2x bf16). Before any
kernel is allowed on the serving path, accuracy must gate it
(tools/int8_gate.py): the reference environment has no real
weights/data (zero egress), so the gate trains the net on synthetic
identities in-framework and compares rank-1 / feature fidelity across
f32, bf16 and this int8 path.

Scheme (the standard inference recipe, chosen so a Pallas kernel can
reproduce it exactly with integer MXU ops):
  * weights: per-output-channel symmetric int8, scale = absmax/127 over
    (kh, kw, ci);
  * activations: per-conv-input per-tensor symmetric int8, scale
    calibrated as absmax/127 over a calibration batch;
  * conv accumulates in int32 (lax.conv preferred_element_type), then
    dequantizes with the product scale and adds the f32 bias;
  * the nonlinearity / residual-add / avgpool stay f32 (cheap, VPU).

Everything here is REAL int8 arithmetic, not fake-quant: the accuracy
measured by the gate is exactly what the int8 kernel will produce.

Reference: SURVEY.md section 2.3 ReID Net row (deep_sort/deep/model.py
~1-110) for the graph being quantized.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def _graph(params: Dict, x: jnp.ndarray, conv: Callable) -> jnp.ndarray:
    """The ReID net graph (mirrors reid_apply's default layout) with the
    conv implementation abstracted out. conv(x, p, name, stride, pad) must
    return f32 NHWC. Returns L2-normalized (N, 512) features."""
    out = conv(x, params["stem"], "stem", 1, 1)
    out = jnp.maximum(out, 0.0)
    out = lax.reduce_window(
        out, -jnp.inf, lax.max,
        window_dimensions=(1, 3, 3, 1), window_strides=(1, 2, 2, 1),
        padding=[(0, 0), (1, 1), (1, 1), (0, 0)],
    )
    for li, blocks in enumerate(params["layers"]):
        for bi, block in enumerate(blocks):
            stride = 1
            if block["down"] is not None:
                ci = block["conv1"]["w"].shape[2]
                co = block["conv1"]["w"].shape[3]
                stride = 2 if ci != co else 1
            tag = f"l{li}b{bi}"
            y = conv(out, block["conv1"], f"{tag}c1", stride, 1)
            y = jnp.maximum(y, 0.0)
            y = conv(y, block["conv2"], f"{tag}c2", 1, 1)
            if block["down"] is not None:
                shortcut = conv(out, block["down"], f"{tag}d", stride, 0)
            else:
                shortcut = out
            out = jnp.maximum(y + shortcut, 0.0)
    feat = jnp.mean(out, axis=(1, 2))
    norm = jnp.linalg.norm(feat, axis=1, keepdims=True)
    return feat / jnp.maximum(norm, 1e-12)


def calibrate_reid_act_scales(params: Dict, calib_x: np.ndarray) -> Dict[str, float]:
    """Per-conv-input activation scales (absmax/127) from one f32 forward
    over a calibration batch. calib_x: (N, 128, 64, 3) normalized."""
    scales: Dict[str, float] = {}

    def conv(x, p, name, stride, pad):
        scales[name] = float(jnp.max(jnp.abs(x))) / 127.0
        out = lax.conv_general_dilated(
            x, jnp.asarray(p["w"], jnp.float32),
            window_strides=(stride, stride),
            padding=[(pad, pad), (pad, pad)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return out + jnp.asarray(p["b"])[None, None, None, :]

    _graph(params, jnp.asarray(calib_x, jnp.float32), conv)
    return {k: max(v, 1e-12) for k, v in scales.items()}


def quantize_reid_params(params: Dict, calib_x: np.ndarray) -> Dict:
    """Folded f32 params -> int8 package {wq, wscale, b, xscale} per conv.
    wq is HWIO int8; wscale is per-output-channel f32."""
    if "dense" in params:
        raise ValueError("original_model.py layout is not on the int8 path")
    act = calibrate_reid_act_scales(params, calib_x)

    def qconv(p, name):
        w = np.asarray(p["w"], np.float32)
        wscale = np.abs(w).reshape(-1, w.shape[3]).max(0) / 127.0
        wscale = np.maximum(wscale, 1e-12).astype(np.float32)
        wq = np.clip(np.rint(w / wscale), -127, 127).astype(np.int8)
        return {"wq": wq, "wscale": wscale,
                "b": np.asarray(p["b"], np.float32),
                "xscale": np.float32(act[name])}

    out: Dict = {"stem": qconv(params["stem"], "stem"), "layers": []}
    for li, blocks in enumerate(params["layers"]):
        qblocks = []
        for bi, block in enumerate(blocks):
            tag = f"l{li}b{bi}"
            qblocks.append({
                "conv1": qconv(block["conv1"], f"{tag}c1"),
                "conv2": qconv(block["conv2"], f"{tag}c2"),
                "down": (qconv(block["down"], f"{tag}d")
                         if block["down"] is not None else None),
            })
        out["layers"].append(qblocks)
    return out


def _int8_conv(x_f32, qp, stride, pad,
               conv_impl: Optional[Callable] = None):
    """Quantize input, integer conv with int32 accumulation, dequantize.
    conv_impl lets a Pallas kernel slot in under identical semantics."""
    xscale = qp["xscale"]
    xq = jnp.clip(jnp.round(x_f32 / xscale), -127, 127).astype(jnp.int8)
    if conv_impl is not None:
        acc = conv_impl(xq, qp["wq"], stride, pad)
    else:
        acc = lax.conv_general_dilated(
            xq, jnp.asarray(qp["wq"]),
            window_strides=(stride, stride),
            padding=[(pad, pad), (pad, pad)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32,
        )
    scale = (xscale * jnp.asarray(qp["wscale"]))[None, None, None, :]
    return acc.astype(jnp.float32) * scale + jnp.asarray(qp["b"])[
        None, None, None, :]


def reid_apply_int8(qparams: Dict, x: jnp.ndarray,
                    conv_impl: Optional[Callable] = None) -> jnp.ndarray:
    """int8 forward: (N, 128, 64, 3) normalized f32 -> (N, 512) L2-normed.
    Weight-layout keys differ from reid_apply's, so _graph's shape probe
    reads wq."""

    def conv(xf, qp, name, stride, pad):
        del name
        return _int8_conv(xf.astype(jnp.float32), qp, stride, pad,
                          conv_impl=conv_impl)

    # _graph probes block["conv1"]["w"].shape for the stride rule; give the
    # quantized dict a 'w' view of the same shape
    def with_w(qp):
        return None if qp is None else {**qp, "w": qp["wq"]}

    view = {
        "stem": with_w(qparams["stem"]),
        "layers": [[{"conv1": with_w(b["conv1"]),
                     "conv2": with_w(b["conv2"]),
                     "down": with_w(b["down"])} for b in blocks]
                   for blocks in qparams["layers"]],
    }
    return _graph(view, x, conv)


def reid_apply_f32_via_graph(params: Dict, x: jnp.ndarray,
                             compute_dtype=jnp.float32) -> jnp.ndarray:
    """Float twin of reid_apply_int8 through the same _graph walker --
    the A/B control for the gate (any walker bug shows up as f32-vs-f32
    disagreement with models.reid.reid_apply, tested)."""

    def conv(xf, p, name, stride, pad):
        del name
        out = lax.conv_general_dilated(
            xf.astype(compute_dtype), jnp.asarray(p["w"], compute_dtype),
            window_strides=(stride, stride),
            padding=[(pad, pad), (pad, pad)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        )
        return out + jnp.asarray(p["b"], jnp.float32)[None, None, None, :]

    return _graph(params, x, conv)
