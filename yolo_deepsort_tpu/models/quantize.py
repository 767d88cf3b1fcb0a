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


# ---------------------------------------------------------------------------
# int8-RESIDENT path: activations stay int8 between convs (stages 2-4),
# requantization fused into each conv's epilogue. This is the dataflow the
# Pallas kernel (ops/pallas_conv_int8.py) implements; the XLA twin here has
# bit-identical rounding semantics so CPU tests pin the kernel exactly.
#
# Differences vs the per-layer path above (both re-gated by int8_gate):
#   * stem + stage 1 run in bf16/f32 (Cin < 128 -- below the int8 MXU tile);
#   * DOWN-block shortcuts are quantized to int8 before the residual add
#     (the per-layer path adds them in f32) -- one extra 8-bit rounding;
#   * identity shortcuts reuse the block input's int8 codes.
# ---------------------------------------------------------------------------


def calibrate_reid_resident_scales(params: Dict, calib_x: np.ndarray) -> Dict:
    """Activation scales for the resident path: per-conv input scales (same
    tensor-absmax rule as calibrate_reid_act_scales) plus per-down-block
    SHORTCUT output scales (the resident path quantizes those too)."""
    scales = calibrate_reid_act_scales(params, calib_x)
    # shortcut outputs: replay the f32 graph recording down-conv outputs
    short: Dict[str, float] = {}

    def conv(x, p, name, stride, pad):
        out = lax.conv_general_dilated(
            x, jnp.asarray(p["w"], jnp.float32),
            window_strides=(stride, stride),
            padding=[(pad, pad), (pad, pad)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + jnp.asarray(p["b"])[None, None, None, :]
        if name.endswith("d"):
            short[name] = max(float(jnp.max(jnp.abs(out))) / 127.0, 1e-12)
        return out

    _graph(params, jnp.asarray(calib_x, jnp.float32), conv)
    return {"act": scales, "short": short}


def quantize_reid_params_resident(params: Dict, calib_x: np.ndarray) -> Dict:
    """Quantized package for the int8-resident path.

    Keeps stem + stage 1 as FLOAT params under "front" (run in bf16) and
    stages 2-4 as int8 conv packages. Every int8 conv carries the combined
    dequant scale and the epilogue's requant scale:
      wq (HWIO int8), scale (Co,) = xscale*wscale, b (Co,),
      oinv = 1/out_scale (out_scale = consumer conv's xscale; the shortcut
      convs use their calibrated output scale; the final conv emits f32 and
      stores oinv = 0 as a sentinel).
    """
    if "dense" in params:
        raise ValueError("original_model.py layout is not on the int8 path")
    cal = calibrate_reid_resident_scales(params, calib_x)
    act, short = cal["act"], cal["short"]

    def qconv(p, name, out_scale):
        w = np.asarray(p["w"], np.float32)
        wscale = np.abs(w).reshape(-1, w.shape[3]).max(0) / 127.0
        wscale = np.maximum(wscale, 1e-12).astype(np.float32)
        wq = np.clip(np.rint(w / wscale), -127, 127).astype(np.int8)
        return {
            "wq": wq,
            "scale": (np.float32(act[name]) * wscale).astype(np.float32),
            "b": np.asarray(p["b"], np.float32),
            "oinv": np.float32(0.0 if out_scale is None else 1.0 / out_scale),
        }

    n_stage = len(params["layers"])
    out: Dict = {
        "front": {"stem": params["stem"], "layers0": params["layers"][0]},
        # the front's f32 output quantizes with stage-2 conv1's input scale
        "in_scale": np.float32(act["l1b0c1"]),
        "layers": [],
    }
    for li in range(1, n_stage):
        blocks = params["layers"][li]
        qblocks = []
        for bi, block in enumerate(blocks):
            tag = f"l{li}b{bi}"
            last = li == n_stage - 1 and bi == len(blocks) - 1
            # the consumer of this block's output: next block's conv1 (and
            # down conv -- same tensor, same absmax, same scale)
            if last:
                nxt = None
            elif bi + 1 < len(blocks):
                nxt = act[f"l{li}b{bi + 1}c1"]
            else:
                nxt = act[f"l{li + 1}b0c1"]
            qblocks.append({
                "conv1": qconv(block["conv1"], f"{tag}c1", act[f"{tag}c2"]),
                "conv2": qconv(block["conv2"], f"{tag}c2", nxt),
                "down": (qconv(block["down"], f"{tag}d", short[f"{tag}d"])
                         if block["down"] is not None else None),
                # residual scales: dequant factor for the shortcut codes
                "res_scale": np.float32(
                    short[f"{tag}d"] if block["down"] is not None
                    else act[f"{tag}c1"]),
            })
        out["layers"].append(qblocks)
    return out


def _xla_conv_int8_resident(xq, qp, stride, pad, relu, out_int8,
                            residual=None, res_scale=None):
    """XLA twin of ops/pallas_conv_int8.conv_int8 -- identical epilogue
    order and rounding, so the two produce the same int8 codes."""
    acc = lax.conv_general_dilated(
        xq, jnp.asarray(qp["wq"]),
        window_strides=(stride, stride),
        padding=[(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    y = acc.astype(jnp.float32) * jnp.asarray(qp["scale"]) + jnp.asarray(
        qp["b"])
    if residual is not None:
        y = y + residual.astype(jnp.float32) * res_scale
    if relu:
        y = jnp.maximum(y, 0.0)
    if out_int8:
        return jnp.clip(jnp.round(y * qp["oinv"]), -127, 127).astype(jnp.int8)
    return y


def reid_apply_int8_resident(
    qparams: Dict,
    x: jnp.ndarray,
    use_pallas: bool = False,
    interpret: bool = False,
    front_dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """int8-resident forward: (N, 128, 64, 3) normalized -> (N, 512)
    L2-normed. Stem + stage 1 in ``front_dtype``; stages 2-4 as fused int8
    convs with int8 activations in between (Pallas kernel on TPU when
    ``use_pallas``; the bit-identical XLA twin otherwise)."""
    from ..models.reid import reid_apply  # shared front would drift; inline

    front = qparams["front"]

    def fconv(xf, p, stride, pad):
        out = lax.conv_general_dilated(
            xf.astype(front_dtype), jnp.asarray(p["w"], front_dtype),
            window_strides=(stride, stride),
            padding=[(pad, pad), (pad, pad)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        )
        return out + jnp.asarray(p["b"], jnp.float32)[None, None, None, :]

    out = jnp.maximum(fconv(x, front["stem"], 1, 1), 0.0)
    out = lax.reduce_window(
        out.astype(front_dtype), -jnp.inf, lax.max,
        window_dimensions=(1, 3, 3, 1), window_strides=(1, 2, 2, 1),
        padding=[(0, 0), (1, 1), (1, 1), (0, 0)],
    )
    for block in front["layers0"]:  # stage 1: 64->64, stride 1, no down
        y = jnp.maximum(fconv(out, block["conv1"], 1, 1), 0.0)
        y = fconv(y, block["conv2"], 1, 1)
        out = jnp.maximum(y + out.astype(jnp.float32), 0.0)

    # quantize once into the resident domain
    tq = jnp.clip(jnp.round(out / qparams["in_scale"]), -127, 127).astype(
        jnp.int8)

    if use_pallas:
        from ..ops.pallas_conv_int8 import conv_int8

        def iconv(xq, qp, stride, pad, relu, out_int8, residual=None,
                  res_scale=None):
            return conv_int8(
                xq, jnp.asarray(qp["wq"]), jnp.asarray(qp["scale"]),
                jnp.asarray(qp["b"]), jnp.asarray(qp["oinv"]),
                residual, None if res_scale is None else jnp.asarray(
                    res_scale, jnp.float32),
                stride=stride, pad=pad, relu=relu, out_int8=out_int8,
                interpret=interpret,
            )
    else:
        iconv = _xla_conv_int8_resident

    n_stages = len(qparams["layers"])
    for li, blocks in enumerate(qparams["layers"]):
        for bi, block in enumerate(blocks):
            last = li == n_stages - 1 and bi == len(blocks) - 1
            down = block["down"]
            stride = 2 if down is not None else 1
            y1 = iconv(tq, block["conv1"], stride, 1, True, True)
            if down is not None:
                shortq = iconv(tq, down, stride, 0, False, True)
            else:
                shortq = tq
            tq = iconv(y1, block["conv2"], 1, 1, True, not last,
                       residual=shortq, res_scale=block["res_scale"])

    feat = jnp.mean(tq, axis=(1, 2))  # final conv emitted f32
    norm = jnp.linalg.norm(feat, axis=1, keepdims=True)
    return feat / jnp.maximum(norm, 1e-12)


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
