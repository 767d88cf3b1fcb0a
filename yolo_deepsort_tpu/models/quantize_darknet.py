"""int8 (W8A8) quantization for the detector backbone's deep convs.

Round-3/4 measurements that motivate this (docs/ROADMAP.md): the backbone
runs at ~47% MFU through XLA's bf16 conv, the MXU's int8 matmul path is
~1.56x bf16 in-graph, and XLA's own int8 conv route measured NEGATIVE
twice -- so int8 MACs are only reachable through the hand-written MXU
kernel (ops/pallas_conv.py conv_mxu_int8).

Scheme (same recipe as the gated ReID path, models/quantize.py):
  * weights: per-output-channel symmetric int8, absmax/127 over (kh,kw,ci);
  * activations: per-conv-input per-tensor symmetric int8, calibrated as
    absmax/127 over a calibration batch (quantize fused into the kernel's
    prologue -- the graph keeps bf16 activations between layers, so routes
    / shortcuts / non-eligible layers are untouched);
  * int32 accumulation, per-channel dequant + bias + leaky fused in the
    kernel epilogue.

Only convs passing ops.pallas_conv.backbone_conv_eligible are quantized
(deep layers, Cin/Cout >= 128, spatial <= 64): the early spatially-large
layers contribute little time and are the most quantization-sensitive.

Accuracy gating: tools/int8_gate.py --detector compares f32 vs the int8
path on decoded detections + NMS decisions before the path is allowed on
the serving step (same discipline as the ReID int8 path).

Reference parity anchor: SURVEY.md section 2.3 module builder
(yolo3/models.py:~90-160); arithmetic precision changes only, gated.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from .darknet import NetworkPlan, network_apply
from ..ops.pallas_conv import backbone_conv_eligible


def _layer_geometry(x, w, stride, pad, act):
    hi, wi, ci = int(x.shape[1]), int(x.shape[2]), int(x.shape[3])
    co, k = int(w.shape[3]), int(w.shape[0])
    ok = (pad == (k - 1) // 2) and backbone_conv_eligible(
        hi, wi, ci, co, k, stride, act)
    return ok


def calibrate_darknet_act_scales(
    plan: NetworkPlan, params: Dict, calib_x: np.ndarray,
    pct: float = 100.0,
) -> Dict[int, float]:
    """Per-eligible-conv input activation scales from one f32 forward over
    a calibration batch. calib_x: (N, S, S, 3) in [0,1] (letterboxed
    frames -- use the same content the step will see).

    ``pct``: percentile of |x| mapped to code 127 (activations beyond it
    saturate -- the kernel clamps after rounding). Default absmax
    (pct=100): MEASURED on the random-weight honest-load gate, percentile
    clipping hurts (yolov3-416 xla-twin matched_frac: absmax 0.837 vs
    99.9pct 0.735) -- on that load the detections come from the extreme
    activations, so clipping distorts exactly the rows NMS keeps. Re-sweep
    on real content if weights ever materialize."""
    scales: Dict[int, float] = {}

    def recording_impl(x, w, b, stride, pad, act, layer_idx):
        if _layer_geometry(x, w, stride, pad, act):
            ax = np.abs(np.asarray(x, np.float32))
            amax = float(np.percentile(ax, pct)) if pct < 100 else float(
                ax.max())
            scales[layer_idx] = max(amax / 127.0, 1e-12)
        return None  # always fall back to the XLA conv

    # eager (unjitted) forward so the recording side effect runs
    network_apply(plan, params, jnp.asarray(calib_x, jnp.float32),
                  compute_dtype=jnp.float32, conv_impl=recording_impl)
    return scales


def quantize_darknet_convs(
    plan: NetworkPlan, params: Dict, calib_x: np.ndarray,
    pct: float = 100.0, k3_only: bool = False, layers=None,
) -> Dict[int, Dict[str, np.ndarray]]:
    """Folded f32 params -> int8 packages for every eligible conv:
    {idx: {wq HWIO int8, scale (Co,) f32 = xscale*wscale per channel,
           b (Co,) f32, xinv f32 = 1/xscale}}.
    Layers not in the returned dict stay on the bf16 path.

    ``k3_only`` keeps the 1x1 convs (the residual bottlenecks' cheap half,
    ~10% of the pair's MACs) in bf16: halves the quantized-layer count --
    and so the accumulated drift -- for a ~10% smaller int8 win."""
    act = calibrate_darknet_act_scales(plan, params, calib_x, pct=pct)
    out: Dict[int, Dict[str, np.ndarray]] = {}
    for idx, xscale in act.items():
        if layers is not None and idx not in layers:
            # autotuned routing (ops/pallas_conv.load_conv_whitelist):
            # only package the layers the whitelist sends to the W8A8 route
            continue
        p = params[idx]
        if k3_only and int(np.asarray(p["w"]).shape[0]) != 3:
            continue
        w = np.asarray(p["w"], np.float32)
        co = w.shape[3]
        wscale = np.abs(w).reshape(-1, co).max(0) / 127.0
        wscale = np.maximum(wscale, 1e-12).astype(np.float32)
        wq = np.clip(np.rint(w / wscale), -127, 127).astype(np.int8)
        out[idx] = {
            "wq": wq,
            "scale": (np.float32(xscale) * wscale).astype(np.float32),
            "b": np.asarray(p["b"], np.float32),
            "xinv": np.float32(1.0 / xscale),
        }
    return out


def quantize_darknet_from_frames(
    plan: NetworkPlan, params: Dict, frames: np.ndarray, img_size: int,
    max_frames: int = 2, pct: float = 100.0, k3_only: bool = False,
    layers=None,
) -> Dict[int, Dict[str, np.ndarray]]:
    """Calibrate + package from raw frames (N, H, W, 3) uint8: letterbox to
    the exact detect-stage geometry, then calibrate ON THE HOST CPU --
    calibration runs the forward eagerly (per-op side effects), which
    through a device tunnel would dispatch every op individually."""
    from ..ops.letterbox import letterbox

    params_host = jax.tree_util.tree_map(np.asarray, params)
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        fr = jnp.asarray(np.asarray(frames[:max_frames]))
        xs = np.asarray(jax.vmap(lambda f: letterbox(f, img_size))(fr),
                        np.float32)
        return quantize_darknet_convs(plan, params_host, xs, pct=pct,
                                      k3_only=k3_only, layers=layers)


def make_xla_int8_conv_impl(int8_pkg: Dict[int, Dict]):
    """XLA twin of the Pallas int8 route -- identical arithmetic
    (quantize-in, int8 conv with int32 accumulation, per-channel dequant +
    bias + activation), used by the CPU accuracy gate and semantics tests.
    Non-packaged layers fall back to the XLA bf16 conv."""

    def impl(x, w, b, stride, pad, act, layer_idx):
        qp = int8_pkg.get(layer_idx)
        if qp is None:
            return None
        xq = jnp.clip(
            jnp.round(x.astype(jnp.float32) * qp["xinv"]), -127, 127
        ).astype(jnp.int8)
        acc = lax.conv_general_dilated(
            xq, jnp.asarray(qp["wq"]),
            window_strides=(stride, stride),
            padding=[(pad, pad), (pad, pad)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32,
        )
        y = acc.astype(jnp.float32) * jnp.asarray(qp["scale"])[
            None, None, None, :] + jnp.asarray(qp["b"])[None, None, None, :]
        if act == "leaky":
            y = jnp.where(y > 0, y, 0.1 * y)
        elif act == "mish":  # v4 backbone; matches ops.pallas_conv._apply_act
            y = y * jnp.tanh(jnp.logaddexp(0.0, y))
        return y.astype(jnp.bfloat16)

    return impl
