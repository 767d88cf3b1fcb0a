"""cfg-driven darknet network construction and forward pass in JAX.

Contract: SURVEY.md sections 2.3 (module builder / Darknet) and 3.2
(reference: yolo3/models.py create_modules:~15-95 + Darknet.forward:~300).
Oracle: specs/model_np.py.

TPU-first design: the cfg walk happens once at BUILD time, producing a static
plan; the forward pass is a Python loop over that plan at TRACE time, so XLA
sees one flat graph of NHWC convolutions (HWIO weights, MXU-friendly),
fused bias/activation, and concatenations -- no per-layer Python in the
compiled step. Only layer outputs actually referenced by a later route /
shortcut are kept alive (memo set computed at build time).

Inference params are BN-folded {idx: {w: HWIO, b: (oc,)}} pytrees from
models/weights.py. Compute dtype is configurable: float32 for parity tests,
bfloat16 for TPU speed (accumulation stays f32 via preferred_element_type).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence, Tuple

import jax.lax as lax
import jax.numpy as jnp
import numpy as np

from ..ops.decode import yolo_decode


@dataclasses.dataclass(frozen=True)
class YoloHeadSpec:
    module_index: int
    anchors: Tuple[Tuple[float, float], ...]  # mask-selected, pixels
    num_classes: int
    scale_x_y: float


@dataclasses.dataclass(frozen=True)
class NetworkPlan:
    """Static description of a darknet network (hashable; closes over jit)."""

    module_defs: Tuple[Tuple[Tuple[str, str], ...], ...]  # frozen dicts
    img_size: int
    in_channels: int
    num_classes: int
    heads: Tuple[YoloHeadSpec, ...]
    keep: frozenset  # module indices whose outputs are referenced later

    def defs(self) -> List[Dict[str, str]]:
        return [dict(items) for items in self.module_defs]


def _resolve(ref: int, current: int) -> int:
    """Relative/absolute layer reference -> absolute module index."""
    return ref if ref >= 0 else current + ref


def build_network(
    module_defs: Sequence[dict], img_size: Optional[int] = None
) -> NetworkPlan:
    """Build a plan from parsed cfg sections (with or without [net])."""
    defs = [dict(d) for d in module_defs]
    net_info: Dict[str, str] = {}
    if defs and defs[0]["type"] == "net":
        net_info = defs.pop(0)
    if img_size is None:
        img_size = int(net_info.get("width", 416))
    in_channels = int(net_info.get("channels", 3))

    keep = set()
    heads = []
    num_classes = 0
    for i, mdef in enumerate(defs):
        t = mdef["type"]
        if t == "route":
            for l in str(mdef["layers"]).split(","):
                keep.add(_resolve(int(l), i))
        elif t == "shortcut":
            keep.add(_resolve(int(mdef["from"]), i))
            keep.add(i - 1)
        elif t == "yolo":
            mask = [int(x) for x in str(mdef["mask"]).split(",")]
            flat = [float(x) for x in str(mdef["anchors"]).split(",")]
            all_anchors = [
                (flat[2 * j], flat[2 * j + 1]) for j in range(len(flat) // 2)
            ]
            num_classes = int(mdef["classes"])
            heads.append(
                YoloHeadSpec(
                    module_index=i,
                    anchors=tuple(all_anchors[m] for m in mask),
                    num_classes=num_classes,
                    scale_x_y=float(mdef.get("scale_x_y", 1.0)),
                )
            )

    frozen = tuple(tuple(sorted(d.items())) for d in defs)
    return NetworkPlan(
        module_defs=frozen,
        img_size=img_size,
        in_channels=in_channels,
        num_classes=num_classes,
        heads=tuple(heads),
        keep=frozenset(keep),
    )


def _conv(x, w, b, stride: int, pad: int, compute_dtype):
    out = lax.conv_general_dilated(
        x.astype(compute_dtype),
        jnp.asarray(w, compute_dtype),
        window_strides=(stride, stride),
        padding=[(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )
    return out + jnp.asarray(b, jnp.float32)[None, None, None, :]


def _activate(x, act: str, compute_dtype):
    if act == "leaky":
        out = jnp.where(x > 0, x, 0.1 * x)
    elif act == "mish":
        out = x * jnp.tanh(jnp.logaddexp(0.0, x))
    elif act in ("linear", ""):
        out = x
    else:
        raise ValueError(f"unknown activation {act!r}")
    return out.astype(compute_dtype)


def _maxpool(x, k: int, stride: int):
    if k == 2 and stride == 1:
        # reference special case: ZeroPad2d((0,1,0,1)) then unpadded pool
        x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
        padding = [(0, 0)] * 4
    else:
        p = (k - 1) // 2
        padding = [(0, 0), (p, p), (p, p), (0, 0)]
    return lax.reduce_window(
        x,
        -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min,
        lax.max,
        window_dimensions=(1, k, k, 1),
        window_strides=(1, stride, stride, 1),
        padding=padding,
    )


def _upsample(x, factor: int):
    return jnp.repeat(jnp.repeat(x, factor, axis=1), factor, axis=2)


def network_apply(
    plan: NetworkPlan,
    params: Dict[int, Dict[str, np.ndarray]],
    x: jnp.ndarray,
    compute_dtype=jnp.float32,
    return_feature_maps: bool = False,
    capture_all_layers: bool = False,
    conv_impl=None,
    block_impl=None,
):
    """Forward pass. x: (N, S, S, 3) NHWC in [0,1].

    Returns decoded detections (N, total_boxes, 5+C) in input-image pixels
    (center format, sigmoided scores) -- the Darknet.forward contract
    (v3-608: 22743 boxes; v3-416: 10647; tiny-416: 2535). With
    ``return_feature_maps`` also returns the raw NHWC head maps (training).

    ``conv_impl(x, w, b, stride, pad, act, layer_idx)`` may claim a conv
    layer (fused conv+bias+activation, e.g. the Pallas MXU kernel in
    ops/pallas_conv.py) by returning its output, or return None to fall
    back to the XLA conv. Numerics contract: bf16 inputs, f32 accumulate,
    same activation math -- parity-tested in tests/test_pallas_conv.py.

    ``block_impl(x, params, layer_idx)`` may claim a SPAN of modules
    starting at layer_idx (e.g. the fused residual-block chains in
    ops/pallas_resblock.py) by returning ``(out, consumed)`` where out is
    the last spanned module's output; the factory guarantees no external
    reference to intermediate outputs (find_residual_spans). Ignored under
    ``capture_all_layers`` (per-layer parity capture needs every output)."""
    defs = plan.defs()
    head_specs = {h.module_index: h for h in plan.heads}
    cache: Dict[int, jnp.ndarray] = {}
    prev = x.astype(compute_dtype)
    yolo_outputs = []
    raw_maps = []
    all_layers = []  # only populated with capture_all_layers (debug/parity)
    if capture_all_layers:
        block_impl = None
    i = 0
    while i < len(defs):
        mdef = defs[i]
        if block_impl is not None:
            res = block_impl(prev, params, i)
            if res is not None:
                out, consumed = res
                last = i + consumed - 1
                if last in plan.keep:
                    cache[last] = out
                prev = out
                i += consumed
                continue
        t = mdef["type"]
        if t == "convolutional":
            p = params[i]
            k = int(mdef["size"])
            stride = int(mdef.get("stride", 1))
            pad = (k - 1) // 2 if int(mdef.get("pad", 0)) else 0
            act = mdef.get("activation", "linear")
            out = None
            if conv_impl is not None:
                out = conv_impl(prev, p["w"], p["b"], stride, pad, act, i)
            if out is None:
                out = _conv(prev, p["w"], p["b"], stride, pad, compute_dtype)
                out = _activate(out, act, compute_dtype)
        elif t == "maxpool":
            out = _maxpool(prev, int(mdef["size"]), int(mdef["stride"]))
        elif t == "upsample":
            out = _upsample(prev, int(mdef["stride"]))
        elif t == "route":
            layers = [_resolve(int(l), i) for l in str(mdef["layers"]).split(",")]
            parts = [cache[l] for l in layers]
            out = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=-1)
            groups = int(mdef.get("groups", 1))
            if groups > 1:
                gid = int(mdef.get("group_id", 0))
                gc = out.shape[-1] // groups
                out = out[..., gid * gc : (gid + 1) * gc]
        elif t == "shortcut":
            out = cache[i - 1] + cache[_resolve(int(mdef["from"]), i)]
        elif t == "yolo":
            spec = head_specs[i]
            raw_maps.append(prev)
            out = yolo_decode(
                prev,
                spec.anchors,
                spec.num_classes,
                plan.img_size,
                spec.scale_x_y,
            )
            yolo_outputs.append(out)
        else:
            raise ValueError(f"unknown module type {t!r}")
        if i in plan.keep:
            cache[i] = out
        if capture_all_layers:
            all_layers.append(out)
        prev = out
        i += 1

    detections = jnp.concatenate(yolo_outputs, axis=1) if yolo_outputs else None
    if capture_all_layers:
        return detections, all_layers
    if return_feature_maps:
        return detections, raw_maps
    return detections
