"""Naive numpy forward pass of a darknet-cfg network, for per-layer parity tests.

Contract: SURVEY.md section 2.3 "Module builder" + section 3.2 (reference:
yolo3/models.py create_modules:~15-95 + Darknet.forward:~300). Slow (direct
convolution) -- only use on tiny configs/images in tests.

Layout is NCHW (like the reference). BN eps = 1e-5 (PyTorch default used by
the reference's BatchNorm2d(momentum=0.9)).
"""

from __future__ import annotations

from typing import Dict, List, Sequence

import numpy as np

from .decode_np import yolo_decode

BN_EPS = 1e-5


def conv2d(x: np.ndarray, w: np.ndarray, stride: int, pad: int) -> np.ndarray:
    """x: (N, C, H, W); w: (O, I, K, K) -> (N, O, H', W'). Zero padding."""
    n, c, h, wd = x.shape
    o, i, k, _ = w.shape
    assert i == c, (i, c)
    xp = np.pad(x, ((0, 0), (0, 0), (pad, pad), (pad, pad)))
    oh = (h + 2 * pad - k) // stride + 1
    ow = (wd + 2 * pad - k) // stride + 1
    # im2col
    cols = np.empty((n, c, k, k, oh, ow), dtype=np.float64)
    for ky in range(k):
        for kx in range(k):
            cols[:, :, ky, kx] = xp[
                :, :, ky : ky + oh * stride : stride, kx : kx + ow * stride : stride
            ]
    cols = cols.reshape(n, c * k * k, oh * ow)
    wm = w.reshape(o, c * k * k)
    out = np.einsum("oc,ncp->nop", wm, cols)
    return out.reshape(n, o, oh, ow)


def batch_norm(x, weight, bias, mean, var, eps=BN_EPS):
    w = weight[None, :, None, None]
    b = bias[None, :, None, None]
    m = mean[None, :, None, None]
    v = var[None, :, None, None]
    return w * (x - m) / np.sqrt(v + eps) + b


def leaky_relu(x, slope=0.1):
    return np.where(x > 0, x, slope * x)


def mish(x):
    # x * tanh(softplus(x)); softplus computed stably.
    sp = np.logaddexp(0.0, x)
    return x * np.tanh(sp)


def maxpool(x: np.ndarray, k: int, stride: int) -> np.ndarray:
    """Darknet maxpool per create_modules: k=2,s=1 gets ZeroPad2d((0,1,0,1));
    otherwise symmetric padding (k-1)//2 with -inf."""
    if k == 2 and stride == 1:
        x = np.pad(x, ((0, 0), (0, 0), (0, 1), (0, 1)), constant_values=0.0)
        pad = 0
    else:
        pad = (k - 1) // 2
        if pad:
            x = np.pad(x, ((0, 0), (0, 0), (pad, pad), (pad, pad)),
                       constant_values=-np.inf)
    n, c, h, w = x.shape
    oh = (h - k) // stride + 1
    ow = (w - k) // stride + 1
    out = np.full((n, c, oh, ow), -np.inf)
    for ky in range(k):
        for kx in range(k):
            out = np.maximum(
                out,
                x[:, :, ky : ky + oh * stride : stride, kx : kx + ow * stride : stride],
            )
    return out


def upsample_nearest(x: np.ndarray, factor: int) -> np.ndarray:
    return x.repeat(factor, axis=2).repeat(factor, axis=3)


def forward(
    module_defs: Sequence[dict],
    params: Dict[int, Dict[str, np.ndarray]],
    x: np.ndarray,
    img_dim: int | None = None,
):
    """Run the network. Returns (detections, layer_outputs).

    detections: concatenated decoded yolo outputs (N, total_boxes, 5+C), or
    None if the net has no yolo layers. layer_outputs: list of per-module
    outputs (NCHW), yolo modules store their decoded output.
    """
    if img_dim is None:
        img_dim = x.shape[2]
    layer_outputs: List[np.ndarray] = []
    yolo_outputs: List[np.ndarray] = []
    for i, mdef in enumerate(module_defs):
        t = mdef["type"]
        if t == "convolutional":
            p = params[i]
            k = int(mdef["size"])
            stride = int(mdef.get("stride", 1))
            pad = (k - 1) // 2 if int(mdef.get("pad", 0)) else 0
            out = conv2d(x if i == 0 else layer_outputs[-1],
                         p["conv_weight"].astype(np.float64), stride, pad)
            if int(mdef.get("batch_normalize", 0)):
                out = batch_norm(
                    out,
                    p["bn_weight"].astype(np.float64),
                    p["bn_bias"].astype(np.float64),
                    p["bn_mean"].astype(np.float64),
                    p["bn_var"].astype(np.float64),
                )
            else:
                out = out + p["conv_bias"].astype(np.float64)[None, :, None, None]
            act = mdef.get("activation", "linear")
            if act == "leaky":
                out = leaky_relu(out)
            elif act == "mish":
                out = mish(out)
            elif act in ("linear", None):
                pass
            else:
                raise ValueError(f"unknown activation {act!r}")
        elif t == "maxpool":
            out = maxpool(layer_outputs[-1], int(mdef["size"]), int(mdef["stride"]))
        elif t == "upsample":
            out = upsample_nearest(layer_outputs[-1], int(mdef["stride"]))
        elif t == "route":
            layers = [int(l) for l in str(mdef["layers"]).split(",")]
            srcs = [layer_outputs[l if l >= 0 else i + l] for l in layers]
            out = np.concatenate(srcs, axis=1)
            groups = int(mdef.get("groups", 1))
            if groups > 1:
                gid = int(mdef.get("group_id", 0))
                gc = out.shape[1] // groups
                out = out[:, gid * gc : (gid + 1) * gc]
        elif t == "shortcut":
            frm = int(mdef["from"])
            out = layer_outputs[-1] + layer_outputs[frm if frm >= 0 else i + frm]
        elif t == "yolo":
            mask = [int(m) for m in str(mdef["mask"]).split(",")]
            all_anchors = [float(a) for a in str(mdef["anchors"]).split(",")]
            all_anchors = [
                (all_anchors[2 * j], all_anchors[2 * j + 1])
                for j in range(len(all_anchors) // 2)
            ]
            anchors = [all_anchors[m] for m in mask]
            num_classes = int(mdef["classes"])
            out = yolo_decode(
                layer_outputs[-1], anchors, num_classes, img_dim,
                scale_x_y=float(mdef.get("scale_x_y", 1.0)),
            )
            yolo_outputs.append(out)
        else:
            raise ValueError(f"unknown module type {t!r}")
        layer_outputs.append(out)
    detections = (
        np.concatenate(yolo_outputs, axis=1) if yolo_outputs else None
    )
    return detections, layer_outputs
