"""Torch-replica cross-check of the FULL detector (VERDICT round-3 item 6).

The numpy oracle (specs/model_np.py) and the JAX implementation share an
author, so their agreement cannot catch a shared misunderstanding of the
reference semantics. This tier rebuilds the Darknet forward from the same
cfg plan with TORCH primitives -- Conv2d + BatchNorm2d(eps=1e-5) in eval
mode, LeakyReLU(0.1)/Mish, MaxPool2d (incl. the k2s1 ZeroPad2d((0,1,0,1))
special case), nearest Upsample, route cat/groups, shortcut adds, and the
Appendix-C decode -- loads the SAME raw darknet-layout weights, and diffs
every layer against ``network_apply(capture_all_layers=True)`` at f32.

Reference contract: SURVEY.md section 2.3 module builder + Appendix C/E
(yolo3/models.py:~15-360). Weights come from the synthetic
well-conditioned .weights generator so deep activations stay finite and
the per-layer rel-err is meaningful.
"""

import io

import numpy as np
import pytest

torch = pytest.importorskip("torch")
jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402
import torch.nn as nn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

from specs.weights_np import random_darknet_weights  # noqa: E402
from yolo_deepsort_tpu.cfg.architectures import ARCHITECTURES  # noqa: E402
from yolo_deepsort_tpu.models import weights as W  # noqa: E402
from yolo_deepsort_tpu.models.darknet import build_network, network_apply  # noqa: E402


def _torch_decode(raw_nchw, anchors, num_classes, img_dim, scale_x_y):
    """Appendix-C decode in torch (reference YOLOLayer.forward ordering:
    anchor-major, row-major grid)."""
    n, ch, g, _ = raw_nchw.shape
    a = len(anchors)
    c = num_classes
    stride = img_dim / g
    pred = raw_nchw.view(n, a, 5 + c, g, g).permute(0, 1, 3, 4, 2)
    grid_x = torch.arange(g, dtype=torch.float32).view(1, 1, 1, g)
    grid_y = torch.arange(g, dtype=torch.float32).view(1, 1, g, 1)
    anc = torch.tensor(anchors, dtype=torch.float32)
    sxy = float(scale_x_y)
    sig = torch.sigmoid(pred[..., 0:2]) * sxy - 0.5 * (sxy - 1.0)
    bx = (sig[..., 0] + grid_x) * stride
    by = (sig[..., 1] + grid_y) * stride
    bw = torch.exp(pred[..., 2]) * anc[:, 0].view(1, a, 1, 1)
    bh = torch.exp(pred[..., 3]) * anc[:, 1].view(1, a, 1, 1)
    conf_cls = torch.sigmoid(pred[..., 4:])
    out = torch.cat(
        [torch.stack([bx, by, bw, bh], dim=-1), conf_cls], dim=-1)
    return out.reshape(n, a * g * g, 5 + c)


class _Mish(nn.Module):
    def forward(self, x):
        return x * torch.tanh(F.softplus(x))


def _build_torch_modules(plan, raw):
    """nn.ModuleList mirroring the cfg plan, loaded from raw darknet-layout
    params (OIHW conv weights + BN vectors -- torch's native layout)."""
    defs = plan.defs()
    mods = nn.ModuleList()
    out_ch = []
    prev_c = 3
    for i, mdef in enumerate(defs):
        t = mdef["type"]
        m = nn.Identity()
        c = prev_c
        if t == "convolutional":
            bn = int(mdef.get("batch_normalize", 0))
            k = int(mdef["size"])
            stride = int(mdef.get("stride", 1))
            pad = (k - 1) // 2 if int(mdef.get("pad", 0)) else 0
            oc = int(mdef["filters"])
            conv = nn.Conv2d(prev_c, oc, k, stride, pad, bias=not bn)
            layer = raw[i]
            with torch.no_grad():
                conv.weight.copy_(torch.from_numpy(
                    np.asarray(layer["conv_weight"])))
                seq = [conv]
                if bn:
                    b = nn.BatchNorm2d(oc, momentum=0.9, eps=1e-5)
                    b.weight.copy_(torch.from_numpy(
                        np.asarray(layer["bn_weight"])))
                    b.bias.copy_(torch.from_numpy(
                        np.asarray(layer["bn_bias"])))
                    b.running_mean.copy_(torch.from_numpy(
                        np.asarray(layer["bn_mean"])))
                    b.running_var.copy_(torch.from_numpy(
                        np.asarray(layer["bn_var"])))
                    seq.append(b)
                else:
                    conv.bias.copy_(torch.from_numpy(
                        np.asarray(layer["conv_bias"])))
            act = mdef.get("activation", "linear")
            if act == "leaky":
                seq.append(nn.LeakyReLU(0.1))
            elif act == "mish":
                seq.append(_Mish())
            m = nn.Sequential(*seq)
            c = oc
        elif t == "maxpool":
            k = int(mdef["size"])
            stride = int(mdef["stride"])
            if k == 2 and stride == 1:
                m = nn.Sequential(nn.ZeroPad2d((0, 1, 0, 1)),
                                  nn.MaxPool2d(k, stride))
            else:
                m = nn.MaxPool2d(k, stride, padding=(k - 1) // 2)
        elif t == "route":
            layers = [int(l) for l in str(mdef["layers"]).split(",")]
            layers = [l if l >= 0 else i + l for l in layers]
            c = sum(out_ch[l] for l in layers)
            groups = int(mdef.get("groups", 1))
            c //= groups
        elif t == "shortcut":
            frm = int(mdef["from"])
            c = out_ch[i + frm if frm < 0 else frm]
        elif t == "yolo":
            c = prev_c
        mods.append(m)
        out_ch.append(c)
        prev_c = c
    return mods


def _torch_forward_all(plan, mods, x_nchw):
    """Walk the plan like Darknet.forward; return every layer's output
    (NCHW feature maps; decoded (N, boxes, 5+C) for yolo layers)."""
    defs = plan.defs()
    head_specs = {h.module_index: h for h in plan.heads}
    outs = []
    prev = x_nchw
    for i, mdef in enumerate(defs):
        t = mdef["type"]
        if t in ("convolutional", "maxpool", "upsample"):
            out = (mods[i](prev) if t != "upsample" else
                   F.interpolate(prev, scale_factor=int(mdef["stride"]),
                                 mode="nearest"))
        elif t == "route":
            layers = [int(l) for l in str(mdef["layers"]).split(",")]
            layers = [l if l >= 0 else i + l for l in layers]
            parts = [outs[l] for l in layers]
            out = parts[0] if len(parts) == 1 else torch.cat(parts, dim=1)
            groups = int(mdef.get("groups", 1))
            if groups > 1:
                gid = int(mdef.get("group_id", 0))
                gc = out.shape[1] // groups
                out = out[:, gid * gc:(gid + 1) * gc]
        elif t == "shortcut":
            frm = int(mdef["from"])
            out = outs[-1] + outs[i + frm if frm < 0 else frm]
        elif t == "yolo":
            spec = head_specs[i]
            out = _torch_decode(prev, spec.anchors, spec.num_classes,
                                plan.img_size, spec.scale_x_y)
        else:
            raise AssertionError(t)
        outs.append(out)
        prev = out
    return outs


def _run_parity(arch, img_size, tol=2e-3):
    plan = build_network(ARCHITECTURES[arch](img_size=img_size))
    defs = plan.defs()
    payload = random_darknet_weights(defs, seed=7, well_conditioned=True)
    _header, raw = W.load_darknet_weights(payload, defs)
    folded = W.fold_inference_params(raw, defs)

    rng = np.random.default_rng(0)
    x = rng.uniform(0, 1, (1, img_size, img_size, 3)).astype(np.float32)

    _, jax_layers = network_apply(
        plan, jax.tree_util.tree_map(jnp.asarray, folded), jnp.asarray(x),
        compute_dtype=jnp.float32, capture_all_layers=True)

    mods = _build_torch_modules(plan, raw)
    with torch.no_grad():
        for m in mods:
            m.eval()
        torch_layers = _torch_forward_all(
            plan, mods, torch.from_numpy(x.transpose(0, 3, 1, 2)))

    worst = (0.0, -1)
    for i, (mdef, tout) in enumerate(zip(defs, torch_layers)):
        jout = np.asarray(jax_layers[i])
        t_np = tout.numpy()
        if t_np.ndim == 4:  # NCHW feature map -> NHWC
            t_np = t_np.transpose(0, 2, 3, 1)
        assert jout.shape == t_np.shape, (i, mdef["type"], jout.shape,
                                          t_np.shape)
        denom = max(float(np.abs(t_np).max()), 1e-3)
        rel = float(np.abs(jout - t_np).max()) / denom
        if rel > worst[0]:
            worst = (rel, i)
        assert rel < tol, (
            f"layer {i} ({mdef['type']}) rel-err {rel:.2e} vs torch")
    print(f"{arch}@{img_size}: {len(defs)} layers, worst rel-err "
          f"{worst[0]:.2e} at layer {worst[1]}")


def test_torch_parity_tiny416():
    _run_parity("yolov3-tiny", 416)


@pytest.mark.slow
def test_torch_parity_v3_416():
    _run_parity("yolov3", 416)


@pytest.mark.slow
def test_torch_parity_v4_320():
    # exercises mish, route groups, SPP maxpools and scale_x_y against torch
    _run_parity("yolov4", 320)
