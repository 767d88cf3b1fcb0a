"""YOLO detection training CLI.

The reference lineage trains darknet detectors with hyperparameters taken
from the cfg's [net] section (learning_rate, burn_in, steps/scales, momentum,
decay -- SURVEY.md Appendix E.2) over ListDataset batches (normalized
``cls cx cy w h`` labels, multiscale, flip augment) with the YOLOLayer loss.
This CLI reproduces that loop in JAX/optax:

  python -m yolo_deepsort_tpu.train.yolo_cli \
      --cfg config/yolov3-tiny.cfg --data train.txt [--pretrained w.weights]
      [--epochs 10] [--batch-size 8] [--ckpt checkpoint/yolo.npz]

Checkpoints are .weights-compatible: training runs on raw (unfolded) params
and ``--export-weights out.weights`` writes a stock darknet file back
(save_darknet_weights), seen-counter included.
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np


def build_optimizer(net_info, lr_override=None):
    import optax

    lr = lr_override or float(net_info.get("learning_rate", 1e-3))
    momentum = float(net_info.get("momentum", 0.9))
    decay = float(net_info.get("decay", 5e-4))
    burn_in = int(net_info.get("burn_in", 0))
    steps = [int(s) for s in str(net_info.get("steps", "")).split(",") if s]
    scales = [float(s) for s in str(net_info.get("scales", "")).split(",") if s]

    def schedule(count):
        import jax.numpy as jnp

        # darknet burn-in: lr * (batch/burn_in)^4, then step decays
        f = jnp.where(
            (burn_in > 0) & (count < burn_in),
            (jnp.maximum(count, 1) / max(burn_in, 1)) ** 4,
            1.0,
        )
        for s, sc in zip(steps, scales):
            f = f * jnp.where(count >= s, sc, 1.0)
        return lr * f

    tx = optax.chain(
        optax.add_decayed_weights(decay),
        optax.sgd(learning_rate=schedule, momentum=momentum),
    )
    return tx


def raw_params_to_train(raw, module_defs):
    """Raw darknet params (OIHW + separate BN) -> trainable pytree with HWIO
    conv weights; BN stats separated out (not trained)."""
    from ..models.weights import conv_layer_shapes

    params, stats = {}, {}
    for idx, oc, ic, k, has_bn in conv_layer_shapes(module_defs):
        layer = raw[idx]
        w = np.ascontiguousarray(
            np.asarray(layer["conv_weight"], np.float32).transpose(2, 3, 1, 0)
        )
        if has_bn:
            params[idx] = {
                "w": w,
                "gamma": np.asarray(layer["bn_weight"], np.float32),
                "beta": np.asarray(layer["bn_bias"], np.float32),
            }
            stats[idx] = {
                "mean": np.asarray(layer["bn_mean"], np.float32),
                "var": np.asarray(layer["bn_var"], np.float32),
            }
        else:
            params[idx] = {"w": w, "b": np.asarray(layer["conv_bias"], np.float32)}
    return params, stats


def train_params_to_raw(params, stats, module_defs):
    from ..models.weights import conv_layer_shapes

    raw = {}
    for idx, oc, ic, k, has_bn in conv_layer_shapes(module_defs):
        p = params[idx]
        w = np.ascontiguousarray(np.asarray(p["w"]).transpose(3, 2, 0, 1))
        if has_bn:
            raw[idx] = {
                "conv_weight": w,
                "bn_weight": np.asarray(p["gamma"]),
                "bn_bias": np.asarray(p["beta"]),
                "bn_mean": np.asarray(stats[idx]["mean"]),
                "bn_var": np.asarray(stats[idx]["var"]),
            }
        else:
            raw[idx] = {"conv_weight": w, "conv_bias": np.asarray(p["b"])}
    return raw


def make_forward_train(plan, bn_update=0.01):
    """Train-mode forward over raw/unfolded params: batch-stat BN, returns
    (raw yolo maps, updated BN stats). ``bn_update=1.0`` makes the returned
    stats the exact batch statistics (used by bench.py to synthesize
    BN-consistent random weights)."""
    import jax.lax as lax
    import jax.numpy as jnp

    from ..models.darknet import _activate, _maxpool, _upsample, _resolve

    defs = plan.defs()

    def forward_train(params, stats, x):
        cache, prev = {}, x
        new_stats = {}
        raw_maps = []
        for i, mdef in enumerate(defs):
            t = mdef["type"]
            if t == "convolutional":
                p = params[i]
                k = int(mdef["size"])
                stride = int(mdef.get("stride", 1))
                pad = (k - 1) // 2 if int(mdef.get("pad", 0)) else 0
                out = lax.conv_general_dilated(
                    prev, jnp.asarray(p["w"]), (stride, stride),
                    [(pad, pad), (pad, pad)],
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    preferred_element_type=jnp.float32,
                )
                if "gamma" in p:
                    mean = jnp.mean(out, axis=(0, 1, 2))
                    var = jnp.mean(jnp.square(out - mean), axis=(0, 1, 2))
                    new_stats[i] = {
                        "mean": (1 - bn_update) * stats[i]["mean"]
                        + bn_update * lax.stop_gradient(mean),
                        "var": (1 - bn_update) * stats[i]["var"]
                        + bn_update * lax.stop_gradient(var),
                    }
                    out = (out - mean) * lax.rsqrt(var + 1e-5) * p["gamma"] + p["beta"]
                else:
                    out = out + p["b"]
                out = _activate(out, mdef.get("activation", "linear"), jnp.float32)
            elif t == "maxpool":
                out = _maxpool(prev, int(mdef["size"]), int(mdef["stride"]))
            elif t == "upsample":
                out = _upsample(prev, int(mdef["stride"]))
            elif t == "route":
                layers = [_resolve(int(l), i) for l in str(mdef["layers"]).split(",")]
                parts = [cache[l] for l in layers]
                out = parts[0] if len(parts) == 1 else jnp.concatenate(parts, -1)
                groups = int(mdef.get("groups", 1))
                if groups > 1:
                    gid = int(mdef.get("group_id", 0))
                    gc = out.shape[-1] // groups
                    out = out[..., gid * gc : (gid + 1) * gc]
            elif t == "shortcut":
                out = cache[i - 1] + cache[_resolve(int(mdef["from"]), i)]
            elif t == "yolo":
                raw_maps.append(prev)
                out = prev
            if i in plan.keep:
                cache[i] = out
            prev = out
        return raw_maps, new_stats

    return forward_train


def make_detection_train_step(plan, tx, bn_update=0.01, box_loss="mse"):
    """Jitted train step over raw/unfolded params with live BN statistics."""
    import jax

    from .yolo_loss import yolo_loss

    forward_train = make_forward_train(plan, bn_update=bn_update)

    def loss_fn(params, stats, images, targets, tmask):
        raw_maps, new_stats = forward_train(params, stats, images)
        total, metrics = yolo_loss(plan, raw_maps, targets, tmask,
                                   box_loss=box_loss)
        return total, (new_stats, metrics)

    def train_step(params, opt_state, stats, images, targets, tmask):
        (loss, (new_stats, metrics)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params, stats, images, targets, tmask)
        updates, opt_state = tx.update(grads, opt_state, params)
        import optax

        params = optax.apply_updates(params, updates)
        # merge updated BN stats over unchanged ones
        stats = {**stats, **new_stats}
        return params, opt_state, stats, loss, metrics

    return train_step


def main():
    import jax
    import jax.numpy as jnp

    from ..cfg import parse_model_config
    from ..models.darknet import build_network
    from ..models.weights import (
        load_darknet_weights,
        random_raw_params,
        save_darknet_weights,
    )
    from ..data.datasets import ListDataset
    from ..utils.checkpoint import load_pytree, restore_like, save_pytree

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--cfg", required=True)
    p.add_argument("--data", required=True, help="list file of training images")
    p.add_argument("--pretrained", default=None,
                   help=".weights init (e.g. darknet53.conv.74)")
    p.add_argument("--epochs", type=int, default=10)
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--img-size", type=int, default=None)
    p.add_argument("--max-targets", type=int, default=64)
    p.add_argument("--lr", type=float, default=None)
    p.add_argument("--ckpt", default="checkpoint/yolo.npz")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--export-weights", default=None)
    p.add_argument("--multiscale", action="store_true")
    p.add_argument("--mosaic", action="store_true",
                   help="YOLOv4-style 4-image mosaic augmentation")
    p.add_argument("--box-loss", default="mse", choices=["mse", "ciou"],
                   help="box regression: per-coordinate MSE (reference "
                        "lineage) or the yolov4-paper CIoU")
    p.add_argument("--log-interval", type=int, default=10)
    args = p.parse_args()

    module_defs = parse_model_config(args.cfg)
    net_info = module_defs[0] if module_defs[0]["type"] == "net" else {}
    plan = build_network(module_defs, img_size=args.img_size)

    raw = random_raw_params(plan.defs())
    if args.pretrained:
        _, loaded = load_darknet_weights(args.pretrained, plan.defs())
        raw.update(loaded)
    params, stats = raw_params_to_train(raw, plan.defs())
    tx = build_optimizer(net_info, args.lr)
    opt_state = tx.init(params)
    seen = 0
    if args.resume and os.path.exists(args.ckpt):
        ck = load_pytree(args.ckpt)
        # restore onto freshly-built templates so optax NamedTuple node types
        # (lost in .npz round trip) come back intact
        params = restore_like(params, ck["params"])
        stats = restore_like(stats, ck["stats"])
        opt_state = restore_like(opt_state, ck["opt_state"])
        seen = int(ck["seen"])
        print(f"resumed at seen={seen}")

    step = jax.jit(make_detection_train_step(plan, tx, box_loss=args.box_loss))
    ds = ListDataset(
        args.data, img_size=plan.img_size, multiscale=args.multiscale,
        max_targets=args.max_targets, mosaic=args.mosaic,
    )
    os.makedirs(os.path.dirname(args.ckpt) or ".", exist_ok=True)

    for epoch in range(args.epochs):
        t0 = time.time()
        for bi, (imgs, targets, tmask, size) in enumerate(
            ds.batches(args.batch_size)
        ):
            params, opt_state, stats, loss, metrics = step(
                params, opt_state, stats, imgs, targets, tmask
            )
            seen += args.batch_size
            if (bi + 1) % args.log_interval == 0:
                m = {k: round(float(v), 3) for k, v in metrics.items()}
                print(f"epoch {epoch} [{bi + 1}] loss {float(loss):.3f} {m} "
                      f"({time.time() - t0:.0f}s)")
        save_pytree(args.ckpt, {
            "params": params, "stats": stats, "opt_state": opt_state,
            "seen": np.int64(seen),
        })
        print(f"epoch {epoch} done, checkpoint -> {args.ckpt}")

    if args.export_weights:
        raw_out = train_params_to_raw(params, stats, plan.defs())
        header = np.array([0, 2, 0, seen, 0], np.int32)
        save_darknet_weights(args.export_weights, header, raw_out, plan.defs())
        print(f"darknet weights -> {args.export_weights}")


if __name__ == "__main__":
    main()
