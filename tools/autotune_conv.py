"""Per-shape conv autotune: XLA vs Pallas-bf16 vs Pallas-int8 on this chip.

The round-4 detect-stage A/B showed the all-or-nothing Pallas conv routing
measuring NEGATIVE (153.5 vs 141.7 ms/chunk at 8x1080p): some backbone
shape classes lose to XLA's conv even though others win. This tool times
every eligible conv shape of a model in isolation (at the scan-step batch),
picks the per-layer winner, and emits a routing whitelist consumable by
ops/pallas_conv.make_backbone_conv_impl(layer_whitelist=...).

Usage (TPU):
    python tools/autotune_conv.py --model yolov3 --img-size 416 --batch 8 \
        [--out tuned/conv_whitelist_yolov3_416_b8.json]

Output: one JSON line per shape class (ms per route, winner, projected
stage savings) plus the whitelist file {"bf16": [idx...], "int8": [idx...]}.

CAVEAT (measured, round 4): isolated per-shape wins do NOT necessarily
compose inside the scanned aggregate step -- the whitelist measured -13%
there while winning the K=1 single-dispatch step by 10.4 ms same-day
(docs/ROADMAP.md). Always confirm with the same-graph A/B (bench.py
--backbone-conv whitelist vs off) before changing serving defaults; the
tuned file's natural consumer is the K=1 latency path, whose dispatch
batch is exactly the shape this tool times.

Reference parity anchor: SURVEY.md section 2.3 module builder
(yolo3/models.py:~90-160); this changes scheduling only, never topology.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="yolov3")
    p.add_argument("--img-size", type=int, default=416)
    p.add_argument("--batch", type=int, default=8,
                   help="per-dispatch batch (scan-step batch = streams)")
    p.add_argument("--steps", type=int, default=30)
    p.add_argument("--margin", type=float, default=0.03,
                   help="relative win needed before a Pallas route is "
                        "whitelisted (hysteresis against noise)")
    p.add_argument("--out", default=None,
                   help="whitelist JSON path (default: tuned/conv_whitelist_"
                        "{model}_{img}_b{batch}.json)")
    args = p.parse_args()

    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          os.path.join(os.path.dirname(os.path.dirname(
                              os.path.abspath(__file__))), ".jax_cache"))

    import jax
    import jax.numpy as jnp
    import numpy as np

    from yolo_deepsort_tpu.cfg.architectures import ARCHITECTURES
    from yolo_deepsort_tpu.models import weights as W
    from yolo_deepsort_tpu.models.darknet import build_network, network_apply
    from yolo_deepsort_tpu.ops.pallas_conv import (
        backbone_conv_eligible,
        conv_mxu_bf16,
        conv_mxu_int8,
    )

    plan = build_network(ARCHITECTURES[args.model](img_size=args.img_size))
    rng = np.random.default_rng(0)
    raw = W.random_raw_params(plan.defs(), seed=0)
    params = W.fold_inference_params(raw, plan.defs())

    # --- collect eligible conv sites by tracing shapes through the net
    sites = []  # (layer_idx, hi, wi, ci, co, k, stride, act)

    def probe_impl(x, w, b, stride, pad, act, layer_idx):
        hi, wi, ci = int(x.shape[1]), int(x.shape[2]), int(x.shape[3])
        k, co = int(w.shape[0]), int(w.shape[3])
        if pad == (k - 1) // 2 and backbone_conv_eligible(
                hi, wi, ci, co, k, stride, act):
            sites.append((layer_idx, hi, wi, ci, co, k, stride, act))
        return None

    dummy = jnp.zeros((1, args.img_size, args.img_size, 3), jnp.bfloat16)
    jax.eval_shape(
        lambda pr, x: network_apply(plan, pr, x, compute_dtype=jnp.bfloat16,
                                    conv_impl=probe_impl),
        params, dummy)

    interpret = jax.default_backend() != "tpu"
    if interpret:
        print("WARNING: not on TPU; timings are interpret-mode and "
              "meaningless for routing", file=sys.stderr)

    def bench(fn, *xs):
        out = fn(*xs)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(args.steps):
            out = fn(*xs)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / args.steps * 1e3

    # group sites by shape signature
    groups = {}
    for site in sites:
        groups.setdefault(site[1:], []).append(site[0])

    import functools

    @functools.partial(jax.jit, static_argnames=("stride", "pad", "act"))
    def xla_conv(x, w, b, *, stride, pad, act):
        y = jax.lax.conv_general_dilated(
            x, w.astype(jnp.bfloat16), (stride, stride),
            [(pad, pad), (pad, pad)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)
        y = y + b[None, None, None, :]
        if act == "leaky":
            y = jnp.where(y > 0, y, 0.1 * y)
        elif act == "mish":
            y = y * jnp.tanh(jnp.logaddexp(0.0, y))
        return y.astype(jnp.bfloat16)

    n = args.batch
    wl_bf16, wl_int8 = [], []
    rows = []
    for (hi, wi, ci, co, k, stride, act), idxs in sorted(groups.items()):
        x = jnp.asarray(rng.normal(0, 1, (n, hi, wi, ci)), jnp.bfloat16)
        w = jnp.asarray(rng.normal(0, 0.05, (k, k, ci, co)), jnp.bfloat16)
        b = jnp.asarray(rng.normal(0, 0.1, (co,)), jnp.float32)
        wq = jnp.asarray(rng.integers(-127, 128, (k, k, ci, co)), jnp.int8)
        scale = jnp.full((co,), 1e-4, jnp.float32)
        xinv = jnp.float32(25.0)
        pad = (k - 1) // 2

        t_xla = bench(lambda x_: xla_conv(x_, w, b, stride=stride, pad=pad,
                                          act=act), x)
        t_bf16 = bench(lambda x_: conv_mxu_bf16(
            x_, w, b, stride=stride, pad=pad, act=act,
            interpret=interpret), x)
        t_int8 = bench(lambda x_: conv_mxu_int8(
            x_, wq, b, scale, xinv, stride=stride, pad=pad, act=act,
            interpret=interpret), x)

        best = min(t_xla, t_bf16, t_int8)
        winner = ("xla" if best == t_xla
                  else "bf16" if best == t_bf16 else "int8")
        # hysteresis: only reroute when the Pallas win clears the margin
        if t_int8 < t_xla * (1 - args.margin) and t_int8 <= t_bf16:
            wl_int8.extend(idxs)
        elif t_bf16 < t_xla * (1 - args.margin):
            wl_bf16.extend(idxs)
        row = {
            "shape": f"{hi}x{wi}x{ci}->{co} k{k}s{stride} {act}",
            "layers": len(idxs),
            "xla_ms": round(t_xla, 3),
            "pl_bf16_ms": round(t_bf16, 3),
            "pl_int8_ms": round(t_int8, 3),
            "winner": winner,
            "idxs": idxs,
        }
        rows.append(row)
        print(json.dumps(row), flush=True)

    tot_xla = sum(r["xla_ms"] * r["layers"] for r in rows)
    tot_best = sum(min(r["xla_ms"], r["pl_bf16_ms"], r["pl_int8_ms"])
                   * r["layers"] for r in rows)
    out_path = args.out or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tuned", f"conv_whitelist_{args.model}_{args.img_size}_b{n}.json")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    wl = {"model": args.model, "img_size": args.img_size, "batch": n,
          "backend": jax.default_backend(),
          "margin": args.margin,
          "bf16": sorted(wl_bf16), "int8": sorted(wl_int8)}
    with open(out_path, "w") as f:
        json.dump(wl, f, indent=1)
    print(json.dumps({
        "eligible_layers": len(sites),
        "xla_all_ms": round(tot_xla, 2),
        "best_mix_ms": round(tot_best, 2),
        "projected_saving_pct": round(100 * (1 - tot_best / tot_xla), 1)
        if tot_xla else 0.0,
        "whitelist_bf16": len(wl_bf16),
        "whitelist_int8": len(wl_int8),
        "out": out_path,
    }))


if __name__ == "__main__":
    main()
