"""Headline benchmark: aggregate 1080p tracking throughput per chip.

Runs the FULL fused per-frame pipeline -- letterbox(1080p) -> YOLOv3-416
backbone+decode (bf16) -> class-aware weighted-merge NMS -> ReID crop+embed
-> DeepSORT association (Kalman, gated cascade, JV assignment) -- batched
over S concurrent streams on one chip, entirely on-device (zero host
round-trips inside the step).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is the fraction of the BASELINE.json north-star target of
500 fps aggregate 1080p tracking per TPU v5e chip (the reference repo
publishes no numbers of its own -- see BASELINE.md).
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="yolov3", choices=["yolov3", "yolov3-tiny", "yolov4"])
    p.add_argument("--img-size", type=int, default=416)
    p.add_argument("--streams", type=int, default=8)
    p.add_argument("--frame-h", type=int, default=1080)
    p.add_argument("--frame-w", type=int, default=1920)
    p.add_argument("--steps", type=int, default=20)
    p.add_argument("--warmup", type=int, default=3)
    p.add_argument("--scan", type=int, default=16,
                   help="frames scanned per device dispatch (1 = per-frame)")
    p.add_argument("--max-dets", type=int, default=64)
    p.add_argument("--f32", action="store_true", help="disable bf16 compute")
    p.add_argument("--no-pallas-letterbox", action="store_true",
                   help="disable the fused Pallas letterbox kernel (default "
                        "on; falls back to XLA automatically if the kernel "
                        "fails to compile)")
    args = p.parse_args()

    # persistent compilation cache: the fused-step compile through the axon
    # remote-compile tunnel can take minutes; cache it across processes
    import os

    os.environ.setdefault(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
    )
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

    import jax
    import jax.numpy as jnp

    from yolo_deepsort_tpu.cfg.architectures import ARCHITECTURES
    from yolo_deepsort_tpu.config import DetectorConfig, TrackerConfig
    from yolo_deepsort_tpu.models import weights as W
    from yolo_deepsort_tpu.models.darknet import build_network
    from yolo_deepsort_tpu.models.reid import random_reid_params
    from yolo_deepsort_tpu.parallel.streams import (
        init_stream_states,
        make_batched_step,
        make_scanned_step,
    )

    plan = build_network(ARCHITECTURES[args.model](img_size=args.img_size))
    det_params = W.fold_inference_params(
        W.random_raw_params(plan.defs(), seed=0), plan.defs()
    )
    reid_params = random_reid_params(seed=0)
    det_cfg = DetectorConfig(img_size=args.img_size, conf_thres=0.5, nms_thres=0.4)
    trk_cfg = TrackerConfig(max_dets=args.max_dets)

    compute_dtype = jnp.float32 if args.f32 else jnp.bfloat16
    k = max(args.scan, 1)

    def build(use_pallas):
        if k > 1:
            return make_scanned_step(
                plan, det_cfg, trk_cfg, (args.frame_h, args.frame_w), k,
                compute_dtype=compute_dtype, use_pallas_letterbox=use_pallas,
            )
        return make_batched_step(
            plan, det_cfg, trk_cfg, (args.frame_h, args.frame_w),
            compute_dtype=compute_dtype, use_pallas_letterbox=use_pallas,
        )

    use_pallas = not args.no_pallas_letterbox
    step = build(use_pallas)

    s = args.streams
    rng = np.random.default_rng(0)
    shape = (k, s) if k > 1 else (s,)
    frames = jnp.asarray(
        rng.integers(
            0, 256, (*shape, args.frame_h, args.frame_w, 3), dtype=np.uint8
        )
    )
    states = init_stream_states(trk_cfg, s)
    det_params = jax.tree_util.tree_map(jnp.asarray, det_params)
    reid_params = jax.tree_util.tree_map(jnp.asarray, reid_params)

    try:
        for _ in range(args.warmup):
            states, (outputs, emit) = step(
                det_params, reid_params, states, frames
            )
        jax.block_until_ready(outputs)
    except Exception:
        if not use_pallas:
            raise
        # Pallas kernel failed on this backend/geometry: fall back to XLA
        step = build(False)
        states = init_stream_states(trk_cfg, s)
        for _ in range(args.warmup):
            states, (outputs, emit) = step(
                det_params, reid_params, states, frames
            )
        jax.block_until_ready(outputs)

    t0 = time.perf_counter()
    for _ in range(args.steps):
        states, (outputs, emit) = step(det_params, reid_params, states, frames)
    jax.block_until_ready(outputs)
    dt = time.perf_counter() - t0

    fps = s * k * args.steps / dt
    print(
        json.dumps(
            {
                "metric": f"aggregate 1080p {args.model}-{args.img_size}"
                          " detect+track fps/chip",
                "value": round(fps, 2),
                "unit": "frames/sec/chip",
                "vs_baseline": round(fps / 500.0, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
