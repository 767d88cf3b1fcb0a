"""Stage-bisection benchmark: time the fused pipeline with suffixes disabled
to attribute per-step cost. Every variant chains a data dependency through
the loop (isnan-of-sum bump into the next input) so the tunnel/async runtime
cannot elide or overlap executions.

Usage: python tools/bench_stages.py [--streams 8] [--steps 15]
"""

from __future__ import annotations

import argparse
import os
import sys
import time
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--streams", type=int, default=8)
    p.add_argument("--steps", type=int, default=15)
    p.add_argument("--model", default="yolov3")
    p.add_argument("--img-size", type=int, default=416)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from yolo_deepsort_tpu.cfg.architectures import ARCHITECTURES
    from yolo_deepsort_tpu.config import DetectorConfig, TrackerConfig
    from yolo_deepsort_tpu.models import weights as W
    from yolo_deepsort_tpu.models.darknet import build_network, network_apply
    from yolo_deepsort_tpu.models.reid import random_reid_params, reid_apply
    from yolo_deepsort_tpu.ops.crops import crop_and_normalize
    from yolo_deepsort_tpu.ops.letterbox import letterbox, rescale_boxes
    from yolo_deepsort_tpu.ops.nms import batched_nms
    from yolo_deepsort_tpu.tracking.tracker import init_tracker_state, tracker_step

    S, H, W_, SIZE = args.streams, 1080, 1920, args.img_size
    plan = build_network(ARCHITECTURES[args.model](img_size=SIZE))
    det_params = jax.tree_util.tree_map(
        jnp.asarray,
        W.fold_inference_params(W.random_raw_params(plan.defs(), seed=0), plan.defs()),
    )
    reid_params = jax.tree_util.tree_map(jnp.asarray, random_reid_params(0))
    det_cfg = DetectorConfig(img_size=SIZE)
    trk_cfg = TrackerConfig()
    states0 = jax.tree_util.tree_map(
        lambda v: jnp.broadcast_to(v[None], (S,) + v.shape),
        init_tracker_state(trk_cfg),
    )
    rng = np.random.default_rng(0)
    frames0 = jnp.asarray(rng.integers(0, 256, (S, H, W_, 3), dtype=np.uint8))

    def stage_fwd(dp, rp, frames, states):
        x = jax.vmap(lambda f: letterbox(f, SIZE))(frames)
        d = network_apply(plan, dp, x, compute_dtype=jnp.bfloat16)
        return jnp.sum(d), states

    def stage_nms(dp, rp, frames, states):
        x = jax.vmap(lambda f: letterbox(f, SIZE))(frames)
        d = network_apply(plan, dp, x, compute_dtype=jnp.bfloat16)
        b7, m = batched_nms(d, 0.5, 0.4, det_cfg.max_boxes, trk_cfg.max_dets)
        return jnp.sum(b7) + jnp.sum(m), states

    def stage_crops_only(dp, rp, frames, states):
        x = jax.vmap(lambda f: letterbox(f, SIZE))(frames)
        d = network_apply(plan, dp, x, compute_dtype=jnp.bfloat16)
        b7, m = batched_nms(d, 0.5, 0.4, det_cfg.max_boxes, trk_cfg.max_dets)
        xyxy = jax.vmap(lambda b: rescale_boxes(b[:, :4], SIZE, H, W_))(b7)
        crops = jax.vmap(
            lambda f, b: crop_and_normalize(f, b, compute_dtype=jnp.bfloat16)
        )(frames, xyxy)
        return jnp.sum(crops), states

    def stage_crops_reid(dp, rp, frames, states):
        x = jax.vmap(lambda f: letterbox(f, SIZE))(frames)
        d = network_apply(plan, dp, x, compute_dtype=jnp.bfloat16)
        b7, m = batched_nms(d, 0.5, 0.4, det_cfg.max_boxes, trk_cfg.max_dets)
        xyxy = jax.vmap(lambda b: rescale_boxes(b[:, :4], SIZE, H, W_))(b7)
        crops = jax.vmap(
            lambda f, b: crop_and_normalize(f, b, compute_dtype=jnp.bfloat16)
        )(frames, xyxy)
        feats = jax.vmap(
            lambda c: reid_apply(rp, c, compute_dtype=jnp.bfloat16)
        )(crops)
        return jnp.sum(feats), states

    def stage_full(dp, rp, frames, states):
        x = jax.vmap(lambda f: letterbox(f, SIZE))(frames)
        d = network_apply(plan, dp, x, compute_dtype=jnp.bfloat16)
        b7, m = batched_nms(d, 0.5, 0.4, det_cfg.max_boxes, trk_cfg.max_dets)
        xyxy = jax.vmap(lambda b: rescale_boxes(b[:, :4], SIZE, H, W_))(b7)
        x1 = jnp.clip(xyxy[..., 0], 0, W_ - 1)
        y1 = jnp.clip(xyxy[..., 1], 0, H - 1)
        x2 = jnp.clip(xyxy[..., 2], 0, W_ - 1)
        y2 = jnp.clip(xyxy[..., 3], 0, H - 1)
        tlwh = jnp.stack([x1, y1, x2 - x1, y2 - y1], axis=-1)
        crops = jax.vmap(
            lambda f, b: crop_and_normalize(f, b, compute_dtype=jnp.bfloat16)
        )(frames, jnp.stack([x1, y1, x2, y2], axis=-1))
        feats = jax.vmap(
            lambda c: reid_apply(rp, c, compute_dtype=jnp.bfloat16)
        )(crops)
        img_hw = jnp.array([H, W_], jnp.int32)
        states, out, emit = jax.vmap(
            lambda st, t, c, f, mm: tracker_step(trk_cfg, st, t, c, f, mm, img_hw)
        )(states, tlwh, b7[..., 4], feats, m)
        return jnp.sum(out) * 1.0 + jnp.sum(feats), states

    for name, fn in [
        ("+ forward", stage_fwd),
        ("+ nms", stage_nms),
        ("+ crops", stage_crops_only),
        ("+ crops/reid", stage_crops_reid),
        ("+ tracker (full)", stage_full),
    ]:
        @jax.jit
        def step(dp, rp, frames, states, fn=fn):
            s, states = fn(dp, rp, frames, states)
            bump = jnp.isnan(s).astype(jnp.uint8)
            return frames + bump, states, s

        frames, states = frames0, states0
        t0 = time.perf_counter()
        frames, states, s = step(det_params, reid_params, frames, states)
        jax.block_until_ready(s)
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(args.steps):
            frames, states, s = step(det_params, reid_params, frames, states)
        jax.block_until_ready(s)
        float(s)  # force host readback through the chain
        dt = (time.perf_counter() - t0) / args.steps * 1000
        print(
            f"{name}: {dt:.2f} ms/step -> {S / dt * 1000:.0f} fps agg "
            f"(compile {compile_s:.0f}s)",
            flush=True,
        )


if __name__ == "__main__":
    main()
