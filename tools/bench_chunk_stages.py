"""Chunked-pipeline stage attribution under the HONEST bench load.

Times the bucketed scanned step's two dispatches separately -- the detect
stage (letterbox -> backbone -> NMS over K*S frames) and the track stage
(rescale -> crop -> embed -> scanned association) at each capacity bucket --
with the same BN-consistent weights, calibrated threshold, static frames,
and saturated tracker population as bench.py. Every loop chains a data
dependency (tracker state, or an isnan bump into the frames) so the tunnel
cannot elide or overlap executions.

Usage: python tools/bench_chunk_stages.py [--scan 16] [--steps 8]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="yolov3")
    p.add_argument("--img-size", type=int, default=416)
    p.add_argument("--streams", type=int, default=8)
    p.add_argument("--frame-h", type=int, default=1080)
    p.add_argument("--frame-w", type=int, default=1920)
    p.add_argument("--scan", type=int, default=16)
    p.add_argument("--steps", type=int, default=8)
    p.add_argument("--target-dets", type=int, default=32)
    p.add_argument("--caps", default="32,48,64")
    p.add_argument("--int8-embed", action="store_true",
                   help="add same-graph int8-embed A/B variants")
    p.add_argument("--pallas-conv", action="store_true",
                   help="add a detect-stage A/B variant routing deep "
                        "backbone convs through the MXU Pallas kernel")
    p.add_argument("--int8-conv", action="store_true",
                   help="add a detect-stage A/B variant running the deep "
                        "backbone convs W8A8 through the Pallas kernel "
                        "(calibrated on the bench frames)")
    p.add_argument("--resblock", default="off",
                   choices=["off", "pallas", "int8"],
                   help="add a detect-stage A/B variant fusing residual-"
                        "block chains into single Pallas kernels "
                        "(ops/pallas_resblock.py)")
    p.add_argument("--resblock-chains", default=None,
                   help="comma-separated chain START module indices to "
                        "fuse (per-chain attribution); default all. The "
                        "discovered chains are printed in the JSON")
    args = p.parse_args()

    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          os.path.join(os.path.dirname(os.path.dirname(
                              os.path.abspath(__file__))), ".jax_cache"))
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

    import jax
    import jax.numpy as jnp

    if os.environ.get("JAX_PLATFORMS", "").strip() == "cpu":
        jax.config.update("jax_platforms", "cpu")

    from yolo_deepsort_tpu.cfg.architectures import ARCHITECTURES
    from yolo_deepsort_tpu.config import DetectorConfig, TrackerConfig
    from yolo_deepsort_tpu.models import weights as W
    from yolo_deepsort_tpu.models.darknet import build_network, network_apply
    from yolo_deepsort_tpu.models.reid import random_reid_params
    from yolo_deepsort_tpu.ops.letterbox import letterbox
    from yolo_deepsort_tpu.parallel.streams import (
        init_stream_states,
        make_scanned_detect_stage,
        make_scanned_track_stage,
    )
    from yolo_deepsort_tpu.train.yolo_cli import (
        make_forward_train,
        raw_params_to_train,
        train_params_to_raw,
    )

    k, s = args.scan, args.streams
    hw = (args.frame_h, args.frame_w)
    plan = build_network(ARCHITECTURES[args.model](img_size=args.img_size))
    raw = W.random_raw_params(plan.defs(), seed=0)
    rng = np.random.default_rng(0)
    base = rng.integers(0, 256, (s, *hw, 3), dtype=np.uint8)
    frames = jnp.asarray(np.broadcast_to(base[None], (k, s, *hw, 3)).copy())

    t_params, t_stats = raw_params_to_train(raw, plan.defs())
    capture = jax.jit(
        lambda p, st, x: make_forward_train(plan, bn_update=1.0)(p, st, x)[1]
    )
    xs = jax.vmap(lambda f: letterbox(f, args.img_size))(frames[0])
    new_stats = jax.device_get(capture(t_params, t_stats, xs))
    raw = train_params_to_raw(t_params, {**t_stats, **new_stats}, plan.defs())
    from bench import plant_box_prior  # same MOT-person geometry as bench.py

    raw = plant_box_prior(raw, plan, hw)
    det_params_host = W.fold_inference_params(raw, plan.defs())
    det_params = jax.tree_util.tree_map(jnp.asarray, det_params_host)
    reid_params = jax.tree_util.tree_map(jnp.asarray, random_reid_params(0))

    kth = args.target_dets

    @jax.jit
    def obj_quantile(dp, flat):
        x = jax.vmap(lambda f: letterbox(f, args.img_size))(flat)
        d = network_apply(plan, dp, x, compute_dtype=jnp.bfloat16)
        top = jax.lax.top_k(d[..., 4], kth + 1)[0]
        return jnp.median(top[:, kth])

    thr = float(obj_quantile(det_params, frames[0]))
    det_cfg = DetectorConfig(img_size=args.img_size, conf_thres=thr)
    trk_cfg = TrackerConfig(max_dets=64)

    detect = make_scanned_detect_stage(
        plan, det_cfg, trk_cfg, hw, compute_dtype=jnp.bfloat16,
        use_pallas_letterbox=True)

    # --- detect loop, isnan-bump chained
    @jax.jit
    def detect_chained(dp, fr, bump):
        b7, m, mc = detect(dp, fr)
        nb = jnp.isnan(jnp.sum(b7)).astype(jnp.uint8)
        return b7, m, mc, nb

    bump = jnp.uint8(0)
    b7 = m = None
    for _ in range(2):
        b7, m, mc, bump = detect_chained(det_params, frames, bump)
    jax.block_until_ready(b7)
    t0 = time.perf_counter()
    for _ in range(args.steps):
        b7, m, mc, bump = detect_chained(det_params, frames, bump)
    jax.block_until_ready(b7)
    dt_detect = (time.perf_counter() - t0) / args.steps * 1e3
    n_frames = k * s
    mc = np.asarray(mc)
    out = {"detect_ms_per_chunk": round(dt_detect, 1),
           "max_count": int(mc[0]), "max_crop_hw": mc[1:].tolist(),
           "chunk_frames": n_frames}

    if args.pallas_conv:
        # same-graph detect A/B: only the eligible deep convs swap to the
        # hand-scheduled MXU kernel; NMS/letterbox identical
        detect_pl = make_scanned_detect_stage(
            plan, det_cfg, trk_cfg, hw, compute_dtype=jnp.bfloat16,
            use_pallas_letterbox=True, use_pallas_conv=True)

        @jax.jit
        def detect_pl_chained(dp, fr, bump):
            b7_, m_, mc_ = detect_pl(dp, fr)
            nb = jnp.isnan(jnp.sum(b7_)).astype(jnp.uint8)
            return b7_, m_, mc_, nb

        bump2 = jnp.uint8(0)
        for _ in range(2):
            b7p, mp_, mcp, bump2 = detect_pl_chained(det_params, frames, bump2)
        jax.block_until_ready(b7p)
        t0 = time.perf_counter()
        for _ in range(args.steps):
            b7p, mp_, mcp, bump2 = detect_pl_chained(det_params, frames, bump2)
        jax.block_until_ready(b7p)
        out["detect_ms_per_chunk_plconv"] = round(
            (time.perf_counter() - t0) / args.steps * 1e3, 1)
        # cross-check: same planted load must survive NMS identically
        out["plconv_count_delta"] = int(
            abs(int(np.asarray(mcp)[0]) - int(mc[0])))

    if args.int8_conv:
        # same-graph detect A/B, W8A8 deep convs (Pallas kernel; gate with
        # tools/int8_detect_gate.py before serving use)
        from yolo_deepsort_tpu.models.quantize_darknet import (
            quantize_darknet_from_frames,
        )

        pkg = quantize_darknet_from_frames(
            plan, det_params_host, base, args.img_size)
        out["int8_conv_layers"] = len(pkg)
        detect_q = make_scanned_detect_stage(
            plan, det_cfg, trk_cfg, hw, compute_dtype=jnp.bfloat16,
            use_pallas_letterbox=True, use_pallas_conv=True,
            backbone_int8_pkg=pkg)

        @jax.jit
        def detect_q_chained(dp, fr, bump):
            b7_, m_, mc_ = detect_q(dp, fr)
            nb = jnp.isnan(jnp.sum(b7_)).astype(jnp.uint8)
            return b7_, m_, mc_, nb

        bump3 = jnp.uint8(0)
        for _ in range(2):
            b7q, mq_, mcq, bump3 = detect_q_chained(det_params, frames, bump3)
        jax.block_until_ready(b7q)
        t0 = time.perf_counter()
        for _ in range(args.steps):
            b7q, mq_, mcq, bump3 = detect_q_chained(det_params, frames, bump3)
        jax.block_until_ready(b7q)
        out["detect_ms_per_chunk_int8conv"] = round(
            (time.perf_counter() - t0) / args.steps * 1e3, 1)
        out["int8conv_count_delta"] = int(
            abs(int(np.asarray(mcq)[0]) - int(mc[0])))

    if args.resblock != "off":
        # same-graph detect A/B: consecutive residual blocks fused into
        # chain kernels with VMEM-resident intermediates; optional
        # per-chain whitelist for attribution (start module indices)
        from yolo_deepsort_tpu.ops.pallas_resblock import (
            find_residual_spans,
        )

        out["resblock_chains"] = [list(c) for c in
                                  find_residual_spans(plan)]
        wl = (None if args.resblock_chains is None else
              [int(v) for v in args.resblock_chains.split(",")])
        rb = {"chains": wl, "int8": args.resblock == "int8"}
        rb_pkg = None
        if args.resblock == "int8":
            from yolo_deepsort_tpu.models.quantize_darknet import (
                quantize_darknet_from_frames,
            )

            rb_pkg = quantize_darknet_from_frames(
                plan, det_params_host, base, args.img_size)
        detect_rb = make_scanned_detect_stage(
            plan, det_cfg, trk_cfg, hw, compute_dtype=jnp.bfloat16,
            use_pallas_letterbox=True, use_resblock=rb,
            backbone_int8_pkg=rb_pkg)

        @jax.jit
        def detect_rb_chained(dp, fr, bump):
            b7_, m_, mc_ = detect_rb(dp, fr)
            nb = jnp.isnan(jnp.sum(b7_)).astype(jnp.uint8)
            return b7_, m_, mc_, nb

        bump4 = jnp.uint8(0)
        for _ in range(2):
            b7r, mr_, mcr, bump4 = detect_rb_chained(det_params, frames,
                                                     bump4)
        jax.block_until_ready(b7r)
        t0 = time.perf_counter()
        for _ in range(args.steps):
            b7r, mr_, mcr, bump4 = detect_rb_chained(det_params, frames,
                                                     bump4)
        jax.block_until_ready(b7r)
        key = "detect_ms_per_chunk_resblock"
        if args.resblock == "int8":
            key += "_int8"
        if wl is not None:
            key += "_" + "_".join(str(v) for v in wl)
        out[key] = round((time.perf_counter() - t0) / args.steps * 1e3, 1)
        out["resblock_count_delta"] = int(
            abs(int(np.asarray(mcr)[0]) - int(mc[0])))

    # --- track stage per capacity x crop-window variant, state chained +
    # saturating warmup (window (320,192) + Pallas kernel = the production
    # configuration the bucketed step selects under this load)
    # window rung matching what the bucketed step selects for this frame
    # size under the planted load (the box prior scales with frame_h)
    win = (320, 192) if args.frame_h <= 1080 else (640, 384)
    variants = [("", dict(crop_window=None)),
                ("_win", dict(crop_window=win, use_pallas_crops=False)),
                ("_plwin", dict(crop_window=win, use_pallas_crops=True))]
    from yolo_deepsort_tpu.ops.pallas_crops import pallas_crops_supported
    if not pallas_crops_supported(args.frame_h, args.frame_w, *win):
        # non-tile-divisible frames (e.g. 1079) would hit a bare assert
        # inside the kernel; record the variant as unsupported instead
        variants = variants[:-1]
        out["track_plwin"] = "skipped (pallas_crops unsupported for shape)"
    if args.int8_embed:
        # same-graph int8-embed A/B: identical stage, only the embed
        # swapped for the W8A8 path (weights quantized from the same
        # BN-consistent load; activation scales calibrated on one chunk).
        # Three int8 routes: per-layer XLA (round-3: measured negative),
        # int8-resident XLA twin, and the fused Pallas conv kernels.
        from yolo_deepsort_tpu.models.quantize import (
            quantize_reid_params,
            quantize_reid_params_resident,
        )

        calib = np.random.default_rng(5).normal(
            0, 1, (64, 128, 64, 3)).astype(np.float32)
        rp_host = jax.device_get(reid_params)
        qparams = jax.tree_util.tree_map(
            jnp.asarray, quantize_reid_params(rp_host, calib))
        qres = jax.tree_util.tree_map(
            jnp.asarray, quantize_reid_params_resident(rp_host, calib))
        base_variants = [v for v in variants if v[0] in ("", "_plwin")]
        variants = variants + [
            (s_ + "_int8", {**kw_, "embed_int8": True})
            for s_, kw_ in base_variants] + [
            (s_ + "_int8res", {**kw_, "embed_int8": "resident"})
            for s_, kw_ in base_variants] + [
            (s_ + "_int8pl", {**kw_, "embed_int8": "resident_pallas"})
            for s_, kw_ in base_variants]
    for cap in (int(c) for c in args.caps.split(",")):
      for suffix, kw in variants:
        track = make_scanned_track_stage(
            det_cfg, trk_cfg, hw, cap, compute_dtype=jnp.bfloat16,
            donate_state=False, **kw)
        ei = kw.get("embed_int8")
        rp = (qres if ei in ("resident", "resident_pallas")
              else qparams if ei else reid_params)
        states = init_stream_states(trk_cfg, s)
        for _ in range(3):
            states, (outs, emit) = track(rp, states, frames, b7, m)
        jax.block_until_ready(outs)
        t0 = time.perf_counter()
        for _ in range(args.steps):
            states, (outs, emit) = track(rp, states, frames, b7, m)
        jax.block_until_ready(outs)
        dt = (time.perf_counter() - t0) / args.steps * 1e3
        tracks = float(jnp.mean(jnp.sum(states.state == 2, axis=-1)))
        out[f"track_ms_cap{cap}{suffix}"] = round(dt, 1)
        out[f"tracks_cap{cap}{suffix}"] = round(tracks, 1)

    out["note"] = ("per-frame ms = chunk ms / chunk_frames; detect+track at "
                   "the selected bucket approximates the bucketed step")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
