"""Headline benchmark: aggregate 1080p tracking throughput per chip.

Runs the FULL fused per-frame pipeline -- letterbox(1080p) -> YOLOv3-416
backbone+decode (bf16) -> class-aware weighted-merge NMS -> ReID crop+embed
-> DeepSORT association (Kalman, gated cascade, JV assignment) -- batched
over S concurrent streams on one chip, entirely on-device (one int32
readback per K*S-frame chunk selects the detection-capacity bucket).

Honest-load methodology (the pipeline has data-dependent trip counts --
NMS early-exit, JV iteration count, tracker population): the detector's
confidence threshold is CALIBRATED at startup so the random-weight model
emits ~--target-dets detections per frame, and the warmup chunks run long
enough to confirm that many tracks per stream. The JSON line reports the
achieved load (dets_per_frame, tracks_active) next to the numbers.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...} where
value is aggregate throughput; p50_ms/p99_ms are per-dispatch (= per-frame
compute) latency for the K-chunk mode, and k1_p50_ms/k1_p99_ms for the
low-latency single-frame (K=1) mode. vs_baseline is the fraction of the
BASELINE.json north-star target of 500 fps aggregate 1080p tracking per TPU
v5e chip (the reference repo publishes no numbers of its own -- BASELINE.md).
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def percentile(xs, p):
    return float(np.percentile(np.asarray(xs, np.float64), p))


# person-like box-height ladder AT 1080p (frame pixels; scaled by
# frame_h/1080 so a person covers the same FRACTION of taller frames --
# the same scene filmed at 4K doubles the person's pixel height): spans
# the MOT16 pedestrian range; each anchor of each yolo head aims at one
# rung so the planted detections carry realistic crop geometry instead of
# exp(N(0,1)) anchor noise (see plant_box_prior)
BOX_PRIOR_HEIGHTS = (120.0, 150.0, 185.0, 225.0, 270.0)
BOX_PRIOR_ASPECT = 0.41  # w/h, Market-1501 crop aspect


def plant_box_prior(raw, plan, frame_hw, heights=BOX_PRIOR_HEIGHTS,
                    aspect=BOX_PRIOR_ASPECT):
    """Rewrite each yolo head's tw/th channels the way training would set
    them: a trained detector's head BIASES encode the dataset's box-size
    statistics (boxes decode as anchor*exp(bias + Wx), and on person data
    the learned biases pull every anchor toward person geometry). Random
    weights instead sample all 9 anchors uniformly with exp(N(0,1)) spread,
    which yields frame-sized boxes no MOT scene produces.

    Here: zero the tw/th weight rows and set their biases so anchor a of
    head g decodes boxes of height heights[(3g+a) % len] (in FRAME pixels,
    converted through the letterbox scale) and width aspect*height. Box
    CENTERS still come from the live sigmoid(tx/ty) decode, objectness and
    class channels stay untouched (threshold calibration is unaffected).
    Copies the head arrays it rewrites (raw params from train_params_to_raw
    ALIAS the training params' buffers -- mutating through them would
    corrupt the caller's source); returns the same dict."""
    size = plan.img_size
    scale = size / float(max(frame_hw))  # frame px -> letterbox px
    scale *= frame_hw[0] / 1080.0  # ladder is calibrated at 1080p
    for g, head in enumerate(plan.heads):
        conv_idx = head.module_index - 1
        layer = raw[conv_idx]
        layer["conv_weight"] = np.array(layer["conv_weight"])
        layer["conv_bias"] = np.array(layer["conv_bias"])
        per = 5 + head.num_classes
        for a, (pw, ph) in enumerate(head.anchors):
            h_t = heights[(3 * g + a) % len(heights)] * scale
            w_t = aspect * h_t
            cw, ch = a * per + 2, a * per + 3
            layer["conv_weight"][cw] = 0.0
            layer["conv_weight"][ch] = 0.0
            layer["conv_bias"][cw] = np.log(w_t / pw)
            layer["conv_bias"][ch] = np.log(h_t / ph)
    return raw


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
    p.add_argument("--target-dets", type=int, default=32,
                   help="calibrate conf_thres for ~this many detections per "
                        "frame (0 = no calibration, raw conf 0.5 on noise)")
    p.add_argument("--buckets", default="16,24,32,36,40,48",
                   help="detection-capacity buckets for the post-NMS stages")
    p.add_argument("--box-prior", default="mot", choices=["mot", "raw"],
                   help="geometry of the planted detections: 'mot' aims the "
                        "yolo-head w/h biases at MOT-person box sizes (what "
                        "a trained head's biases encode); 'raw' keeps the "
                        "random-weight exp(N(0,1)) anchor noise, whose "
                        "frame-sized boxes disable the crop-window path")
    p.add_argument("--no-bucketing", action="store_true",
                   help="run the monolithic worst-case-capacity step")
    p.add_argument("--latency-steps", type=int, default=10,
                   help="per-dispatch latency sample count (0 = skip)")
    p.add_argument("--k1-cap", type=int, default=40,
                   help="K=1 latency mode: static det capacity (0 = full)")
    p.add_argument("--input-fps", type=float, default=0,
                   help="also report frame latency at this LIVE per-stream "
                        "ingest rate (chunk fill = chunk/input_fps)")
    p.add_argument("--skip-k1-latency", action="store_true",
                   help="skip the single-frame low-latency mode measurement")
    p.add_argument("--f32", action="store_true", help="disable bf16 compute")
    p.add_argument("--embed-int8", default="off",
                   choices=["off", "resident", "pallas"],
                   help="int8-resident ReID embed (W8A8, accuracy-gated by "
                        "tools/int8_gate.py); 'pallas' uses the fused int8 "
                        "conv kernels (TPU)")
    p.add_argument("--k1-embed-int8", default="same",
                   choices=["same", "off", "resident", "pallas"],
                   help="embed routing for the K=1 latency step only "
                        "('same' reuses --embed-int8): the K=1 embed runs "
                        "one static-cap batch per frame, a different "
                        "composition point than the scanned aggregate "
                        "where the resident kernels measured -17%%")
    p.add_argument("--backbone-conv", default="off",
                   choices=["off", "pallas", "int8", "whitelist", "auto"],
                   help="route deep backbone convs through the MXU Pallas "
                        "kernel (ops/pallas_conv.py); 'int8' additionally "
                        "runs them W8A8 (calibrated on the bench frames, "
                        "accuracy-gated by tools/int8_detect_gate.py); "
                        "'whitelist' uses the per-layer autotuned routing "
                        "from tuned/ (tools/autotune_conv.py, error if "
                        "absent); 'auto' = whitelist when a tuned file for "
                        "this (model, img, streams, backend) exists, else "
                        "off. Default off: the same-day TPU A/B measured "
                        "the whitelist -13% in the scanned aggregate step "
                        "(docs/ROADMAP.md round 4) while winning K=1")
    p.add_argument("--resblock", default="off",
                   choices=["off", "pallas", "int8"],
                   help="fuse darknet residual-block chains into single "
                        "Pallas kernels with VMEM-resident intermediates "
                        "(ops/pallas_resblock.py); 'int8' runs fused blocks "
                        "W8A8 where calibration packaged both convs "
                        "(requires --backbone-conv off: one int8 package "
                        "per step). Composable with --backbone-conv: "
                        "chains claim whole residual spans first, the conv "
                        "route sees the remaining layers")
    p.add_argument("--k1-resblock", default="same",
                   choices=["same", "off", "pallas", "int8"],
                   help="resblock routing for the K=1 latency step only "
                        "('same' reuses --resblock)")
    p.add_argument("--k1-backbone-conv", default="auto",
                   choices=["off", "same", "whitelist", "auto"],
                   help="conv routing for the K=1 latency step only; its "
                        "single-dispatch batch is exactly the autotuned "
                        "shape and can prefer the Pallas kernels even when "
                        "the scanned aggregate step measures better on XLA "
                        "('same' reuses --backbone-conv's routing; 'auto' "
                        "= tuned whitelist if present, else same)")
    p.add_argument("--trace", default=None, metavar="DIR",
                   help="capture a jax profiler trace of the timed region "
                        "into DIR (host-side events only through the axon "
                        "tunnel; full xplane on local TPUs)")
    p.add_argument("--no-pallas-letterbox", action="store_true",
                   help="disable the Pallas preprocessing kernels (fused "
                        "letterbox AND windowed crops; both on by default, "
                        "with automatic XLA fallback if a kernel fails to "
                        "compile)")
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

    # honor JAX_PLATFORMS=cpu for smokes even though the axon sitecustomize
    # pins the TPU backend (same guard as the tools/ entry points)
    if os.environ.get("JAX_PLATFORMS", "").strip() == "cpu":
        jax.config.update("jax_platforms", "cpu")

    from yolo_deepsort_tpu.cfg.architectures import ARCHITECTURES
    from yolo_deepsort_tpu.config import DetectorConfig, TrackerConfig
    from yolo_deepsort_tpu.models import weights as W
    from yolo_deepsort_tpu.models.darknet import build_network, network_apply
    from yolo_deepsort_tpu.models.reid import random_reid_params
    from yolo_deepsort_tpu.ops.letterbox import letterbox
    from yolo_deepsort_tpu.ops.pallas_letterbox import pallas_letterbox_batch
    from yolo_deepsort_tpu.parallel.streams import (
        init_stream_states,
        make_batched_step,
        make_scanned_step,
        make_scanned_step_bucketed,
    )
    from yolo_deepsort_tpu.tracking.tracker import STATE_CONFIRMED

    plan = build_network(ARCHITECTURES[args.model](img_size=args.img_size))
    reid_params = random_reid_params(seed=0)
    trk_cfg = TrackerConfig(max_dets=args.max_dets)
    compute_dtype = jnp.float32 if args.f32 else jnp.bfloat16
    k = max(args.scan, 1)
    s = args.streams
    use_pallas = not args.no_pallas_letterbox

    rng = np.random.default_rng(0)
    if args.target_dets > 0:
        # temporally-STATIC frames per stream: detections repeat each frame,
        # so tracks confirm and the association stage runs at a full, stable
        # matched population (noise that differs per frame gives detections
        # with no temporal coherence -- nothing ever matches and the tracker
        # loops run empty)
        base = rng.integers(
            0, 256, (s, args.frame_h, args.frame_w, 3), dtype=np.uint8
        )
        frames = jnp.asarray(
            np.broadcast_to(base[None], (k, *base.shape)).copy()
        )
        calib_frames = base[:2]  # host copy for int8 calibration
    else:
        frames_np = rng.integers(
            0, 256, (k, s, args.frame_h, args.frame_w, 3), dtype=np.uint8
        )
        frames = jnp.asarray(frames_np)
        calib_frames = frames_np[0, :2]

    raw = W.random_raw_params(plan.defs(), seed=0)
    if args.target_dets > 0:
        # Raw random weights explode through the unnormalized residual stack
        # (obj saturates at 1.0, exp(w) overflows -> NaN boxes: the tracker
        # then sees nothing and every data-dependent loop runs empty). Make
        # the weights BN-CONSISTENT like a trained net's: one train-mode
        # forward on the bench input captures each layer's true batch
        # statistics, which become the stored BN stats.
        from yolo_deepsort_tpu.train.yolo_cli import (
            make_forward_train,
            raw_params_to_train,
            train_params_to_raw,
        )

        t_params, t_stats = raw_params_to_train(raw, plan.defs())
        capture = jax.jit(
            lambda p, st, x: make_forward_train(plan, bn_update=1.0)(p, st, x)[1]
        )
        sample = frames[0]  # (S, H, W, 3)
        xs = jax.vmap(lambda f: letterbox(f, args.img_size))(sample)
        new_stats = jax.device_get(capture(t_params, t_stats, xs))
        raw = train_params_to_raw(t_params, {**t_stats, **new_stats},
                                  plan.defs())
        if args.box_prior == "mot":
            raw = plant_box_prior(raw, plan, (args.frame_h, args.frame_w))
    det_params = W.fold_inference_params(raw, plan.defs())

    backbone_int8_pkg = None
    # conv_route is what the steps receive as use_pallas_conv: False |
    # True (all eligible layers) | a load_conv_whitelist dict (per-layer
    # autotuned routing)
    conv_route = args.backbone_conv in ("pallas", "int8")
    if args.backbone_conv in ("whitelist", "auto"):
        from yolo_deepsort_tpu.ops.pallas_conv import load_conv_whitelist

        conv_route = load_conv_whitelist(
            args.model, args.img_size, args.streams)
        if conv_route is None:
            if args.backbone_conv == "whitelist":
                raise SystemExit(
                    f"no tuned conv whitelist for {args.model}-"
                    f"{args.img_size} b{args.streams} on this backend; run "
                    "tools/autotune_conv.py first (or use --backbone-conv "
                    "pallas/int8)")
            conv_route = False  # auto: nothing tuned for this shape -> XLA
    # K=1 routing resolves separately: its dispatch batch IS the autotuned
    # shape; the TPU A/B (docs/ROADMAP.md round 4) measured the whitelist
    # a large K=1 win while the scanned aggregate step prefers XLA
    if args.k1_backbone_conv == "same":
        k1_conv_route = conv_route
    elif args.k1_backbone_conv == "off":
        k1_conv_route = False
    else:  # whitelist | auto
        from yolo_deepsort_tpu.ops.pallas_conv import load_conv_whitelist

        k1_conv_route = load_conv_whitelist(
            args.model, args.img_size, args.streams)
        if k1_conv_route is None:
            if args.k1_backbone_conv == "whitelist":
                raise SystemExit(
                    f"no tuned conv whitelist for {args.model}-"
                    f"{args.img_size} b{args.streams} on this backend "
                    "(--k1-backbone-conv whitelist)")
            # auto with nothing tuned: inherit the aggregate routing (the
            # pre-split behavior) rather than silently dropping to off
            k1_conv_route = conv_route
    _rb = {"off": False, "pallas": True, "int8": "int8"}
    resblock_route = _rb[args.resblock]
    k1_resblock_route = (resblock_route if args.k1_resblock == "same"
                         else _rb[args.k1_resblock])
    if ("int8" in (resblock_route, k1_resblock_route)
            and args.backbone_conv != "off"):
        raise SystemExit("--resblock int8 requires --backbone-conv off "
                         "(each step carries one int8 package; the conv "
                         "route would reinterpret the resblock layers)")
    int8_layers = set()
    for route in (conv_route, k1_conv_route):
        if isinstance(route, dict):
            int8_layers |= route["int8"]
    if (args.backbone_conv == "int8" or int8_layers
            or "int8" in (resblock_route, k1_resblock_route)):
        # calibrate on the exact bench content, on the HOST (det_params are
        # still host arrays here; eager calibration through the tunnel
        # would dispatch per-op). --backbone-conv int8 packages EVERY
        # eligible layer; only the whitelist routes restrict to their own
        # int8 sets (per-step filtering below keeps each route honest)
        from yolo_deepsort_tpu.models.quantize_darknet import (
            quantize_darknet_from_frames,
        )

        backbone_int8_pkg = quantize_darknet_from_frames(
            plan, det_params, calib_frames, args.img_size,
            layers=None if (args.backbone_conv == "int8" or "int8" in
                            (resblock_route, k1_resblock_route))
            else (int8_layers or None))

    def pkg_for_route(route):
        """The int8 package a given conv route may see: exactly the layers
        THAT route runs W8A8 (make_backbone_conv_impl quantizes any layer
        with a pkg entry, so a shared unfiltered pkg would silently turn a
        route's 'bf16' layers into int8)."""
        if backbone_int8_pkg is None or not route:
            return None
        if isinstance(route, dict):
            sub = {i: backbone_int8_pkg[i] for i in route["int8"]
                   if i in backbone_int8_pkg}
            return sub or None
        # route is True (all eligible layers): W8A8 only in int8 mode
        return backbone_int8_pkg if args.backbone_conv == "int8" else None

    det_params = jax.tree_util.tree_map(jnp.asarray, det_params)
    _emb = {"off": False, "resident": "resident",
            "pallas": "resident_pallas"}
    embed_int8 = _emb[args.embed_int8]
    k1_embed_int8 = (embed_int8 if args.k1_embed_int8 == "same"
                     else _emb[args.k1_embed_int8])
    reid_params_q = None
    if embed_int8 or k1_embed_int8:
        from yolo_deepsort_tpu.models.quantize import (
            quantize_reid_params_resident,
        )

        calib = np.random.default_rng(5).normal(
            0, 1, (64, 128, 64, 3)).astype(np.float32)
        reid_params_q = jax.tree_util.tree_map(
            jnp.asarray, quantize_reid_params_resident(reid_params, calib))
    reid_params_plain = jax.tree_util.tree_map(jnp.asarray, reid_params)
    # the aggregate step's params (existing name, used below throughout)
    reid_params = reid_params_q if embed_int8 else reid_params_plain

    # ---- load calibration: per-STREAM conf thresholds so every stream
    # carries ~target_dets detections (equal counts keep the chunk-max --
    # and so the selected capacity bucket -- tight around the target)
    conf_thres = 0.5
    conf_vec = None
    calib_fallback = None
    if args.target_dets > 0:
        # deliberately NOT clamped to max_dets: a target above the bucket
        # ladder is the saturation probe (sat_* counters must fire instead
        # of silently capping -- VERDICT r4 item 6); clamped to the decode
        # candidate count inside obj_quantile
        kth = max(1, int(args.target_dets))

        def make_obj_quantile(lb_pallas):
            @jax.jit
            def obj_quantile(det_params, flat):
                if lb_pallas:
                    xs = pallas_letterbox_batch(flat, args.img_size)
                else:
                    xs = jax.vmap(lambda f: letterbox(f, args.img_size))(flat)
                decoded = network_apply(
                    plan, det_params, xs, compute_dtype=compute_dtype
                )
                obj = decoded[..., 4]  # (S, B)
                kk = min(kth, obj.shape[-1])
                top = jax.lax.top_k(obj, kk)[0]
                return top[:, kk - 1]  # per-stream k-th largest

            return obj_quantile

        try:
            conf_vec = np.asarray(
                make_obj_quantile(use_pallas)(det_params, frames[0]),
                np.float32)
        except Exception as e:
            if not use_pallas:
                raise
            # first Pallas compile of the run: a backend that cannot run
            # the kernels (CPU) fails here, before the step's own warmup
            # fallback could engage -- same policy: drop to XLA visibly
            print(f"bench: Pallas letterbox unavailable at calibration "
                  f"({type(e).__name__}); falling back to XLA kernels",
                  file=sys.stderr)
            calib_fallback = repr(e)[:200]
            use_pallas = False
            conf_vec = np.asarray(
                make_obj_quantile(False)(det_params, frames[0]), np.float32)
        conf_thres = float(conf_vec.mean())

    det_cfg = DetectorConfig(
        img_size=args.img_size, conf_thres=conf_thres, nms_thres=0.4,
        max_dets=args.max_dets,
    )

    # ---- build the step
    buckets = tuple(int(b) for b in args.buckets.split(",") if b)

    def build(use_pallas_lb):
        # the conv kernel rides the same fallback switch as the other
        # Pallas kernels: a warmup failure rebuilds everything on XLA
        # (the int8-resident embed degrades to its XLA twin, not to off)
        rb = resblock_route if use_pallas_lb else False
        agg_pkg = pkg_for_route(conv_route) if use_pallas_lb else None
        if rb == "int8":
            # --resblock int8 forces --backbone-conv off, so the conv
            # route never sees this (full) package
            agg_pkg = backbone_int8_pkg
        conv_kw = dict(
            use_pallas_conv=conv_route if use_pallas_lb else False,
            backbone_int8_pkg=agg_pkg,
            use_resblock=rb,
        )
        nonlocal embed_int8
        if not use_pallas_lb and embed_int8 == "resident_pallas":
            embed_int8 = "resident"
        if k > 1 and not args.no_bucketing:
            return make_scanned_step_bucketed(
                plan, det_cfg, trk_cfg, (args.frame_h, args.frame_w),
                buckets=buckets, compute_dtype=compute_dtype,
                use_pallas_letterbox=use_pallas_lb,
                conf_thres_per_stream=conf_vec,
                # None = auto by backend + YDT_CROPS_PALLAS override; the
                # --no-pallas-letterbox escape hatch (and the warmup
                # fallback) disables both Pallas kernels together
                use_pallas_crops=None if use_pallas_lb else False,
                embed_int8=embed_int8, **conv_kw,
            )
        if k > 1:
            if embed_int8:
                raise SystemExit(
                    "--embed-int8 requires the bucketed step "
                    "(drop --no-bucketing)")
            return make_scanned_step(
                plan, det_cfg, trk_cfg, (args.frame_h, args.frame_w), k,
                compute_dtype=compute_dtype, use_pallas_letterbox=use_pallas_lb,
            )
        return make_batched_step(
            plan, det_cfg, trk_cfg, (args.frame_h, args.frame_w),
            compute_dtype=compute_dtype, use_pallas_letterbox=use_pallas_lb,
            embed_int8=embed_int8, **conv_kw,
        )

    pallas_fallback = calib_fallback
    step = build(use_pallas)
    states = init_stream_states(trk_cfg, s)
    if k == 1:
        frames = frames[0]

    def run_chunk(st):
        return step(det_params, reid_params, st, frames)

    try:
        for _ in range(args.warmup):
            states, (outputs, emit) = run_chunk(states)
        jax.block_until_ready(outputs)
    except Exception as e:
        if not use_pallas:
            raise
        # Pallas kernel failed on this backend/geometry: fall back to XLA,
        # but never silently -- the explicit flags exist for A/B runs
        print(f"[bench] Pallas warmup failed ({type(e).__name__}): "
              f"falling back to XLA kernels", file=sys.stderr)
        pallas_fallback = repr(e)[:200]
        use_pallas = False
        step = build(False)
        states = init_stream_states(trk_cfg, s)
        for _ in range(args.warmup):
            states, (outputs, emit) = run_chunk(states)
        jax.block_until_ready(outputs)

    # ---- achieved load, measured after warmup (confirmation takes n_init
    # frames; warmup covers k*warmup >= 3 frames per stream)
    dets_per_frame = None
    if hasattr(step, "_detect"):
        _, mask, _ = step._detect(det_params, frames)
        dets_per_frame = float(jnp.mean(jnp.sum(mask, axis=-1)))
    tracks_active = float(
        jnp.mean(jnp.sum(states.state == STATE_CONFIRMED, axis=-1))
    )

    # ---- throughput (chained state; one final readback closes the loop).
    # Bucketed mode pipelines with one chunk of detect lookahead so the
    # bucket-selection readback never idles the chip.
    import contextlib

    pipelined = hasattr(step, "detect")
    trace_cm = (jax.profiler.trace(args.trace) if args.trace
                else contextlib.nullcontext())
    t0 = time.perf_counter()
    with trace_cm:
        if pipelined:
            nxt = step.detect(det_params, frames)
            for _ in range(args.steps):
                cur = nxt
                nxt = step.detect(det_params, frames)
                states, (outputs, emit) = step.track(reid_params, states, cur)
        else:
            for _ in range(args.steps):
                states, (outputs, emit) = run_chunk(states)
        jax.block_until_ready(outputs)
    dt = time.perf_counter() - t0
    fps = s * k * args.steps / dt

    # ---- per-dispatch latency (chained state, per-step sync)
    p50 = p99 = None
    if args.latency_steps > 0:
        lat = []
        for _ in range(args.latency_steps):
            t1 = time.perf_counter()
            states, (outputs, emit) = run_chunk(states)
            jax.block_until_ready(outputs)
            lat.append((time.perf_counter() - t1) * 1e3)
        p50, p99 = percentile(lat, 50), percentile(lat, 99)

    # ---- low-latency K=1 mode: single-frame dispatch latency
    k1_p50 = k1_p99 = k1_device = None
    if not args.skip_k1_latency and k > 1 and args.latency_steps > 0:
        # static cap + windowed crops with on-device dense fallback: the
        # K=1 latency path cannot afford the bucket readback (one tunnel
        # round-trip), so capacity is a policy constant instead
        from yolo_deepsort_tpu.tracking.tracker_pallas import (
            use_fused_tracker_default,
        )

        k1_kw = {}
        if args.k1_cap and use_fused_tracker_default():
            k1_kw = dict(
                cap=min(args.k1_cap, trk_cfg.max_dets),
                crop_window=(320, 192) if args.frame_h <= 1080
                else (640, 384),
            )
        k1_rb = k1_resblock_route if use_pallas else False
        k1_pkg = pkg_for_route(k1_conv_route) if use_pallas else None
        if k1_rb == "int8":
            k1_pkg = backbone_int8_pkg
        if not use_pallas and k1_embed_int8 == "resident_pallas":
            k1_embed_int8 = "resident"
        if k1_embed_int8 and not use_fused_tracker_default():
            # resident embed lives on the fused-tracker path only; a
            # backend without the megakernel would silently run the plain
            # reid_apply on the quantized package
            print("bench: K=1 embed-int8 unavailable without the fused "
                  "tracker on this backend; running the bf16 embed",
                  file=sys.stderr)
            k1_embed_int8 = False
        k1_reid = reid_params_q if k1_embed_int8 else reid_params_plain
        step1 = make_batched_step(
            plan, det_cfg, trk_cfg, (args.frame_h, args.frame_w),
            compute_dtype=compute_dtype, use_pallas_letterbox=use_pallas,
            embed_int8=k1_embed_int8,
            use_pallas_conv=k1_conv_route if use_pallas else False,
            backbone_int8_pkg=k1_pkg,
            use_resblock=k1_rb,
            **k1_kw,
        )
        st1 = init_stream_states(trk_cfg, s)
        f1 = frames[0]
        for _ in range(max(args.warmup * k, 5)):  # confirm tracks again
            st1, (o1, e1) = step1(det_params, k1_reid, st1, f1)
        jax.block_until_ready(o1)
        lat1 = []
        for _ in range(args.latency_steps):
            t1 = time.perf_counter()
            st1, (o1, e1) = step1(det_params, k1_reid, st1, f1)
            jax.block_until_ready(o1)
            lat1.append((time.perf_counter() - t1) * 1e3)
        k1_p50, k1_p99 = percentile(lat1, 50), percentile(lat1, 99)
        # device-side step time, measured directly instead of inferred by
        # RTT subtraction (VERDICT r4 item 4): dispatch M steps back-to-back
        # with no intermediate sync (state chains on device), force once at
        # the end with a scalar readback (block_until_ready lies through
        # the axon tunnel). The single round-trip amortizes to < 1 ms/step.
        m_chain = 32
        _ = float(o1[0, 0, 0])  # settle the queue before timing
        t1 = time.perf_counter()
        for _ in range(m_chain):
            st1, (o1, e1) = step1(det_params, k1_reid, st1, f1)
        _ = float(o1[0, 0, 0])
        k1_device = (time.perf_counter() - t1) * 1e3 / m_chain

    rec = {
        "metric": f"aggregate {args.frame_h}p {args.model}-{args.img_size}"
                  " detect+track fps/chip",
        "value": round(fps, 2),
        "unit": "frames/sec/chip",
        "vs_baseline": round(fps / 500.0, 4),
        "tracks_active": round(tracks_active, 1),
        "conf_thres": round(conf_thres, 4),
        "capacity_bucket": getattr(step, "last_bucket", args.max_dets),
        "box_prior": args.box_prior,
    }
    if pallas_fallback is not None:
        # never hide a degraded run: the requested Pallas kernels did NOT
        # execute; the numbers below are the XLA-fallback configuration
        rec["pallas_fallback"] = pallas_fallback
    if embed_int8:
        rec["embed_int8"] = (
            "resident" if args.embed_int8 == "pallas" and not use_pallas
            else args.embed_int8)
    if conv_route:
        if not use_pallas:
            rec["backbone_conv"] = "off"
        elif isinstance(conv_route, dict):
            rec["backbone_conv"] = "whitelist"
            rec["backbone_bf16_layers"] = len(conv_route["bf16"])
        else:
            rec["backbone_conv"] = args.backbone_conv
        agg_pkg = pkg_for_route(conv_route)
        if agg_pkg is not None and use_pallas:
            rec["backbone_int8_layers"] = len(agg_pkg)
    if resblock_route:
        rec["resblock"] = args.resblock if use_pallas else "off"
    if getattr(step, "last_window", None) is not None:
        rec["crop_window"] = list(step.last_window)
        rec["max_crop_hw"] = list(step.last_crop_hw)
    if hasattr(step, "saturation"):
        # no-silent-caps: nonzero means detections were capped somewhere
        rec.update(step.saturation())
    if dets_per_frame is not None:
        rec["dets_per_frame"] = round(dets_per_frame, 1)
    if p50 is not None:
        rec["p50_ms"] = round(p50, 2)
        rec["p99_ms"] = round(p99, 2)
        rec["chunk_frames"] = k * s
        # steady-state per-FRAME serving latency at the achieved rate:
        # chunks fill every period = chunk_frames/fps while the previous
        # chunk computes (pipelined dispatch), so a frame waits uniformly
        # [0, period) for its chunk to fill, then one per-dispatch compute
        # latency (p50/p99 measured above). Bounded-latency contract for
        # the live-loop comparison (VideoTracker.track, SURVEY 3.1).
        period_ms = (k * s / fps) * 1e3
        rec["frame_p50_ms"] = round(0.5 * period_ms + p50, 1)
        rec["frame_p99_ms"] = round(period_ms + p99, 1)
        if args.input_fps:
            # live-ingest accounting: each stream delivers input_fps, the
            # chunk fills in k/input_fps seconds regardless of chip speed
            fill_ms = k / args.input_fps * 1e3
            rec["live_input_fps"] = args.input_fps
            rec["live_frame_p50_ms"] = round(0.5 * fill_ms + p50, 1)
            rec["live_frame_p99_ms"] = round(fill_ms + p99, 1)
    if k1_p50 is not None:
        rec["k1_p50_ms"] = round(k1_p50, 2)
        rec["k1_p99_ms"] = round(k1_p99, 2)
        rec["k1_device_ms"] = round(k1_device, 2)
        if k1_conv_route and use_pallas:
            rec["k1_backbone_conv"] = (
                "whitelist" if isinstance(k1_conv_route, dict)
                else args.backbone_conv)
        if k1_resblock_route and use_pallas:
            rec["k1_resblock"] = ("int8" if k1_resblock_route == "int8"
                                  else "pallas")
        if k1_embed_int8:
            rec["k1_embed_int8"] = ("pallas"
                                    if k1_embed_int8 == "resident_pallas"
                                    else "resident")
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
