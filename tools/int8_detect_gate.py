"""int8 accuracy gate for the DETECTOR backbone (round-4 lever: the 47%-MFU
backbone is the largest remaining block; int8 MACs only pay off through the
Pallas MXU kernel, ops/pallas_conv.py -- see docs/ROADMAP.md round-3 int8
verdicts).

Zero egress means no official weights, so the gate is framework-internal,
the same discipline as the ReID gate (tools/int8_gate.py): BN-consistent
random weights with MOT-geometry planted box priors (bench.py's honest-load
recipe), per-stream calibrated thresholds, then compare WHAT NMS EMITS --
the only detector output the tracker consumes -- between the f32 reference
forward and the W8A8 backbone (models/quantize_darknet.py; Pallas kernel on
TPU, its arithmetically-identical XLA twin elsewhere).

Gate rule (tolerance-band matching -- the calibrated threshold is the
exact k-th objectness quantile of random-weight noise, so detections AT it
flip in/out under ULP-level arithmetic changes; to separate that
threshold-calibration sensitivity from real int8 damage, each path's
above-threshold detections are matched against the OTHER path's detections
emitted at a threshold loosened by BAND=0.02 -- a detection only counts as
missing if its counterpart's confidence collapsed by more than the band or
its box moved below IoU 0.5): the int8 path may go on the serving step
only if
  * >= 95% of f32 detections (conf >= thr) match an int8 detection from
    the loosened int8 set at class-agnostic IoU >= 0.5, and vice versa
    (symmetric). Matching is class-agnostic because random-weight class
    logits are near-uniform noise whose argmax is not a meaningful
    fidelity signal; the matched pairs' class agreement is still REPORTED
    (cls_agreement) and becomes meaningful the moment real weights exist
    (tools/parity_real.py).
  * mean IoU of matched pairs >= 0.88 (box geometry preserved through the
    weighted-merge NMS),
  * mean |conf delta| of matched pairs < 0.05 (score ordering preserved;
    cascade matching consumes scores only through ordering + threshold).

Usage: python tools/int8_detect_gate.py [--model yolov3] [--frames 4]
Prints one JSON line; exit 0 iff the gate passes.

Reference parity anchor: SURVEY.md App. C/D (decode + NMS semantics are
identical on both paths; only conv arithmetic differs).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def iou_matrix(a, b):
    """(N,4) x (M,4) xyxy -> (N,M) IoU."""
    if len(a) == 0 or len(b) == 0:
        return np.zeros((len(a), len(b)), np.float32)
    x1 = np.maximum(a[:, None, 0], b[None, :, 0])
    y1 = np.maximum(a[:, None, 1], b[None, :, 1])
    x2 = np.minimum(a[:, None, 2], b[None, :, 2])
    y2 = np.minimum(a[:, None, 3], b[None, :, 3])
    inter = np.clip(x2 - x1, 0, None) * np.clip(y2 - y1, 0, None)
    area_a = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    area_b = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    return inter / np.maximum(area_a[:, None] + area_b[None, :] - inter, 1e-9)


def greedy_match(ref, got, iou_thres=0.5, class_aware=False):
    """Greedy IoU matching (class-agnostic by default -- see module doc).
    ref/got: (N,7)/(M,7) boxes7 rows [x1,y1,x2,y2,score,cls_conf,cls].
    Returns (pairs, ious) where pairs is a list of (i, j) matched
    indices."""
    m = iou_matrix(ref[:, :4], got[:, :4])
    if class_aware:
        m = np.where(ref[:, 6][:, None] == got[:, 6][None, :], m, 0.0)
    pairs, ious = [], []
    m = m.copy()
    while m.size and m.max() >= iou_thres:
        i, j = np.unravel_index(np.argmax(m), m.shape)
        pairs.append((int(i), int(j)))
        ious.append(float(m[i, j]))
        m[i, :] = 0.0
        m[:, j] = 0.0
    return pairs, ious


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="yolov3",
                   choices=["yolov3", "yolov3-tiny", "yolov4"])
    p.add_argument("--img-size", type=int, default=416)
    p.add_argument("--frames", type=int, default=4)
    p.add_argument("--frame-h", type=int, default=1080)
    p.add_argument("--frame-w", type=int, default=1920)
    p.add_argument("--target-dets", type=int, default=32)
    p.add_argument("--max-dets", type=int, default=64)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--pct", type=float, default=100.0,
                   help="activation-calibration percentile of |x| mapped "
                        "to code 127 (100 = absmax)")
    p.add_argument("--k3-only", action="store_true",
                   help="quantize only the 3x3 convs (keep 1x1 bottleneck "
                        "convs bf16 -- halves layer count for ~10% less win)")
    p.add_argument("--calib-frames", type=int, default=2)
    p.add_argument("--xla-twin", action="store_true",
                   help="force the XLA int8 twin even on TPU (kernel-free "
                        "arithmetic check)")
    args = p.parse_args()

    os.environ.setdefault(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache"))
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

    import jax
    import jax.numpy as jnp

    # honor JAX_PLATFORMS=cpu even though the axon sitecustomize pins the
    # TPU backend (same guard as the other tools/ entry points)
    if os.environ.get("JAX_PLATFORMS", "").strip() == "cpu":
        jax.config.update("jax_platforms", "cpu")

    from bench import plant_box_prior
    from yolo_deepsort_tpu.cfg.architectures import ARCHITECTURES
    from yolo_deepsort_tpu.models import weights as W
    from yolo_deepsort_tpu.models.darknet import build_network, network_apply
    from yolo_deepsort_tpu.models.quantize_darknet import (
        make_xla_int8_conv_impl,
        quantize_darknet_from_frames,
    )
    from yolo_deepsort_tpu.ops.letterbox import letterbox
    from yolo_deepsort_tpu.ops.nms import batched_nms
    from yolo_deepsort_tpu.train.yolo_cli import (
        make_forward_train,
        raw_params_to_train,
        train_params_to_raw,
    )

    t_start = time.time()

    def progress(msg):
        print(f"[{time.time() - t_start:6.1f}s] {msg}",
              file=sys.stderr, flush=True)

    plan = build_network(ARCHITECTURES[args.model](img_size=args.img_size))
    rng = np.random.default_rng(args.seed)
    frames = rng.integers(
        0, 256, (args.frames, args.frame_h, args.frame_w, 3), dtype=np.uint8)

    # BN-consistent weights + MOT box prior (bench.py honest-load recipe)
    raw = W.random_raw_params(plan.defs(), seed=args.seed)
    t_params, t_stats = raw_params_to_train(raw, plan.defs())
    xs = jax.jit(jax.vmap(lambda f: letterbox(f, args.img_size)))(
        jnp.asarray(frames))
    capture = jax.jit(
        lambda pp, st, x: make_forward_train(plan, bn_update=1.0)(pp, st, x)[1])
    new_stats = jax.device_get(capture(t_params, t_stats, xs))
    raw = train_params_to_raw(t_params, {**t_stats, **new_stats}, plan.defs())
    raw = plant_box_prior(raw, plan, (args.frame_h, args.frame_w))
    params = W.fold_inference_params(raw, plan.defs())

    progress("weights ready (BN-consistent + MOT box prior)")
    pkg = quantize_darknet_from_frames(
        plan, params, frames, args.img_size, max_frames=args.calib_frames,
        pct=args.pct, k3_only=args.k3_only)
    progress(f"calibrated int8 package: {len(pkg)} layers")
    if not pkg:
        print(json.dumps({"ok": False, "reason": "no eligible convs"}))
        sys.exit(1)

    params = jax.tree_util.tree_map(jnp.asarray, params)
    xs = jnp.asarray(xs)

    # threshold: k-th largest objectness per frame (bench calibration)
    kth = max(1, min(args.target_dets, args.max_dets))

    @jax.jit
    def f32_decode(pp, x):
        return network_apply(plan, pp, x, compute_dtype=jnp.float32)

    decoded_f32 = jax.block_until_ready(f32_decode(params, xs))
    progress("f32 forward done")
    conf_vec = np.asarray(
        jax.lax.top_k(decoded_f32[..., 4], kth)[0][:, kth - 1], np.float32)

    use_pallas = jax.default_backend() == "tpu" and not args.xla_twin
    if use_pallas:
        from yolo_deepsort_tpu.ops.pallas_conv import make_backbone_conv_impl
        conv_impl = make_backbone_conv_impl(int8_pkg=pkg)
    else:
        conv_impl = make_xla_int8_conv_impl(pkg)

    @jax.jit
    def int8_decode(pp, x):
        return network_apply(plan, pp, x, compute_dtype=jnp.bfloat16,
                             conv_impl=conv_impl)

    decoded_i8 = jax.block_until_ready(int8_decode(params, xs))
    progress(f"int8 forward done ({'pallas' if use_pallas else 'xla twin'})")

    BAND = 0.02  # tolerance band (module doc)

    def run_nms(decoded, thr_vec):
        b7, mask = batched_nms(
            decoded.astype(jnp.float32), jnp.asarray(thr_vec), 0.4,
            512, args.max_dets)
        return np.asarray(b7, np.float32), np.asarray(mask)

    # both paths at the LOOSENED threshold; the strict sets are the rows
    # at/above the calibrated threshold within them
    lo_vec = conf_vec - BAND
    b7_f32, m_f32 = run_nms(decoded_f32, lo_vec)
    b7_i8, m_i8 = run_nms(decoded_i8, lo_vec)

    n_ref = n_got = 0
    miss_ref = miss_got = 0
    all_ious, conf_err, cls_agree = [], [], []
    for i in range(args.frames):
        ref = b7_f32[i][m_f32[i]]   # f32 at thr - BAND
        got = b7_i8[i][m_i8[i]]     # int8 at thr - BAND
        pairs, ious = greedy_match(ref, got)
        thr = float(conf_vec[i])
        ref_strict = {j for j in range(len(ref)) if ref[j, 4] >= thr}
        got_strict = {j for j in range(len(got)) if got[j, 4] >= thr}
        n_ref += len(ref_strict)
        n_got += len(got_strict)
        mi = {a for a, _ in pairs}
        mj = {b for _, b in pairs}
        miss_ref += sum(1 for j in ref_strict if j not in mi)
        miss_got += sum(1 for j in got_strict if j not in mj)
        # fidelity stats over matched pairs with at least one strict member
        for (a, b), iou in zip(pairs, ious):
            if a in ref_strict or b in got_strict:
                all_ious.append(iou)
                conf_err.append(abs(float(ref[a, 4]) - float(got[b, 4])))
                cls_agree.append(float(ref[a, 6] == got[b, 6]))

    match_ref = 1.0 - miss_ref / max(n_ref, 1)
    match_got = 1.0 - miss_got / max(n_got, 1)
    mean_iou = float(np.mean(all_ious)) if all_ious else 0.0
    conf_mae = float(np.mean(conf_err)) if conf_err else 1.0
    ok = (match_ref >= 0.95 and match_got >= 0.95
          and mean_iou >= 0.88 and conf_mae < 0.05 and n_ref > 0)

    print(json.dumps({
        "gate": "detector-int8",
        "ok": bool(ok),
        "model": args.model,
        "route": "pallas" if use_pallas else "xla-twin",
        "pct": args.pct,
        "k3_only": bool(args.k3_only),
        "int8_layers": len(pkg),
        "dets_f32": n_ref,
        "dets_int8": n_got,
        "matched_frac_f32": round(match_ref, 4),
        "matched_frac_int8": round(match_got, 4),
        "mean_iou": round(mean_iou, 4),
        "conf_mae": round(conf_mae, 4),
        "cls_agreement": round(float(np.mean(cls_agree)), 4)
        if cls_agree else None,
        "elapsed_s": round(time.time() - t_start, 1),
    }))
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
