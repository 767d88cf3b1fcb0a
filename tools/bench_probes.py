"""One-off perf probes for ROADMAP experiments, honest-load conditions.

  --probe reid-layout   : ReID embed NHWC (production) vs NCHW A/B at the
                          chunked batch size (K*S*cap crops)
  --probe nms-share     : detect stage vs letterbox+backbone only -- NMS's
                          share of the detect dispatch
  --probe counts        : per-stream detection counts + chunk max (bucket
                          pressure) under the calibrated load

Chained-state timing discipline throughout (see DESIGN.md).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _setup():
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          "/root/repo/.jax_cache")
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")


def bn_weights_and_frames(model, img_size, k, s, hw, target, box_prior=True):
    import jax
    import jax.numpy as jnp

    from yolo_deepsort_tpu.cfg.architectures import ARCHITECTURES
    from yolo_deepsort_tpu.models import weights as W
    from yolo_deepsort_tpu.models.darknet import build_network, network_apply
    from yolo_deepsort_tpu.ops.letterbox import letterbox
    from yolo_deepsort_tpu.train.yolo_cli import (
        make_forward_train,
        raw_params_to_train,
        train_params_to_raw,
    )

    plan = build_network(ARCHITECTURES[model](img_size=img_size))
    raw = W.random_raw_params(plan.defs(), seed=0)
    rng = np.random.default_rng(0)
    base = rng.integers(0, 256, (s, *hw, 3), dtype=np.uint8)
    frames = jnp.asarray(np.broadcast_to(base[None], (k, s, *hw, 3)).copy())
    t_params, t_stats = raw_params_to_train(raw, plan.defs())
    capture = jax.jit(
        lambda p, st, x: make_forward_train(plan, bn_update=1.0)(p, st, x)[1]
    )
    xs = jax.vmap(lambda f: letterbox(f, img_size))(frames[0])
    new_stats = jax.device_get(capture(t_params, t_stats, xs))
    raw = train_params_to_raw(t_params, {**t_stats, **new_stats}, plan.defs())
    if box_prior:  # same MOT-person geometry as the headline bench
        from bench import plant_box_prior

        raw = plant_box_prior(raw, plan, hw)
    det_params = jax.tree_util.tree_map(
        jnp.asarray, W.fold_inference_params(raw, plan.defs()))

    conf_vec = calibrate_conf(plan, det_params, frames[0], img_size, target)
    return plan, det_params, frames, conf_vec


def calibrate_conf(plan, det_params, frames_s, img_size, target):
    """Per-stream objectness threshold putting ~target dets above it —
    calibrated on the ACTUAL frames the run will see (synthetic noise vs
    decoded video have very different conf distributions; calibrating on
    the wrong one shifts the whole capacity-bucket ladder)."""
    import jax
    import jax.numpy as jnp

    from yolo_deepsort_tpu.models.darknet import network_apply
    from yolo_deepsort_tpu.ops.letterbox import letterbox

    @jax.jit
    def obj_quantile(dp, flat):
        x = jax.vmap(lambda f: letterbox(f, img_size))(flat)
        d = network_apply(plan, dp, x, compute_dtype=jnp.bfloat16)
        top = jax.lax.top_k(d[..., 4], target)[0]
        return top[:, target - 1]

    return np.asarray(obj_quantile(det_params, jnp.asarray(frames_s)),
                      np.float32)


def main():
    _setup()
    p = argparse.ArgumentParser()
    p.add_argument("--probe", required=True,
                   choices=["reid-layout", "nms-share", "counts", "stem",
                            "track-split", "crops-impl", "jv-scan",
                            "crop-window", "k1-split"])
    p.add_argument("--model", default="yolov3")
    p.add_argument("--img-size", type=int, default=416)
    p.add_argument("--scan", type=int, default=16)
    p.add_argument("--streams", type=int, default=8)
    p.add_argument("--cap", type=int, default=40)
    p.add_argument("--steps", type=int, default=8)
    p.add_argument("--target-dets", type=int, default=32)
    args = p.parse_args()

    import jax
    import jax.lax as lax
    import jax.numpy as jnp

    k, s, hw = args.scan, args.streams, (1080, 1920)
    out = {"probe": args.probe}

    if args.probe == "reid-layout":
        from yolo_deepsort_tpu.models.reid import random_reid_params, reid_apply

        params = jax.tree_util.tree_map(jnp.asarray, random_reid_params(0))
        n = k * s * args.cap
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(0, 1, (n, 128, 64, 3)).astype(np.float32))

        @jax.jit
        def nhwc(p, x, bump):
            f = reid_apply(p, x + bump, compute_dtype=jnp.bfloat16)
            return f, jnp.isnan(jnp.sum(f)).astype(jnp.float32)

        # NCHW variant: same math, channels-first conv layout
        def conv_nchw(x, pw, pb, stride, pad):
            o = lax.conv_general_dilated(
                x.astype(jnp.bfloat16),
                jnp.asarray(pw, jnp.bfloat16).transpose(3, 2, 0, 1),
                (stride, stride), [(pad, pad), (pad, pad)],
                dimension_numbers=("NCHW", "OIHW", "NCHW"),
                preferred_element_type=jnp.float32,
            )
            return o + jnp.asarray(pb, jnp.float32)[None, :, None, None]

        def reid_nchw(p, x):
            o = conv_nchw(x, p["stem"]["w"], p["stem"]["b"], 1, 1)
            o = jnp.maximum(o, 0).astype(jnp.bfloat16)
            o = lax.reduce_window(o, -jnp.inf, lax.max, (1, 1, 3, 3),
                                  (1, 1, 2, 2),
                                  [(0, 0), (0, 0), (1, 1), (1, 1)])
            for blocks in p["layers"]:
                for b in blocks:
                    stride = 1
                    if b["down"] is not None:
                        ci, co = b["conv1"]["w"].shape[2], b["conv1"]["w"].shape[3]
                        stride = 2 if ci != co else 1
                    y = conv_nchw(o, b["conv1"]["w"], b["conv1"]["b"], stride, 1)
                    y = jnp.maximum(y, 0).astype(jnp.bfloat16)
                    y = conv_nchw(y, b["conv2"]["w"], b["conv2"]["b"], 1, 1)
                    sc = (conv_nchw(o, b["down"]["w"], b["down"]["b"], stride, 0)
                          if b["down"] is not None else o.astype(jnp.float32))
                    o = jnp.maximum(y + sc, 0).astype(jnp.bfloat16)
            feat = jnp.mean(o.astype(jnp.float32), axis=(2, 3))
            return feat / jnp.maximum(
                jnp.linalg.norm(feat, axis=1, keepdims=True), 1e-12)

        @jax.jit
        def nchw(p, x, bump):
            f = reid_nchw(p, jnp.transpose(x + bump, (0, 3, 1, 2)))
            return f, jnp.isnan(jnp.sum(f)).astype(jnp.float32)

        for name, fn in (("nhwc", nhwc), ("nchw", nchw)):
            bump = jnp.float32(0)
            f, bump = fn(params, x, bump)
            float(bump)  # host readback closes the chain (axon quirk)
            t0 = time.perf_counter()
            for _ in range(args.steps):
                f, bump = fn(params, x, bump)
            float(bump)
            out[f"{name}_ms"] = round(
                (time.perf_counter() - t0) / args.steps * 1e3, 1)
        # sanity: same features
        fa = np.asarray(nhwc(params, x, jnp.float32(0))[0])
        fb = np.asarray(nchw(params, x, jnp.float32(0))[0])
        out["max_feat_diff"] = float(np.abs(fa - fb).max())

    elif args.probe == "jv-scan":
        # isolate the association solver at tracker cadence: K sequential
        # (scanned) JV cascade solves, vmapped over S streams, ~30 active
        # rows x cap columns -- how much of the 45 ms/chunk tracker scan is
        # the nested while_loop solver?
        from yolo_deepsort_tpu.ops.assignment import solve_cascade_assignment
        from yolo_deepsort_tpu.ops.assignment_pallas import (
            solve_cascade_assignment_pallas,
        )

        if os.environ.get("JV_IMPL") == "pallas":
            solve_cascade_assignment = solve_cascade_assignment_pallas
        rng = np.random.default_rng(0)
        r_rows, cols, active = 128, args.cap, 30
        cost = rng.uniform(0.0, 0.4, (s, r_rows, cols)).astype(np.float32)
        row_mask = np.zeros((s, r_rows), bool)
        row_mask[:, :active] = True
        col_mask = np.zeros((s, cols), bool)
        col_mask[:, :args.target_dets] = True
        levels = rng.integers(0, 5, (s, r_rows)).astype(np.int32)

        solve = jax.vmap(
            lambda c, l, rm, cm: solve_cascade_assignment(c, l, rm, cm, 0.2)
        )

        @jax.jit
        def scan_k(cost, levels, row_mask, col_mask, bump):
            def body(carry, _):
                out = solve(cost + carry, levels, row_mask, col_mask)
                # chain: next iteration's costs depend on this solve
                return carry + jnp.float32(1e-30) * jnp.sum(out), out

            carry, outs = jax.lax.scan(
                body, bump, None, length=k)
            return outs, carry

        bump = jnp.float32(0)
        outs, bump = scan_k(cost, levels, row_mask, col_mask, bump)
        float(bump)
        t0 = time.perf_counter()
        for _ in range(args.steps):
            outs, bump = scan_k(cost, levels, row_mask, col_mask, bump)
        float(bump)
        out["jv_scan_ms_per_chunk"] = round(
            (time.perf_counter() - t0) / args.steps * 1e3, 1)
        out["rows_active"] = active
        out["cols"] = cols

    elif args.probe == "stem":
        # Space-to-depth A/B for the yolov3 stem (ROADMAP exp. 2 / round-1
        # VERDICT next-step 3): conv0 (3x3 s1 3->32) + leaky + conv1
        # (3x3 s2 32->64) + leaky, naive at 416^2 x C=3 (the MXU pads the
        # 27-deep contraction) vs an EXACT block-space rewrite on
        # s2d(2) input (208^2 x 12, contractions 108/128-deep).
        rng = np.random.default_rng(0)
        n = k * s
        x = jnp.asarray(rng.normal(0, 1, (n, 416, 416, 3)).astype(np.float32))
        w0 = rng.normal(0, 0.1, (3, 3, 3, 32)).astype(np.float32)
        b0 = rng.normal(0, 0.1, 32).astype(np.float32)
        w1 = rng.normal(0, 0.05, (3, 3, 32, 64)).astype(np.float32)
        b1 = rng.normal(0, 0.1, 64).astype(np.float32)

        def leaky(v):
            return jnp.where(v > 0, v, 0.1 * v)

        def conv(v, w, stride, pad):
            return lax.conv_general_dilated(
                v.astype(jnp.bfloat16), jnp.asarray(w, jnp.bfloat16),
                (stride, stride), [(pad, pad), (pad, pad)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32,
            )

        @jax.jit
        def naive(x, bump):
            y = leaky(conv(x + bump, w0, 1, 1) + b0)
            z = leaky(conv(y, w1, 2, 1) + b1)
            return z, jnp.sum(z[0, 0, 0])

        # exact block-space weights
        w0p = np.zeros((3, 3, 12, 128), np.float32)
        b0p = np.zeros(128, np.float32)
        for a in range(2):
            for b in range(2):
                b0p[(a * 2 + b) * 32:(a * 2 + b) * 32 + 32] = b0
                for dp in range(3):
                    for dq in range(3):
                        di = (a + dp - 1) // 2 + 1
                        dj = (b + dq - 1) // 2 + 1
                        pa = (a + dp - 1) % 2
                        pb = (b + dq - 1) % 2
                        for c in range(3):
                            w0p[di, dj, (pa * 2 + pb) * 3 + c,
                                (a * 2 + b) * 32:(a * 2 + b) * 32 + 32] += \
                                w0[dp, dq, c]
        w1p = np.zeros((2, 2, 128, 64), np.float32)
        for dp in range(3):
            for dq in range(3):
                di = (dp - 1) // 2 + 1
                dj = (dq - 1) // 2 + 1
                pa = (dp - 1) % 2
                pb = (dq - 1) % 2
                for c in range(32):
                    w1p[di, dj, (pa * 2 + pb) * 32 + c] += w1[dp, dq, c]

        @jax.jit
        def s2d(x, bump):
            xb = (x + bump).reshape(n, 208, 2, 208, 2, 3).transpose(
                0, 1, 3, 2, 4, 5).reshape(n, 208, 208, 12)
            yb = leaky(conv(xb, w0p, 1, 1) + b0p)
            z = leaky(lax.conv_general_dilated(
                yb.astype(jnp.bfloat16), jnp.asarray(w1p, jnp.bfloat16),
                (1, 1), [(1, 0), (1, 0)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32,
            ) + b1)
            return z, jnp.sum(z[0, 0, 0])

        za, _ = naive(x, jnp.float32(0))
        zb, _ = s2d(x, jnp.float32(0))
        out["max_diff"] = float(jnp.max(jnp.abs(za - zb)))
        out["out_rms"] = float(jnp.sqrt(jnp.mean(za * za)))
        for name, fn in (("naive", naive), ("s2d", s2d)):
            bump = jnp.float32(0)
            z, rb = fn(x, bump)
            bump = rb * 1e-30
            float(rb)
            t0 = time.perf_counter()
            for _ in range(args.steps):
                z, rb = fn(x, bump)
                bump = rb * 1e-30
            float(rb)
            out[f"{name}_ms"] = round(
                (time.perf_counter() - t0) / args.steps * 1e3, 1)

    elif args.probe == "k1-split":
        # K=1 (single-frame dispatch) latency decomposition at S streams:
        # where do the ~60 ms go?  Times the full batched step, its
        # stateless half (letterbox->backbone->NMS->crop->embed), the
        # letterbox+backbone alone, and the fused tracker alone -- all
        # chained, per-dispatch sync (latency discipline, not throughput).
        from functools import partial as _partial

        from yolo_deepsort_tpu.config import DetectorConfig, TrackerConfig
        from yolo_deepsort_tpu.models.darknet import network_apply
        from yolo_deepsort_tpu.models.reid import random_reid_params
        from yolo_deepsort_tpu.ops.pallas_letterbox import (
            pallas_letterbox_batch,
        )
        from yolo_deepsort_tpu.parallel.streams import (
            fused_frame_step,
            init_stream_states,
            make_batched_step,
        )
        from yolo_deepsort_tpu.tracking.tracker_pallas import (
            tracker_step_fused_batched,
        )

        plan, det_params, frames, conf_vec = bn_weights_and_frames(
            args.model, args.img_size, 1, s, hw, args.target_dets)
        fr1 = frames[0]  # (S, H, W, 3)
        det_cfg = DetectorConfig(img_size=args.img_size,
                                 conf_thres=float(conf_vec.mean()))
        trk_cfg = TrackerConfig()
        reid_params = jax.tree_util.tree_map(
            jnp.asarray, random_reid_params(0))

        def sync(x):
            # host readback of ONE element (sliced on device first -- a bare
            # np.asarray would ship the whole tensor through the tunnel);
            # block_until_ready is unreliable on axon (DESIGN.md)
            leaf = jax.tree_util.tree_leaves(x)[0]
            np.asarray(leaf.ravel()[:1])

        def timeit(name, fn, state):
            state = fn(state)  # compile + warm
            sync(state)
            state = fn(state)
            sync(state)
            lat = []
            for _ in range(args.steps):
                t0 = time.perf_counter()
                state = fn(state)
                sync(state)
                lat.append((time.perf_counter() - t0) * 1e3)
            lat.sort()
            out[name + "_p50_ms"] = round(lat[len(lat) // 2], 1)
            # chained: dispatch all steps, sync once -- device time per step
            # without the tunnel round-trip that dominates p50 at K=1
            t0 = time.perf_counter()
            for _ in range(args.steps):
                state = fn(state)
            sync(state)
            out[name + "_chained_ms"] = round(
                (time.perf_counter() - t0) / args.steps * 1e3, 1)

        # full step (production K=1 path)
        step = make_batched_step(plan, det_cfg, trk_cfg, hw,
                                 compute_dtype=jnp.bfloat16,
                                 donate_state=False,
                                 use_pallas_letterbox=True)
        st0 = init_stream_states(trk_cfg, s)

        def full(st):
            st2, (o, e) = step(det_params, reid_params, st, fr1)
            return st2

        timeit("full_step", full, st0)

        # low-latency variant: static cap + windowed crops (dense fallback
        # guard on device) -- what bench.py's K=1 mode runs
        step_ll = make_batched_step(plan, det_cfg, trk_cfg, hw,
                                    compute_dtype=jnp.bfloat16,
                                    donate_state=False,
                                    use_pallas_letterbox=True,
                                    cap=args.cap, crop_window=(320, 192))

        def full_ll(st):
            st2, (o, e) = step_ll(det_params, reid_params, st, fr1)
            return st2

        timeit("full_step_lowlat", full_ll, init_stream_states(trk_cfg, s))

        # stateless half only
        pre = jax.jit(lambda dp, rp, fr: jax.vmap(
            lambda f, x: fused_frame_step(
                plan, det_cfg, trk_cfg, hw, dp, rp, None, f,
                compute_dtype=jnp.bfloat16, letterboxed=x, return_dets=True),
        )(fr, pallas_letterbox_batch(fr, det_cfg.img_size)))

        timeit("stateless_half",
               lambda _: pre(det_params, reid_params, fr1), None)

        # letterbox + backbone only
        bb = jax.jit(lambda dp, fr: network_apply(
            plan, dp, pallas_letterbox_batch(fr, det_cfg.img_size),
            compute_dtype=jnp.bfloat16))

        timeit("letterbox_backbone", lambda _: bb(det_params, fr1), None)

        # tracker alone (fused megakernel), chained state
        tlwh, conf, feats, mask = jax.block_until_ready(
            pre(det_params, reid_params, fr1))
        img_hw = jnp.array(hw, jnp.int32)
        trk = jax.jit(_partial(tracker_step_fused_batched, trk_cfg))

        def tracker(st):
            st2, o, e = trk(st, tlwh, conf, feats, mask, img_hw)
            return st2

        timeit("tracker_fused", tracker, init_stream_states(trk_cfg, s))
        out["derived_nms_crop_embed_ms"] = round(
            out["stateless_half_chained_ms"]
            - out["letterbox_backbone_chained_ms"], 1)
        out["derived_tunnel_rtt_ms"] = round(
            out["tracker_fused_p50_ms"] - out["tracker_fused_chained_ms"], 1)
        out["streams"] = s

    elif args.probe == "crop-window":
        # windowed vs dense crop resampler at chunk scale: D = K*S*cap boxes
        # with MOT-person-like geometry (the workload the window ladder is
        # sized for), plus a heavy-tailed variant. Timing isolates the crop
        # stage exactly as the track stage runs it (vmap over K*S frames).
        from yolo_deepsort_tpu.ops.crops import (
            CROP_H, CROP_W, REID_MEAN, REID_STD,
            crop_and_normalize, crop_and_normalize_windowed)

        rng = np.random.default_rng(0)
        n_frames, cap = k * s, args.cap
        h2, w2 = hw
        frames2 = jnp.asarray(rng.integers(
            0, 256, (n_frames, h2, w2, 3), dtype=np.uint8))
        # person-like boxes: h ~ N(250, 60), aspect ~0.4
        bh = np.clip(rng.normal(250, 60, (n_frames, cap)), 40, 315)
        bw = np.clip(bh * rng.normal(0.4, 0.08, (n_frames, cap)), 16, 188)
        cx = rng.uniform(0, w2, (n_frames, cap))
        cy = rng.uniform(0, h2, (n_frames, cap))
        boxes = jnp.asarray(np.stack(
            [cx - bw / 2, cy - bh / 2, cx + bw / 2, cy + bh / 2],
            axis=-1).astype(np.float32))

        def windowed_aligned(frame, boxes, win_h, win_w,
                             compute_dtype=jnp.bfloat16):
            """Like crop_and_normalize_windowed but with 8-row / 128-lane
            ALIGNED window origins (padded window) -- does XLA's gather get
            fast when the slices are tile-aligned?"""
            from yolo_deepsort_tpu.ops.crops import (
                crop_window_bounds, _interp_matrix)
            img = jnp.asarray(frame)
            h2, w2 = img.shape[0], img.shape[1]
            wh = min(win_h + 8, h2)
            ww = min(win_w + 128, w2)
            x1, y1, x2, y2 = crop_window_bounds(boxes, h2, w2)
            oy = (jnp.clip(y1, 0, h2 - wh) // 8) * 8
            ox = (jnp.clip(x1, 0, w2 - ww) // 128) * 128
            windows = jax.vmap(
                lambda yo, xo: jax.lax.dynamic_slice(
                    img, (yo, xo, 0), (wh, ww, 3))
            )(oy, ox)
            wy = _interp_matrix(y1 - oy, y2 - oy, wh, CROP_H, compute_dtype)
            wx = _interp_matrix(x1 - ox, x2 - ox, ww, CROP_W, compute_dtype)
            winc = windows.astype(compute_dtype)
            tmp = jnp.einsum("dxw,dhwc->dhxc", wx, winc,
                             preferred_element_type=jnp.float32
                             ).astype(compute_dtype)
            crops = jnp.einsum("dyh,dhxc->dyxc", wy, tmp,
                               preferred_element_type=jnp.float32)
            return (crops / 255.0 - REID_MEAN) / REID_STD

        from yolo_deepsort_tpu.ops.pallas_crops import (
            pallas_crop_and_normalize_batch)

        variants = {"dense": None, "win320x192": (320, 192),
                    "win640x384": (640, 384), "win160x96": (160, 96),
                    "al320x192": ("aligned", 320, 192),
                    "al640x384": ("aligned", 640, 384),
                    "pl320x192g1": ("pallas", 320, 192, 1),
                    "pl320x192g4": ("pallas", 320, 192, 4),
                    "pl320x192g8": ("pallas", 320, 192, 8),
                    "pl640x384g4": ("pallas", 640, 384, 4),
                    "pl160x96g8": ("pallas", 160, 96, 8)}
        ref = None
        for name, win in variants.items():
            batched_fn = None
            if win is None:
                fn1 = lambda f, b: crop_and_normalize(
                    f, b, compute_dtype=jnp.bfloat16)
            elif win[0] == "aligned":
                fn1 = (lambda wn: lambda f, b: windowed_aligned(
                    f, b, wn[1], wn[2]))(win)
            elif win[0] == "pallas":
                batched_fn = (
                    lambda wn: lambda fr, bx: pallas_crop_and_normalize_batch(
                        fr, bx, wn[1], wn[2], crops_per_program=wn[3]))(win)
                fn1 = None
            else:
                fn1 = (lambda wn: lambda f, b: crop_and_normalize_windowed(
                    f, b, wn[0], wn[1], compute_dtype=jnp.bfloat16))(win)

            @jax.jit
            def run(fr, bx, bump, fn1=fn1, batched_fn=batched_fn):
                if batched_fn is not None:
                    c = batched_fn(fr, bx + bump)
                else:
                    c = jax.vmap(fn1)(fr, bx + bump)
                return c, jnp.sum(c[0, 0, 0, 0])

            try:
                c, rb = run(frames2, boxes, jnp.float32(0))
                if win is None:
                    ref = np.asarray(c[:2], np.float32)
                elif win == (320, 192) and ref is not None:
                    out["max_diff_vs_dense"] = float(
                        np.abs(np.asarray(c[:2], np.float32) - ref).max())
                bump = rb * 1e-30
                float(rb)
                t0 = time.perf_counter()
                for _ in range(args.steps):
                    c, rb = run(frames2, boxes, bump)
                    bump = rb * 1e-30
                float(rb)
                out[f"{name}_ms"] = round(
                    (time.perf_counter() - t0) / args.steps * 1e3, 1)
            except Exception as e:
                out[f"{name}_ms"] = f"FAILED: {type(e).__name__}"

    else:
        from yolo_deepsort_tpu.config import DetectorConfig, TrackerConfig
        from yolo_deepsort_tpu.models.darknet import network_apply
        from yolo_deepsort_tpu.ops.pallas_letterbox import pallas_letterbox_batch
        from yolo_deepsort_tpu.parallel.streams import make_scanned_detect_stage

        plan, det_params, frames, conf_vec = bn_weights_and_frames(
            args.model, args.img_size, k, s, hw, args.target_dets)
        det_cfg = DetectorConfig(img_size=args.img_size,
                                 conf_thres=float(conf_vec.mean()))
        trk_cfg = TrackerConfig(max_dets=64)
        detect = make_scanned_detect_stage(
            plan, det_cfg, trk_cfg, hw, compute_dtype=jnp.bfloat16,
            use_pallas_letterbox=True, conf_thres_per_stream=conf_vec)

        if args.probe == "crops-impl":
            # Crop-resampler A/Bs at the honest chunk load. Results so far
            # (cap 36): matmul 90.0 / column-gather 91.4 (lane gathers slow)
            # / row-gather OOM under full-chunk vmap -> retried with lax.map
            # sub-batching below.
            from yolo_deepsort_tpu.ops.crops import (
                CROP_H, CROP_W, REID_MEAN, REID_STD, _interp_matrix,
                crop_and_normalize)
            from yolo_deepsort_tpu.ops.letterbox import rescale_boxes

            def crop_gather_cols(frame, boxes, compute_dtype=jnp.bfloat16):
                """Column-gather X + matmul Y (measured: no win)."""
                img = jnp.asarray(frame)
                h2, w2 = img.shape[0], img.shape[1]
                dd = boxes.shape[0]
                x1 = jnp.clip(boxes[:, 0].astype(jnp.int32), 0, w2 - 1)
                y1 = jnp.clip(boxes[:, 1].astype(jnp.int32), 0, h2 - 1)
                x2 = jnp.clip(boxes[:, 2].astype(jnp.int32), x1 + 1, w2)
                y2 = jnp.clip(boxes[:, 3].astype(jnp.int32), y1 + 1, h2)
                st, en = x1.astype(jnp.float32), x2.astype(jnp.float32)
                rr = (jnp.arange(CROP_W, dtype=jnp.float32) + 0.5) / CROP_W
                cx = st[:, None] + rr[None, :] * (en - st)[:, None] - 0.5
                cx = jnp.clip(cx, st[:, None],
                              jnp.maximum(en[:, None] - 1.0, st[:, None]))
                i0 = jnp.clip(jnp.floor(cx).astype(jnp.int32), 0, w2 - 2)
                fw = (cx - i0).astype(compute_dtype)
                idx = jnp.stack([i0, i0 + 1], axis=0).reshape(-1)
                cols = jnp.take(img, idx, axis=1)
                cols = cols.reshape(h2, 2, dd, CROP_W, 3).astype(compute_dtype)
                xrow = (cols[:, 0] * (1 - fw)[None, :, :, None]
                        + cols[:, 1] * fw[None, :, :, None])
                wy = _interp_matrix(y1, y2, h2, CROP_H, compute_dtype)
                crops = jnp.einsum("dyh,hdxc->dyxc", wy, xrow,
                                   preferred_element_type=jnp.float32)
                return (crops / 255.0 - REID_MEAN) / REID_STD

            def crop_gather_rows(frame, boxes, compute_dtype=jnp.bfloat16):
                """Row-gather Y (DMA-shaped) + per-crop X matmul (47M vs
                398M MAC/crop); needs sub-batching to bound intermediates."""
                img = jnp.asarray(frame)
                h2, w2 = img.shape[0], img.shape[1]
                dd = boxes.shape[0]
                x1 = jnp.clip(boxes[:, 0].astype(jnp.int32), 0, w2 - 1)
                y1 = jnp.clip(boxes[:, 1].astype(jnp.int32), 0, h2 - 1)
                x2 = jnp.clip(boxes[:, 2].astype(jnp.int32), x1 + 1, w2)
                y2 = jnp.clip(boxes[:, 3].astype(jnp.int32), y1 + 1, h2)
                st, en = y1.astype(jnp.float32), y2.astype(jnp.float32)
                rr = (jnp.arange(CROP_H, dtype=jnp.float32) + 0.5) / CROP_H
                cy = st[:, None] + rr[None, :] * (en - st)[:, None] - 0.5
                cy = jnp.clip(cy, st[:, None],
                              jnp.maximum(en[:, None] - 1.0, st[:, None]))
                j0 = jnp.clip(jnp.floor(cy).astype(jnp.int32), 0, h2 - 2)
                g = (cy - j0).astype(compute_dtype)
                idx = jnp.stack([j0, j0 + 1], axis=0).reshape(-1)
                rows = jnp.take(img, idx, axis=0)
                rows = rows.reshape(2, dd, CROP_H, w2, 3).astype(compute_dtype)
                yrow = (rows[0] * (1 - g)[:, :, None, None]
                        + rows[1] * g[:, :, None, None])
                wx = _interp_matrix(x1, x2, w2, CROP_W, compute_dtype)
                crops = jnp.einsum("dxw,dywc->dyxc", wx, yrow,
                                   preferred_element_type=jnp.float32)
                return (crops / 255.0 - REID_MEAN) / REID_STD

            b7, m, mc = detect(det_params, frames)
            cap = args.cap
            h, w = hw

            def boxes_of(b7c):
                xyxy = jax.vmap(
                    lambda b: rescale_boxes(b[:, :4], args.img_size, h, w)
                )(b7c[:, :cap])
                x1 = jnp.clip(xyxy[..., 0], 0, w - 1)
                y1 = jnp.clip(xyxy[..., 1], 0, h - 1)
                x2 = jnp.clip(xyxy[..., 2], 0, w - 1)
                y2 = jnp.clip(xyxy[..., 3], 0, h - 1)
                return jnp.stack([x1, y1, x2, y2], axis=-1)

            variants = (
                ("matmul", crop_and_normalize, 0),
                ("rowgather_map8", crop_gather_rows, 8),
                ("rowgather_map16", crop_gather_rows, 16),
            )
            for name, impl, groups in variants:
                @jax.jit
                def run(fr, b7c, bump, impl=impl, groups=groups):
                    flat = fr.reshape(k * s, *hw, 3)
                    boxes = boxes_of(b7c + bump)
                    if groups == 0:
                        c = jax.vmap(
                            lambda f, bb: impl(
                                f, bb, compute_dtype=jnp.bfloat16)
                        )(flat, boxes)
                    else:  # bound gather intermediates: map over sub-batches
                        c = jax.lax.map(
                            lambda a: jax.vmap(
                                lambda f, bb: impl(
                                    f, bb, compute_dtype=jnp.bfloat16)
                            )(*a),
                            (flat.reshape(groups, -1, *hw, 3),
                             boxes.reshape(groups, -1, cap, 4)),
                        )
                    return jnp.sum(c.reshape(-1)[0])

                try:
                    bump = jnp.float32(0)
                    rb = run(frames, b7, bump)
                    float(rb)
                    t0 = time.perf_counter()
                    for _ in range(args.steps):
                        rb = run(frames, b7, bump)
                        bump = rb * 1e-30
                    float(rb)
                    out[f"{name}_ms"] = round(
                        (time.perf_counter() - t0) / args.steps * 1e3, 1)
                except Exception as e:
                    out[f"{name}_ms"] = f"FAILED: {type(e).__name__}"
            out["cap"] = cap

        elif args.probe == "track-split":
            # attribute the track stage: crops alone, crops+embed, full
            from yolo_deepsort_tpu.models.reid import (
                random_reid_params, reid_apply)
            from yolo_deepsort_tpu.ops.crops import crop_and_normalize
            from yolo_deepsort_tpu.ops.letterbox import rescale_boxes
            from yolo_deepsort_tpu.parallel.streams import (
                init_stream_states, make_scanned_track_stage)

            reid_params = jax.tree_util.tree_map(
                jnp.asarray, random_reid_params(0))
            b7, m, mc = detect(det_params, frames)
            cap = args.cap
            h, w = hw

            def crops_of(fr, b7c):
                flat = fr.reshape(k * s, *hw, 3)
                xyxy = jax.vmap(
                    lambda b: rescale_boxes(b[:, :4], args.img_size, h, w)
                )(b7c[:, :cap])
                x1 = jnp.clip(xyxy[..., 0], 0, w - 1)
                y1 = jnp.clip(xyxy[..., 1], 0, h - 1)
                x2 = jnp.clip(xyxy[..., 2], 0, w - 1)
                y2 = jnp.clip(xyxy[..., 3], 0, h - 1)
                return jax.vmap(
                    lambda f, bb: crop_and_normalize(
                        f, bb, compute_dtype=jnp.bfloat16)
                )(flat, jnp.stack([x1, y1, x2, y2], axis=-1))

            @jax.jit
            def crops_only(fr, b7c, bump):
                c = crops_of(fr, b7c + bump)
                return jnp.sum(c[0, 0, 0, 0])

            @jax.jit
            def crops_embed(fr, b7c, bump):
                c = crops_of(fr, b7c + bump)
                f = reid_apply(
                    reid_params, c.reshape(k * s * cap, *c.shape[2:]),
                    compute_dtype=jnp.bfloat16)
                return jnp.sum(f[0])

            for name, fn in (("crops", crops_only),
                             ("crops_embed", crops_embed)):
                bump = jnp.float32(0)
                rb = fn(frames, b7, bump)
                float(rb)
                t0 = time.perf_counter()
                for _ in range(args.steps):
                    rb = fn(frames, b7, bump)
                    bump = rb * 1e-30
                float(rb)
                out[f"{name}_ms"] = round(
                    (time.perf_counter() - t0) / args.steps * 1e3, 1)

            track = make_scanned_track_stage(
                det_cfg, trk_cfg, hw, cap, compute_dtype=jnp.bfloat16,
                donate_state=False)
            states = init_stream_states(trk_cfg, s)
            for _ in range(3):
                states, (outs, emit) = track(reid_params, states, frames,
                                             b7, m)
            float(jnp.sum(outs[0, 0, 0]))
            t0 = time.perf_counter()
            for _ in range(args.steps):
                states, (outs, emit) = track(reid_params, states, frames,
                                             b7, m)
            float(jnp.sum(outs[0, 0, 0]))
            out["track_full_ms"] = round(
                (time.perf_counter() - t0) / args.steps * 1e3, 1)
            out["cap"] = cap

        elif args.probe == "counts":
            b7, m, mc = detect(det_params, frames)
            counts = np.asarray(jnp.sum(m, axis=-1)).reshape(k, s)
            out["per_stream_counts"] = counts[0].tolist()
            out["chunk_max"] = int(np.asarray(mc)[0])
            out["max_crop_hw"] = np.asarray(mc)[1:].tolist()
            out["mean"] = round(float(counts.mean()), 1)
        else:  # nms-share
            size = args.img_size

            @jax.jit
            def backbone_only(dp, fr, bump):
                flat = fr.reshape(k * s, *hw, 3)
                xs = pallas_letterbox_batch(flat, size)
                d = network_apply(plan, dp, xs + bump,
                                  compute_dtype=jnp.bfloat16)
                return d, jnp.isnan(jnp.sum(d)).astype(jnp.float32)

            bump = jnp.float32(0)
            d, bump = backbone_only(det_params, frames, bump)
            float(bump)
            t0 = time.perf_counter()
            for _ in range(args.steps):
                d, bump = backbone_only(det_params, frames, bump)
            float(bump)
            out["letterbox_backbone_ms"] = round(
                (time.perf_counter() - t0) / args.steps * 1e3, 1)

            @jax.jit
            def full_detect(dp, fr):
                return detect(dp, fr)

            b7, m, mc = full_detect(det_params, frames)
            int(np.asarray(mc)[0])
            t0 = time.perf_counter()
            for _ in range(args.steps):
                b7, m, mc = full_detect(det_params, frames)
            int(np.asarray(mc)[0])
            out["detect_ms"] = round(
                (time.perf_counter() - t0) / args.steps * 1e3, 1)
            out["nms_share_ms"] = round(
                out["detect_ms"] - out["letterbox_backbone_ms"], 1)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
