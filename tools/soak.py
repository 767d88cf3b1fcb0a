"""Sustained-serving soak: run the production bucketed step for many chunks
and assert the long-horizon invariants a serving deployment relies on.

Checks every chunk: finite outputs and tracker state, confirmed-track
population stable (no slow leak/collapse), track-id counter bounded (no id
churn explosion), gallery ring-buffer counters within budget. Reports
sustained throughput over the whole run (vs the bench's short-burst
number) as one JSON line.

Usage: python tools/soak.py [--chunks 100] [--scan 16] [--streams 8]
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
    p.add_argument("--chunks", type=int, default=100)
    p.add_argument("--scan", type=int, default=16)
    p.add_argument("--streams", type=int, default=8)
    p.add_argument("--model", default="yolov3")
    p.add_argument("--img-size", type=int, default=416)
    p.add_argument("--target-dets", type=int, default=32)
    p.add_argument("--frame-h", type=int, default=1080)
    p.add_argument("--frame-w", type=int, default=1920)
    p.add_argument("--check-every", type=int, default=10,
                   help="invariant-check cadence (each check is a host "
                        "readback of the state)")
    args = p.parse_args()

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          os.path.join(repo, ".jax_cache"))
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

    import jax
    import jax.numpy as jnp

    from bench_probes import bn_weights_and_frames
    from yolo_deepsort_tpu.config import DetectorConfig, TrackerConfig
    from yolo_deepsort_tpu.models.reid import random_reid_params
    from yolo_deepsort_tpu.parallel.streams import (
        init_stream_states,
        make_scanned_step_bucketed,
    )
    from yolo_deepsort_tpu.tracking.tracker import STATE_CONFIRMED

    k, s, hw = args.scan, args.streams, (args.frame_h, args.frame_w)
    plan, det_params, frames, conf_vec = bn_weights_and_frames(
        args.model, args.img_size, k, s, hw, args.target_dets)
    reid_params = jax.tree_util.tree_map(
        jnp.asarray, random_reid_params(0))
    trk_cfg = TrackerConfig(max_dets=64)
    det_cfg = DetectorConfig(
        img_size=args.img_size, conf_thres=float(conf_vec.mean()))
    step = make_scanned_step_bucketed(
        plan, det_cfg, trk_cfg, hw, buckets=(16, 24, 32, 36, 40, 48),
        compute_dtype=jnp.bfloat16, use_pallas_letterbox=True,
        conf_thres_per_stream=conf_vec, donate_state=False,
    )
    states = init_stream_states(trk_cfg, s)

    # warmup: compile + confirm the track population
    for _ in range(3):
        states, (outputs, emit) = step(det_params, reid_params, states, frames)
    jax.block_until_ready(outputs)
    base_tracks = float(jnp.mean(jnp.sum(states.state == STATE_CONFIRMED,
                                         axis=-1)))
    base_next_id = int(jnp.max(states.next_id))

    # invariant summaries computed ON DEVICE -- a device_get of the full
    # state (26 MB/stream gallery) through the tunnel costs seconds and
    # would dominate the soak; this readback is 4 floats
    @jax.jit
    def summarize(states):
        finite = (
            jnp.isfinite(states.mean).all()
            & jnp.isfinite(states.cov).all()
            & jnp.isfinite(states.gallery).all()
        )
        tracks = jnp.mean(jnp.sum(
            (states.state == STATE_CONFIRMED).astype(jnp.float32), axis=-1))
        over_budget = (states.gallery_count > trk_cfg.nn_budget).any()
        return (finite, tracks, over_budget,
                jnp.max(states.next_id).astype(jnp.float32))

    failures = []
    track_counts = []
    t0 = time.perf_counter()
    nxt = step.detect(det_params, frames)
    for i in range(args.chunks):
        cur = nxt
        if i + 1 < args.chunks:  # no dead detect after the final chunk
            nxt = step.detect(det_params, frames)
        states, (outputs, emit) = step.track(reid_params, states, cur)
        if (i + 1) % args.check_every == 0:
            finite, tracks, over_budget, _ = jax.device_get(
                summarize(states))
            tracks = float(tracks)
            track_counts.append(tracks)
            if not bool(finite):
                failures.append(f"chunk {i}: non-finite tracker state")
            if bool(over_budget):
                failures.append(f"chunk {i}: gallery_count over budget")
            if abs(tracks - base_tracks) > max(4.0, 0.25 * base_tracks):
                failures.append(
                    f"chunk {i}: track population drifted "
                    f"{base_tracks:.1f} -> {tracks:.1f}")
    # outputs are int32 rows; NaN state would surface as huge cast values,
    # so bound-check the emitted boxes instead of isfinite (always true on
    # ints)
    out_np = np.asarray(outputs)[np.asarray(emit)]
    if out_np.size and (np.abs(out_np[:, :4]) > 4 * max(hw)).any():
        failures.append("final chunk: emitted boxes far outside the frame")
    dt = time.perf_counter() - t0

    id_growth = int(jnp.max(states.next_id)) - base_next_id
    frames_total = args.chunks * k * s
    rec = {
        "metric": "sustained soak fps/chip",
        "value": round(frames_total / dt, 2),
        "unit": "frames/sec/chip",
        "chunks": args.chunks,
        "frames": frames_total,
        "minutes": round(dt / 60, 2),
        "tracks_mean": (round(float(np.mean(track_counts)), 1)
                        if track_counts else None),
        "tracks_min": (round(float(np.min(track_counts)), 1)
                       if track_counts else None),
        "tracks_max": (round(float(np.max(track_counts)), 1)
                       if track_counts else None),
        "id_growth_per_chunk": round(id_growth / args.chunks, 2),
        "failures": failures,
        "ok": not failures,
    }
    print(json.dumps(rec))
    sys.exit(0 if not failures else 1)


if __name__ == "__main__":
    main()
