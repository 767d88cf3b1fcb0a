"""Multi-chip serving soak on a virtual device mesh (VERDICT r4 item 8).

Long-horizon endurance run of the SHARDED serving path -- the same
`make_sharded_step` + `make_global_id_step` graphs the driver's
`dryrun_multichip` compiles once -- over >= 100 chunks on an N-device
mesh, asserting the invariants `tools/soak.py` checks single-chip plus
the multi-chip ones:

  * finite tracker state and gallery counters within budget on EVERY
    device's shard, checked through one 4-float device readback;
  * stable confirmed-track population (no slow leak/collapse);
  * bounded id growth (no churn explosion);
  * output/state shardings stay on the stream mesh axis (no silent
    gather to one device between chunks);
  * global-id table consistency: a lane whose local track id is
    unchanged keeps its global id across chunks (handoff never
    relabels a stable track), checked on the host at check cadence.

Run on the 8-device virtual CPU mesh (the standard multi-chip test rig,
tests/conftest.py):

  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python tools/soak_multichip.py --chunks 100

Scale-out story: SURVEY.md section 5.8; single-chip counterpart
tools/soak.py. Reference lineage has no multi-stream/multi-chip serving
(GlassyWing yolo_deepsort runs one video per process) -- this subsystem
is TPU-native new work.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--chunks", type=int, default=100)
    p.add_argument("--frames-per-chunk", type=int, default=4)
    p.add_argument("--model", default="yolov3-tiny")
    p.add_argument("--img-size", type=int, default=160)
    p.add_argument("--frame-h", type=int, default=256)
    p.add_argument("--frame-w", type=int, default=320)
    p.add_argument("--target-dets", type=int, default=12)
    p.add_argument("--check-every", type=int, default=10)
    args = p.parse_args()

    if os.environ.get("JAX_PLATFORMS", "").strip() == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          os.path.join(repo, ".jax_cache"))
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from bench_probes import bn_weights_and_frames
    from yolo_deepsort_tpu.config import DetectorConfig, TrackerConfig
    from yolo_deepsort_tpu.models.reid import random_reid_params
    from yolo_deepsort_tpu.parallel.streams import (
        init_global_ids,
        init_stream_states,
        make_global_id_step,
        make_sharded_step,
        relabel_outputs_global,
    )
    from yolo_deepsort_tpu.tracking.tracker import STATE_CONFIRMED

    devices = jax.devices()
    n = len(devices)
    s = n  # one stream per device: the scale-out unit of the design
    hw = (args.frame_h, args.frame_w)
    k = args.frames_per_chunk

    mesh = Mesh(np.array(devices), ("stream",))
    sharded = NamedSharding(mesh, P("stream"))

    plan, det_params, frames_ks, conf_vec = bn_weights_and_frames(
        args.model, args.img_size, k, s, hw, args.target_dets)
    reid_params = jax.tree_util.tree_map(jnp.asarray, random_reid_params(0))
    trk_cfg = TrackerConfig(max_dets=32)
    det_cfg = DetectorConfig(
        img_size=args.img_size, conf_thres=float(conf_vec.mean()))

    step = make_sharded_step(mesh, plan, det_cfg, trk_cfg, hw,
                             compute_dtype=jnp.bfloat16)
    gid_step = make_global_id_step(mesh, trk_cfg, n_streams_total=s)

    states = jax.device_put(init_stream_states(trk_cfg, s), sharded)
    gids = jax.device_put(init_global_ids(trk_cfg, s), sharded)
    # per-frame content: jitter the base frame per scan index so boxes move
    frames_dev = [jax.device_put(frames_ks[i % k], sharded)
                  for i in range(k)]

    # warmup: compile + confirm the track population. Synchronize EVERY
    # step: on the 1-core virtual mesh, async dispatch queues many sharded
    # executions whose 8 rendezvous participants share one bounded thread
    # pool -- tasks from DIFFERENT op_ids occupy the pool and a collective
    # can starve forever (observed: all-gather stuck > 10 min at zero CPU,
    # and the earlier 'only 3 of 8 arrived' rendezvous abort). One
    # execution in flight at a time keeps every pool task a participant
    # of the same collective.
    for i in range(3 * k):
        states, (outputs, emit) = step(det_params, reid_params, states,
                                       frames_dev[i % k])
        gids = jax.block_until_ready(gid_step(states, gids))
    base_tracks = float(jnp.mean(jnp.sum(states.state == STATE_CONFIRMED,
                                         axis=-1)))
    base_next_id = int(jnp.max(states.next_id))

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

    def on_mesh(x):
        shd = x.sharding
        return (isinstance(shd, NamedSharding)
                and shd.spec and shd.spec[0] == "stream")

    failures = []
    track_counts = []
    prev_tid = np.asarray(states.track_id)
    prev_gid = np.asarray(gids.gid)
    t0 = time.perf_counter()
    for c in range(args.chunks):
        for i in range(k):
            states, (outputs, emit) = step(det_params, reid_params, states,
                                           frames_dev[i])
            # per-step sync: see the warmup comment (collective starvation
            # under async dispatch on the shared-pool virtual mesh)
            gids = jax.block_until_ready(gid_step(states, gids))
        out_g = relabel_outputs_global(outputs, gids)
        if (c + 1) % args.check_every == 0:
            print(f"[soak] chunk {c + 1}/{args.chunks}", file=sys.stderr,
                  flush=True)
            finite, tracks, over_budget, _ = jax.device_get(
                summarize(states))
            tracks = float(tracks)
            track_counts.append(tracks)
            if not bool(finite):
                failures.append(f"chunk {c}: non-finite tracker state")
            if bool(over_budget):
                failures.append(f"chunk {c}: gallery_count over budget")
            if abs(tracks - base_tracks) > max(4.0, 0.5 * base_tracks):
                failures.append(
                    f"chunk {c}: track population drifted "
                    f"{base_tracks:.1f} -> {tracks:.1f}")
            if not (on_mesh(outputs) and on_mesh(states.mean)
                    and on_mesh(gids.gid)):
                failures.append(
                    f"chunk {c}: outputs/state/gids left the stream mesh")
            # global-id stability: lanes whose local track id did not
            # change must keep their global id (handoff never relabels a
            # live track)
            tid = np.asarray(states.track_id)
            gid = np.asarray(gids.gid)
            stable = (tid == prev_tid) & (tid > 0)
            if stable.any() and (gid[stable] != prev_gid[stable]).any():
                failures.append(
                    f"chunk {c}: global id changed on a stable track lane")
            prev_tid, prev_gid = tid, gid
    out_np = np.asarray(out_g)[np.asarray(emit)]
    if out_np.size and (np.abs(out_np[:, :4]) > 4 * max(hw)).any():
        failures.append("final chunk: emitted boxes far outside the frame")
    dt = time.perf_counter() - t0

    id_growth = int(jnp.max(states.next_id)) - base_next_id
    frames_total = args.chunks * k * s
    rec = {
        "metric": f"multichip soak fps ({n}-device virtual mesh)",
        "value": round(frames_total / dt, 2),
        "unit": "frames/sec",
        "devices": n,
        "chunks": args.chunks,
        "frames": frames_total,
        "minutes": round(dt / 60, 2),
        "tracks_mean": (round(float(np.mean(track_counts)), 1)
                        if track_counts else None),
        "id_growth_per_chunk": round(id_growth / args.chunks, 2),
        "failures": failures,
        "ok": not failures,
    }
    print(json.dumps(rec))
    sys.exit(0 if not failures else 1)


if __name__ == "__main__":
    main()
