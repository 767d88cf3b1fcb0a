"""Multi-HOST dryrun: the DCN story (SURVEY.md section 5.8).

Launches as one process of an N-process jax.distributed job (CPU backend,
virtual devices per host) and runs the framework's real cross-host paths
on a global mesh spanning every host's devices:

  1. stream-data-parallel tracking steps -- each host's chips own their
     streams, zero cross-host traffic on the per-frame path,
  2. the cross-camera global-ID handoff collective -- its gallery
     all_gather is the single collective that rides DCN when the camera
     set spans hosts; an object handing off between cameras on DIFFERENT
     hosts must keep one global id.

Single-process usage (process 0 of 2):
  python tools/dryrun_multihost.py --num-processes 2 --process-id 0 \
      --coordinator localhost:9345
Run every process id concurrently (tests/test_multihost.py does).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--coordinator", default="localhost:9345")
    p.add_argument("--num-processes", type=int, default=2)
    p.add_argument("--process-id", type=int, required=True)
    p.add_argument("--devices-per-host", type=int, default=4)
    args = p.parse_args()

    import re

    flags = os.environ.get("XLA_FLAGS", "")
    flags = re.sub(r"--xla_force_host_platform_device_count=\d+", "", flags)
    os.environ["XLA_FLAGS"] = (
        flags + f" --xla_force_host_platform_device_count="
        f"{args.devices_per_host}"
    ).strip()

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=args.coordinator,
        num_processes=args.num_processes,
        process_id=args.process_id,
    )

    import numpy as np
    from functools import partial
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from yolo_deepsort_tpu.config import TrackerConfig
    from yolo_deepsort_tpu.parallel.streams import (
        init_global_ids,
        init_stream_states,
        make_global_id_step,
    )
    from yolo_deepsort_tpu.tracking.tracker import tracker_step

    n_hosts = args.num_processes
    me = args.process_id
    devices = np.array(jax.devices())  # GLOBAL device list, all hosts
    n = devices.size
    assert n == n_hosts * args.devices_per_host, (n, n_hosts)
    mesh = Mesh(devices, ("stream",))
    sharded = NamedSharding(mesh, P("stream"))

    cfg = TrackerConfig(max_tracks=8, max_dets=4, feat_dim=32, nn_budget=5)
    step = jax.jit(
        jax.vmap(partial(tracker_step, cfg)),
        in_shardings=(sharded,) * 6,
        out_shardings=(sharded, sharded, sharded),
    )
    gid_step = make_global_id_step(mesh, cfg, n_streams_total=n)

    states = jax.device_put(init_stream_states(cfg, n), sharded)
    gids = jax.device_put(init_global_ids(cfg, n), sharded)

    rng = np.random.default_rng(0)  # same seed everywhere: shared appearance
    f_obj = rng.normal(size=32)
    f_obj /= np.linalg.norm(f_obj)
    s_loc = args.devices_per_host
    img_hw_l = np.broadcast_to(np.array([720, 1280], np.int32), (s_loc, 2))

    def frame_inputs(t):
        d = cfg.max_dets
        tlwh = np.zeros((s_loc, d, 4), np.float32)
        conf = np.zeros((s_loc, d), np.float32)
        feat = np.zeros((s_loc, d, 32), np.float32)
        mask = np.zeros((s_loc, d), bool)
        # the object lives on host 0 / local stream 0 for t<10, then on the
        # LAST host / its last local stream from t>=8 (cross-host handoff)
        if me == 0 and t < 10:
            tlwh[0, 0] = [200 + 5 * t, 300, 40, 80]
            conf[0, 0] = 0.9
            feat[0, 0] = f_obj
            mask[0, 0] = True
        if me == n_hosts - 1 and t >= 8:
            tlwh[-1, 0] = [100 + 5 * t, 400, 40, 80]
            conf[-1, 0] = 0.9
            feat[-1, 0] = f_obj
            mask[-1, 0] = True
        return tlwh, conf, feat, mask

    glob = lambda a: jax.make_array_from_process_local_data(
        sharded, a, (n, *a.shape[1:])
    )
    img_hw = glob(img_hw_l)
    outputs = None
    for t in range(16):
        tlwh, conf, feat, mask = frame_inputs(t)
        states, outputs, emit = step(
            states, glob(tlwh), glob(conf), glob(feat), glob(mask), img_hw
        )
        gids = gid_step(states, gids)

    # every host reads back its LOCAL shards; the last host checks handoff
    def local_block(arr):
        shards = sorted(arr.addressable_shards,
                        key=lambda sh: sh.index[0].start or 0)
        return np.concatenate([np.asarray(sh.data) for sh in shards], axis=0)

    local_gid = local_block(gids.gid)      # (s_loc, T) rows owned here
    local_state = local_block(states.state)
    if me == n_hosts - 1:
        lane = int(np.argmax(local_state[-1] == 2))
        assert local_state[-1, lane] == 2, "no confirmed track on last host"
        assert local_gid[-1, lane] == 1, (
            f"cross-host handoff failed: gids={local_gid[-1]}"
        )
        print(f"[multihost] host {me}: cross-host (DCN) global-id handoff "
              f"ok -- gid 1 adopted across hosts")
    else:
        print(f"[multihost] host {me}: tracking + collectives ok over "
              f"{n_hosts}-host mesh ({n} devices)")


if __name__ == "__main__":
    main()
