"""Multi-stream tracking runtime: N videos -> one batched device step.

The scale-out execution mode (BASELINE configs 4-5: "16x concurrent 720p
streams with batched cross-stream ReID embedding"): one decode thread per
video feeds the native C++ frame pool (runtime/native.py); the consumer loop
pops contiguous RGB batches and drives the vmapped fused step
(parallel/streams.py) with per-stream failure isolation -- a stream that
stalls or ends simply freezes its tracker state while the rest proceed.
"""

from __future__ import annotations

import threading
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from ..config import DetectorConfig, TrackerConfig
from ..parallel.streams import init_stream_states, make_batched_step
from .native import FramePool


class MultiStreamTracker:
    """Track multiple same-resolution videos concurrently on one chip."""

    def __init__(
        self,
        model,  # api.Darknet
        video_paths: Sequence[str],
        reid_params,
        frame_hw: Tuple[int, int],
        tracker_config: Optional[TrackerConfig] = None,
        det_config: Optional[DetectorConfig] = None,
        tracked_class_ids=None,
        half: bool = True,
        ring_depth: int = 8,
        global_ids: bool = False,
        global_id_every: int = 4,
    ):
        import jax.numpy as jnp

        self.model = model
        self.paths = list(video_paths)
        self.s = len(self.paths)
        self.frame_hw = frame_hw
        self.trk_cfg = tracker_config or TrackerConfig()
        self.det_cfg = det_config or DetectorConfig(img_size=model.img_size)
        self.reid_params = reid_params
        self.pool = FramePool(self.s, frame_hw[0], frame_hw[1], depth=ring_depth)
        self.step = make_batched_step(
            model.plan,
            self.det_cfg,
            self.trk_cfg,
            frame_hw,
            tracked_class_ids=tracked_class_ids,
            compute_dtype=jnp.bfloat16 if half else jnp.float32,
            donate_state=True,
            with_validity=True,
        )
        self.states = init_stream_states(self.trk_cfg, self.s)
        self._threads: List[threading.Thread] = []
        # cross-CAMERA global identities (BASELINE config 5): periodically
        # alias tracks whose appearance matches across streams so one object
        # seen by several cameras reports one id (min-adoption, convergent)
        self.gid_state = None
        self._gid_every = max(1, global_id_every)
        if global_ids:
            from ..parallel.streams import (
                assign_provisional_gids,
                init_global_ids,
                make_global_id_step,
                make_stream_mesh,
                relabel_outputs_global,
            )

            mesh = make_stream_mesh(1)  # single-chip: streams co-resident
            self._gid_step = make_global_id_step(
                mesh, self.trk_cfg, n_streams_total=self.s
            )
            self._gid_prov = assign_provisional_gids
            self._relabel = relabel_outputs_global
            self.gid_state = init_global_ids(self.trk_cfg, self.s)

    def _decoder(self, stream: int, path: str):
        import cv2

        cap = cv2.VideoCapture(path)
        try:
            while True:
                ok, frame = cap.read()
                if not ok:
                    break
                if frame.shape[:2] != self.frame_hw:
                    frame = cv2.resize(frame, self.frame_hw[::-1])
                while not self.pool.push(stream, frame):
                    if self._stop.is_set():
                        return
        finally:
            cap.release()
            self.pool.mark_finished(stream)

    def run(self, max_steps: Optional[int] = None):
        """Generator of (outputs (S, T, 5) int32, emit (S, T) bool,
        valid (S,) bool) per batched step."""
        self._stop = threading.Event()
        self._threads = [
            threading.Thread(target=self._decoder, args=(i, p), daemon=True)
            for i, p in enumerate(self.paths)
        ]
        for t in self._threads:
            t.start()

        steps = 0
        try:
            while max_steps is None or steps < max_steps:
                batch, valid, n = self.pool.pop_batch()
                if n == 0:
                    if all(self.pool.finished(i) for i in range(self.s)):
                        break
                    continue
                self.states, (outputs, emit) = self.step(
                    self.model.params, self.reid_params, self.states,
                    batch, valid,
                )
                if self.gid_state is not None:
                    if steps % self._gid_every == 0:
                        self.gid_state = self._gid_step(
                            self.states, self.gid_state
                        )
                    else:  # fresh lanes still get ids between rounds
                        self.gid_state = self._gid_prov(
                            self.states.track_id, self.gid_state,
                            n_streams_total=self.s,
                        )
                    outputs = self._relabel(outputs, self.gid_state)
                steps += 1
                yield np.asarray(outputs), np.asarray(emit), valid
        finally:
            self._stop.set()
            for t in self._threads:
                t.join(timeout=2.0)

    def stats(self) -> Dict[str, int]:
        return {
            "dropped": sum(self.pool.dropped(i) for i in range(self.s)),
        }

    def close(self):
        self.pool.close()
