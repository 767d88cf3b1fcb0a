"""Tracing / profiling / observability.

Contract: SURVEY.md sections 5.1 and 5.5 -- the reference's only telemetry is
a wall-clock FPS overlay (video_detect.py:~120) and print/tqdm logging. Here:

  * ``StageTimer``: named host-side stage timers with EMA + totals,
  * ``PipelineStats``: structured per-stream counters (frames, detections,
    active/confirmed tracks, emitted tracks, id high-water mark),
  * ``device_trace``: context manager around jax.profiler.trace for xplane
    dumps when a profile dir is given (no-op otherwise).
"""

from __future__ import annotations

import contextlib
import dataclasses
import time
from collections import defaultdict
from typing import Dict, Iterator, Optional

import numpy as np


class StageTimer:
    """Named wall-clock stage timers: ``with timer("detect"): ...``."""

    def __init__(self, ema: float = 0.9):
        self._ema_w = ema
        self.ema: Dict[str, float] = {}
        self.total: Dict[str, float] = defaultdict(float)
        self.count: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def __call__(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.total[name] += dt
            self.count[name] += 1
            prev = self.ema.get(name, dt)
            self.ema[name] = self._ema_w * prev + (1 - self._ema_w) * dt

    def summary(self) -> str:
        rows = []
        for name in self.total:
            n = self.count[name]
            rows.append(
                f"{name}: {self.total[name] / max(n, 1) * 1000:.2f} ms avg "
                f"({self.ema.get(name, 0) * 1000:.2f} ms ema, n={n})"
            )
        return " | ".join(rows)


class FpsMeter:
    """EMA frames-per-second (the reference's FPS overlay source)."""

    def __init__(self, ema: float = 0.9):
        self._ema_w = ema
        self._last: Optional[float] = None
        self.fps = 0.0

    def tick(self, frames: int = 1) -> float:
        now = time.perf_counter()
        if self._last is not None:
            inst = frames / max(now - self._last, 1e-9)
            self.fps = (
                inst if self.fps == 0.0
                else self._ema_w * self.fps + (1 - self._ema_w) * inst
            )
        self._last = now
        return self.fps


@dataclasses.dataclass
class PipelineStats:
    """Structured per-pipeline counters, updated from tracker outputs."""

    frames: int = 0
    detections: int = 0
    emitted_tracks: int = 0
    max_track_id: int = 0
    active_tracks: int = 0
    confirmed_tracks: int = 0
    # no-silent-caps telemetry: frames where every track lane was occupied
    # (a new detection on such a frame could not have started a track) and
    # NMS-capacity drops fed in from BucketedScannedStep.saturation()
    lane_saturated_frames: int = 0
    sat_nms_topk: int = 0
    sat_nms_dets: int = 0

    def update(self, det_mask, tracker_state, emit_mask) -> None:
        self.frames += 1
        self.detections += int(np.asarray(det_mask).sum())
        self.emitted_tracks += int(np.asarray(emit_mask).sum())
        st = np.asarray(tracker_state.state)
        self.active_tracks = int((st > 0).sum())
        self.confirmed_tracks = int((st == 2).sum())
        if self.active_tracks == st.size:
            self.lane_saturated_frames += 1
        self.max_track_id = max(
            self.max_track_id, int(np.asarray(tracker_state.next_id)) - 1
        )

    def absorb_saturation(self, sat: Dict[str, int]) -> None:
        """Fold BucketedScannedStep.saturation() counters in (cumulative
        totals there; store the latest totals here)."""
        self.sat_nms_topk = int(sat.get("sat_nms_topk", 0))
        self.sat_nms_dets = int(sat.get("sat_nms_dets", 0))

    def as_dict(self) -> Dict[str, int]:
        return dataclasses.asdict(self)


@contextlib.contextmanager
def device_trace(profile_dir: Optional[str]) -> Iterator[None]:
    """jax.profiler.trace wrapper; inert when profile_dir is None."""
    if not profile_dir:
        yield
        return
    import jax

    with jax.profiler.trace(profile_dir):
        yield
