"""Observability utilities."""

import time

import numpy as np

from yolo_deepsort_tpu.utils.profiling import (
    FpsMeter,
    PipelineStats,
    StageTimer,
    device_trace,
)


def test_stage_timer():
    t = StageTimer()
    with t("a"):
        time.sleep(0.01)
    with t("a"):
        time.sleep(0.01)
    with t("b"):
        pass
    assert t.count["a"] == 2 and t.count["b"] == 1
    assert t.total["a"] >= 0.02
    assert "a:" in t.summary() and "b:" in t.summary()


def test_fps_meter():
    m = FpsMeter(ema=0.5)
    m.tick()
    time.sleep(0.01)
    fps = m.tick()
    assert 1 < fps < 1000


def test_pipeline_stats():
    from yolo_deepsort_tpu.config import TrackerConfig
    from yolo_deepsort_tpu.tracking.tracker import init_tracker_state

    st = init_tracker_state(TrackerConfig(max_tracks=4, max_dets=2,
                                          feat_dim=4, nn_budget=2))
    stats = PipelineStats()
    stats.update(np.array([True, False]), st, np.array([False] * 4))
    assert stats.frames == 1 and stats.detections == 1
    assert stats.as_dict()["active_tracks"] == 0


def test_device_trace_noop():
    with device_trace(None):
        pass
