"""No-silent-caps telemetry: the NMS max_boxes top-k, the max_dets output
capacity and the bucket ladder all carry saturation counters that FIRE on
crowded scenes instead of silently dropping detections (round-3 review:
ops/nms.py's 512-candidate top-k had no saturation signal)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from yolo_deepsort_tpu.ops.nms import (  # noqa: E402
    batched_nms,
    batched_nms_with_stats,
)


def _pred_grid(n_boxes, conf, num_classes=4, spacing=80.0):
    """n_boxes far-apart same-class boxes (cxcywh px + obj + cls scores):
    nothing overlaps, so NMS suppression removes nothing."""
    pred = np.zeros((n_boxes, 5 + num_classes), np.float32)
    for i in range(n_boxes):
        pred[i, :4] = [50 + spacing * (i % 32), 50 + spacing * (i // 32),
                       30, 30]
    pred[:, 4] = conf
    pred[:, 5] = 0.9  # class 0
    return pred[None]  # batch of 1


def test_topk_saturation_counter_fires():
    # 30 candidates above threshold, max_boxes=16: 14 dropped before NMS
    pred = _pred_grid(30, conf=0.9)
    dets, mask, sat = batched_nms_with_stats(
        jnp.asarray(pred), 0.5, 0.4, max_boxes=16, max_dets=16)
    assert int(sat[0, 0]) == 30 - 16
    assert int(mask.sum()) == 16


def test_max_dets_saturation_counter_fires():
    # 24 survivors, max_dets=8: the output fills with candidates left alive
    pred = _pred_grid(24, conf=0.9)
    dets, mask, sat = batched_nms_with_stats(
        jnp.asarray(pred), 0.5, 0.4, max_boxes=64, max_dets=8)
    assert int(mask.sum()) == 8
    assert int(sat[0, 0]) == 0
    assert int(sat[0, 1]) == 24 - 8


def test_counters_zero_when_capacity_holds():
    pred = _pred_grid(5, conf=0.9)
    dets, mask, sat = batched_nms_with_stats(
        jnp.asarray(pred), 0.5, 0.4, max_boxes=64, max_dets=16)
    assert int(mask.sum()) == 5
    assert int(sat.sum()) == 0
    # and batched_nms's 2-tuple contract is unchanged
    d2, m2 = batched_nms(jnp.asarray(pred), 0.5, 0.4, 64, 16)
    np.testing.assert_array_equal(np.asarray(d2), np.asarray(dets))
    np.testing.assert_array_equal(np.asarray(m2), np.asarray(mask))


def test_per_image_counters_independent():
    crowded = _pred_grid(30, conf=0.9)
    sparse = _pred_grid(30, conf=0.9)
    sparse[0, 3:, 4] = 0.1  # only 3 above threshold in image 2
    pred = np.concatenate([crowded, sparse])
    _, _, sat = batched_nms_with_stats(
        jnp.asarray(pred), 0.5, 0.4, max_boxes=16, max_dets=16)
    assert int(sat[0, 0]) == 14 and int(sat[1].sum()) == 0


def test_bucketed_step_surfaces_saturation():
    """A crowded synthetic scene through the real detect stage: the chunk
    stats readback carries the NMS drop counts and BucketedScannedStep
    accumulates them (bench.py copies saturation() into its JSON)."""
    from yolo_deepsort_tpu.api import Darknet
    from yolo_deepsort_tpu.config import DetectorConfig, TrackerConfig
    from yolo_deepsort_tpu.models.reid import random_reid_params
    from yolo_deepsort_tpu.parallel.streams import make_scanned_step_bucketed
    from yolo_deepsort_tpu.tracking.tracker import init_tracker_state

    h, w = 64, 96
    model = Darknet("yolov3-tiny", img_size=96)
    det_cfg = DetectorConfig(img_size=96, conf_thres=0.0, max_boxes=8)
    trk_cfg = TrackerConfig(max_tracks=8, max_dets=4, nn_budget=4)
    step = make_scanned_step_bucketed(
        model.plan, det_cfg, trk_cfg, (h, w), buckets=(4,),
        donate_state=False,
    )
    s = 1
    states = jax.tree_util.tree_map(
        lambda x: jnp.stack([x] * s), init_tracker_state(trk_cfg))
    frames = np.random.default_rng(0).integers(
        0, 255, (1, s, h, w, 3), np.uint8)
    step(model.params, random_reid_params(0), states, jnp.asarray(frames))
    sat = step.saturation()
    # conf_thres=0 makes every decoded box a candidate: a tiny-96 head
    # emits hundreds of boxes, so the 8-candidate top-k must saturate
    assert sat["sat_nms_topk"] > 0
    assert sat["sat_nms_dets"] >= 0
    assert set(sat) == {"sat_nms_topk", "sat_nms_dets", "sat_bucket_chunks"}


def test_bucket_ladder_saturation_fires_on_crowding():
    """Survivors the max_dets output had no room for count toward the
    chunk's bucket stat, so sat_bucket_chunks fires on crowded scenes.
    (Before round 5 the stat was post-capacity and could NEVER exceed
    buckets[-1] == max_dets -- the counter was structurally dead.)"""
    from yolo_deepsort_tpu.api import Darknet
    from yolo_deepsort_tpu.config import DetectorConfig, TrackerConfig
    from yolo_deepsort_tpu.models.reid import random_reid_params
    from yolo_deepsort_tpu.parallel.streams import make_scanned_step_bucketed
    from yolo_deepsort_tpu.tracking.tracker import init_tracker_state

    h, w = 64, 96
    model = Darknet("yolov3-tiny", img_size=96)
    # wide-open top-k (64) + tiny output capacity (4): NMS survivors must
    # overflow the output, leaving leftover-alive counts in the stats
    det_cfg = DetectorConfig(img_size=96, conf_thres=0.0, max_boxes=64)
    trk_cfg = TrackerConfig(max_tracks=8, max_dets=4, nn_budget=4)
    step = make_scanned_step_bucketed(
        model.plan, det_cfg, trk_cfg, (h, w), buckets=(4,),
        donate_state=False,
    )
    states = jax.tree_util.tree_map(
        lambda x: jnp.stack([x]), init_tracker_state(trk_cfg))
    frames = np.random.default_rng(0).integers(
        0, 255, (1, 1, h, w, 3), np.uint8)
    step(model.params, random_reid_params(0), states, jnp.asarray(frames))
    sat = step.saturation()
    assert sat["sat_nms_dets"] > 0
    assert sat["sat_bucket_chunks"] == 1
    # the surfaced chunk count is the PRE-capacity survivor count
    assert step.last_max_count > trk_cfg.max_dets
    # invariant: the ladder saturates exactly when the output capacity
    # dropped survivors (buckets top out at max_dets by construction)
    assert (sat["sat_bucket_chunks"] > 0) == (sat["sat_nms_dets"] > 0)


def test_pipeline_stats_lane_saturation():
    from yolo_deepsort_tpu.utils.profiling import PipelineStats

    class _State:
        state = np.ones((4,), np.int32) * 2  # every lane confirmed
        next_id = np.int32(5)

    stats = PipelineStats()
    stats.update(np.ones(3, bool), _State(), np.ones(4, bool))
    assert stats.lane_saturated_frames == 1
    stats.absorb_saturation({"sat_nms_topk": 7, "sat_nms_dets": 2})
    d = stats.as_dict()
    assert d["sat_nms_topk"] == 7 and d["sat_nms_dets"] == 2
