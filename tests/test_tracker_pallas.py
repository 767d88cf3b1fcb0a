"""Fused tracker megakernel vs the lax tracker_step (interpret mode on CPU).

The kernel recomputes the KF algebra with different f32 associativity, so
means/covs are compared with tolerances; every DISCRETE decision (matches,
lifecycle ints, ids, gallery bookkeeping, emitted boxes) must be EQUAL on
these seeded scenarios (see tracker_pallas.py module docstring)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from yolo_deepsort_tpu.config import TrackerConfig  # noqa: E402
from yolo_deepsort_tpu.tracking.tracker import (  # noqa: E402
    init_tracker_state,
    tracker_step,
)
from yolo_deepsort_tpu.tracking.tracker_pallas import (  # noqa: E402
    tracker_step_fused_batched,
)


def _batched_states(cfg, s):
    one = init_tracker_state(cfg)
    return jax.tree.map(lambda x: jnp.stack([x] * s), one)


def _scene(rng, n_obj, frames, h, w, dropout=0.0):
    """Jittered walking boxes with optional detector dropout."""
    base = np.stack([
        rng.uniform(10, w - 90, n_obj), rng.uniform(10, h - 120, n_obj),
        rng.uniform(20, 60, n_obj), rng.uniform(40, 90, n_obj)], axis=1)
    vel = rng.normal(0, 1.5, (n_obj, 2))
    feats = rng.normal(0, 1, (n_obj, 64))
    feats /= np.linalg.norm(feats, axis=1, keepdims=True)
    out = []
    for f in range(frames):
        tl = base.copy()
        tl[:, :2] += vel * f
        keep = rng.uniform(size=n_obj) > dropout
        jit = tl + rng.normal(0, 0.8, tl.shape)
        fe = feats + rng.normal(0, 0.05, feats.shape)
        fe /= np.linalg.norm(fe, axis=1, keepdims=True)
        out.append((jit[keep], fe[keep]))
    return out


def _run_both(cfg, scenes, h, w, interpret=True):
    """Run lax (vmapped) and fused tracker over per-stream scenes."""
    s = len(scenes)
    d = cfg.max_dets
    img_hw = jnp.array([h, w], jnp.int32)
    lax_states = _batched_states(cfg, s)
    fus_states = _batched_states(cfg, s)
    step_lax = jax.jit(jax.vmap(
        lambda st, t_, c_, f_, m_: tracker_step(cfg, st, t_, c_, f_, m_,
                                                img_hw)))
    step_fus = jax.jit(lambda st, t_, c_, f_, m_: tracker_step_fused_batched(
        cfg, st, t_, c_, f_, m_, img_hw, interpret=interpret))
    frames = len(scenes[0])
    for f in range(frames):
        tl = np.zeros((s, d, 4), np.float32)
        fe = np.zeros((s, d, 64), np.float32)
        cf = np.zeros((s, d), np.float32)
        mk = np.zeros((s, d), bool)
        for si, scene in enumerate(scenes):
            boxes, fts = scene[f]
            n = min(len(boxes), d)
            tl[si, :n] = boxes[:n]
            fe[si, :n] = fts[:n]
            cf[si, :n] = 0.9
            mk[si, :n] = True
        lax_states, out_l, emit_l = step_lax(lax_states, tl, cf, fe, mk)
        fus_states, out_f, emit_f = step_fus(fus_states, tl, cf, fe, mk)
        yield f, (lax_states, out_l, emit_l), (fus_states, out_f, emit_f)


def _assert_frame_equal(f, lax_pack, fus_pack):
    (ls, out_l, emit_l), (fs, out_f, emit_f) = lax_pack, fus_pack
    for name in ("state", "hits", "age", "time_since_update", "track_id",
                 "gallery_head", "gallery_count", "next_id"):
        np.testing.assert_array_equal(
            np.asarray(getattr(ls, name)), np.asarray(getattr(fs, name)),
            err_msg=f"frame {f}: {name} diverged")
    np.testing.assert_array_equal(np.asarray(emit_l), np.asarray(emit_f),
                                  err_msg=f"frame {f}: emit diverged")
    # box coords may flip +-1 px where the KF mean's f32 ulp difference
    # crosses the int truncation boundary; ids (col 4) must be exact
    np.testing.assert_array_equal(
        np.asarray(out_l)[..., 4], np.asarray(out_f)[..., 4],
        err_msg=f"frame {f}: track ids diverged")
    np.testing.assert_allclose(
        np.asarray(out_l)[..., :4], np.asarray(out_f)[..., :4], atol=1,
        err_msg=f"frame {f}: outputs diverged")
    np.testing.assert_allclose(
        np.asarray(ls.mean), np.asarray(fs.mean), rtol=2e-4, atol=2e-3,
        err_msg=f"frame {f}: mean drift")
    np.testing.assert_allclose(
        np.asarray(ls.gallery), np.asarray(fs.gallery), rtol=1e-5, atol=1e-6,
        err_msg=f"frame {f}: gallery drift")


def test_fused_tracker_matches_lax_multistream():
    cfg = TrackerConfig(max_tracks=16, max_dets=8, nn_budget=5, feat_dim=64)
    rng = np.random.default_rng(3)
    scenes = [_scene(rng, 4, 25, 240, 320, dropout=0.1) for _ in range(2)]
    for f, lax_pack, fus_pack in _run_both(cfg, scenes, 240, 320):
        _assert_frame_equal(f, lax_pack, fus_pack)


def test_fused_tracker_lifecycle_edges():
    """Churn: heavy dropout + more objects than det capacity forces births,
    deletions, cascade levels > 0 and capacity-exhausted initiation."""
    cfg = TrackerConfig(max_tracks=8, max_dets=8, nn_budget=3, feat_dim=64,
                        max_age=4)
    rng = np.random.default_rng(11)
    scenes = [_scene(rng, 10, 30, 240, 320, dropout=0.35)]
    for f, lax_pack, fus_pack in _run_both(cfg, scenes, 240, 320):
        _assert_frame_equal(f, lax_pack, fus_pack)


def test_fused_tracker_empty_frames():
    cfg = TrackerConfig(max_tracks=8, max_dets=8, nn_budget=3, feat_dim=64)
    rng = np.random.default_rng(5)
    scene = _scene(rng, 3, 6, 240, 320)
    # frames 2..3 fully empty: all tracks coast, tentative ones die
    scene[2] = (scene[2][0][:0], scene[2][1][:0])
    scene[3] = (scene[3][0][:0], scene[3][1][:0])
    for f, lax_pack, fus_pack in _run_both(cfg, [scene], 240, 320):
        _assert_frame_equal(f, lax_pack, fus_pack)


def test_fused_scanned_track_stage_matches_lax():
    """End-to-end through make_scanned_track_stage: the fused-tracker scan
    (interpret mode on CPU) equals the lax scan on discrete outputs."""
    from yolo_deepsort_tpu.config import DetectorConfig
    from yolo_deepsort_tpu.models.reid import random_reid_params
    from yolo_deepsort_tpu.parallel.streams import (
        init_stream_states,
        make_scanned_track_stage,
    )

    h, w = 96, 128
    k, s, cap = 3, 2, 8
    det_cfg = DetectorConfig(img_size=96, conf_thres=0.3)
    trk_cfg = TrackerConfig(max_tracks=16, max_dets=8, nn_budget=4)
    rng = np.random.default_rng(9)
    frames = rng.integers(0, 255, (k, s, h, w, 3), dtype=np.uint8)
    # boxes7 rows [x1,y1,x2,y2,obj,conf,cls] in letterboxed coords
    boxes7 = np.zeros((k * s, cap, 7), np.float32)
    mask = np.zeros((k * s, cap), bool)
    for i in range(k * s):
        n = int(rng.integers(2, 6))
        x1 = rng.uniform(5, 60, n); y1 = rng.uniform(5, 50, n)
        boxes7[i, :n, 0] = x1
        boxes7[i, :n, 1] = y1
        boxes7[i, :n, 2] = x1 + rng.uniform(8, 25, n)
        boxes7[i, :n, 3] = y1 + rng.uniform(10, 30, n)
        boxes7[i, :n, 4] = 0.9
        boxes7[i, :n, 5] = 0.9
        mask[i, :n] = True
    reid_params = random_reid_params(0)
    args = dict(donate_state=False)
    lax_stage = make_scanned_track_stage(
        det_cfg, trk_cfg, (h, w), cap, use_fused_tracker=False, **args)
    fus_stage = make_scanned_track_stage(
        det_cfg, trk_cfg, (h, w), cap, use_fused_tracker=True, **args)
    st_l = init_stream_states(trk_cfg, s)
    st_f = init_stream_states(trk_cfg, s)
    for _ in range(2):  # two chunks: carried state crosses the boundary
        st_l, (out_l, emit_l) = lax_stage(reid_params, st_l, frames, boxes7,
                                          mask)
        st_f, (out_f, emit_f) = fus_stage(reid_params, st_f, frames, boxes7,
                                          mask)
        np.testing.assert_array_equal(np.asarray(emit_l), np.asarray(emit_f))
        np.testing.assert_array_equal(np.asarray(out_l)[..., 4],
                                      np.asarray(out_f)[..., 4])
        np.testing.assert_allclose(np.asarray(out_l)[..., :4],
                                   np.asarray(out_f)[..., :4], atol=1)
        for name in ("state", "track_id", "next_id", "gallery_count"):
            np.testing.assert_array_equal(
                np.asarray(getattr(st_l, name)), np.asarray(getattr(st_f, name)))


def test_batched_step_low_latency_cap_window_exact():
    """cap + crop_window on make_batched_step (the K=1 latency mode) is
    exact vs the uncapped fused path when dets fit both budgets, and the
    on-device windowed->dense guard keeps oversized crops correct."""
    from yolo_deepsort_tpu.api import Darknet
    from yolo_deepsort_tpu.config import DetectorConfig
    from yolo_deepsort_tpu.models.reid import random_reid_params
    from yolo_deepsort_tpu.parallel.streams import (
        init_stream_states,
        make_batched_step,
    )

    h, w = 96, 128
    model = Darknet("yolov3-tiny", img_size=96)
    det_cfg = DetectorConfig(img_size=96, conf_thres=0.05)
    trk_cfg = TrackerConfig(max_tracks=16, max_dets=8, nn_budget=4)
    reid = random_reid_params(0)
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 255, (2, h, w, 3), dtype=np.uint8)
    outs = {}
    for name, kw in (
        ("plain", {}),
        ("lowlat", dict(cap=8, crop_window=(48, 32))),
        ("smallwin", dict(cap=8, crop_window=(8, 8))),  # guard -> dense
    ):
        step = make_batched_step(model.plan, det_cfg, trk_cfg, (h, w),
                                 donate_state=False, use_fused_tracker=True,
                                 **kw)
        st = init_stream_states(trk_cfg, 2)
        for _ in range(3):
            st, (out, emit) = step(model.params, reid, st, frames)
        outs[name] = (np.asarray(out), np.asarray(emit),
                      np.asarray(st.track_id), np.asarray(st.state))
    for variant in ("lowlat", "smallwin"):
        for a, b in zip(outs["plain"], outs[variant]):
            np.testing.assert_array_equal(a, b, err_msg=variant)
