"""int8 embed path: walker parity, quantization error bounds, package shape.

The accuracy gate itself (train + rank-1 A/B) lives in tools/int8_gate.py;
these tests pin the machinery it relies on.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from yolo_deepsort_tpu.models.quantize import (  # noqa: E402
    calibrate_reid_act_scales,
    quantize_reid_params,
    reid_apply_f32_via_graph,
    reid_apply_int8,
)
from yolo_deepsort_tpu.models.reid import random_reid_params, reid_apply  # noqa: E402


@pytest.fixture(scope="module")
def setup():
    params = random_reid_params(seed=3)
    rng = np.random.default_rng(0)
    x = rng.normal(0, 1, (4, 128, 64, 3)).astype(np.float32)
    return params, x


def test_graph_walker_matches_reid_apply(setup):
    """The quantize module's graph walker in f32 must reproduce
    models.reid.reid_apply exactly (same graph, same math)."""
    params, x = setup
    a = np.asarray(reid_apply(params, x))
    b = np.asarray(reid_apply_f32_via_graph(params, x))
    np.testing.assert_allclose(a, b, atol=1e-5, rtol=1e-5)


def test_act_scales_cover_every_conv(setup):
    params, x = setup
    scales = calibrate_reid_act_scales(params, x)
    # stem + 4 stages x 2 blocks x (conv1, conv2) + a downsample per stage
    names = set(scales)
    assert "stem" in names
    for li in range(4):
        for bi in range(2):
            assert f"l{li}b{bi}c1" in names and f"l{li}b{bi}c2" in names
    assert sum(1 for n in names if n.endswith("d")) == 3  # 64->64 has none
    assert all(v > 0 for v in scales.values())


def test_int8_features_close_and_unit_norm(setup):
    """W8A8 with per-channel weight scales should keep unit-norm features
    within a few degrees of the f32 ones even on random weights."""
    params, x = setup
    qparams = quantize_reid_params(params, x)
    f = np.asarray(reid_apply(params, x))
    q = np.asarray(reid_apply_int8(qparams, x))
    assert q.shape == f.shape == (4, 512)
    np.testing.assert_allclose(np.linalg.norm(q, axis=1), 1.0, atol=1e-3)
    cos = np.sum(q * f, axis=1)
    assert (cos > 0.98).all(), cos


def test_quantized_package_dtypes(setup):
    params, x = setup
    qparams = quantize_reid_params(params, x)
    stem = qparams["stem"]
    assert stem["wq"].dtype == np.int8
    assert stem["wq"].shape == np.asarray(params["stem"]["w"]).shape
    assert stem["wscale"].shape == (64,)
    # round-trip error of the weights themselves is bounded by scale/2
    w = np.asarray(params["stem"]["w"], np.float32)
    back = stem["wq"].astype(np.float32) * stem["wscale"]
    assert np.abs(back - w).max() <= stem["wscale"].max() * 0.5 + 1e-7


def test_int8_conv_impl_hook(setup):
    """conv_impl lets a kernel slot in; a lax-backed impl must reproduce
    the default path bit-exactly (int32 accumulation is exact)."""
    from jax import lax

    params, x = setup
    qparams = quantize_reid_params(params, x)

    calls = []

    def impl(xq, wq, stride, pad):
        calls.append(xq.shape)
        return lax.conv_general_dilated(
            xq, jnp.asarray(wq), window_strides=(stride, stride),
            padding=[(pad, pad), (pad, pad)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32,
        )

    a = np.asarray(reid_apply_int8(qparams, x))
    b = np.asarray(reid_apply_int8(qparams, x, conv_impl=impl))
    assert len(calls) == 20  # every conv routed through the hook
    np.testing.assert_array_equal(a, b)


def test_track_stage_int8_embed_smoke():
    """make_scanned_track_stage(embed_int8=True) must run end-to-end with
    a quantized package and emit finite, well-shaped outputs."""
    import jax
    from yolo_deepsort_tpu.config import DetectorConfig, TrackerConfig
    from yolo_deepsort_tpu.parallel.streams import (
        init_stream_states,
        make_scanned_detect_stage,
        make_scanned_track_stage,
    )
    from yolo_deepsort_tpu.models.darknet import build_network
    from yolo_deepsort_tpu.cfg.architectures import ARCHITECTURES
    from yolo_deepsort_tpu.models import weights as W

    k, s, hw = 2, 2, (160, 192)
    plan = build_network(ARCHITECTURES["yolov3-tiny"](img_size=160))
    det_params = jax.tree_util.tree_map(
        jnp.asarray,
        W.fold_inference_params(W.random_raw_params(plan.defs(), seed=0),
                                plan.defs()))
    det_cfg = DetectorConfig(img_size=160, conf_thres=0.01)
    trk_cfg = TrackerConfig(max_dets=8)
    params = random_reid_params(seed=1)
    rng = np.random.default_rng(0)
    qparams = quantize_reid_params(
        params, rng.normal(0, 1, (4, 128, 64, 3)).astype(np.float32))
    qparams = jax.tree_util.tree_map(jnp.asarray, qparams)

    detect = make_scanned_detect_stage(plan, det_cfg, trk_cfg, hw,
                                       compute_dtype=jnp.bfloat16)
    track = make_scanned_track_stage(
        det_cfg, trk_cfg, hw, cap=8, compute_dtype=jnp.bfloat16,
        donate_state=False, embed_int8=True, use_fused_tracker=False)
    frames = jnp.asarray(
        rng.integers(0, 255, (k, s, *hw, 3), dtype=np.uint8))
    b7, m, _ = detect(det_params, frames)
    states = init_stream_states(trk_cfg, s)
    states, (outs, emit) = track(qparams, states, frames, b7, m)
    assert outs.shape[:2] == (k, s) and emit.shape[:2] == (k, s)
    assert bool(jnp.isfinite(states.mean).all())

    # the int8-RESIDENT route (the Pallas conv kernel's dataflow, XLA twin
    # on CPU) must run through the same stage wiring
    from yolo_deepsort_tpu.models.quantize import (
        quantize_reid_params_resident,
    )

    qres = jax.tree_util.tree_map(
        jnp.asarray,
        quantize_reid_params_resident(
            params, rng.normal(0, 1, (4, 128, 64, 3)).astype(np.float32)))
    track_res = make_scanned_track_stage(
        det_cfg, trk_cfg, hw, cap=8, compute_dtype=jnp.bfloat16,
        donate_state=False, embed_int8="resident", use_fused_tracker=False)
    states2 = init_stream_states(trk_cfg, s)
    states2, (outs2, emit2) = track_res(qres, states2, frames, b7, m)
    assert outs2.shape[:2] == (k, s)
    assert bool(jnp.isfinite(states2.mean).all())
