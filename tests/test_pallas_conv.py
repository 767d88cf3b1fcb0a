"""Parity tests for the backbone MXU conv kernels (ops/pallas_conv.py).

Interpret mode on CPU: same arithmetic as the TPU kernel, minus the Mosaic
lowering. Parity anchors:
  * bf16 mode vs models.darknet._conv + _activate (bf16 inputs, f32
    accumulate) -- f32 tolerance (sums reassociate across the 9 taps);
  * int8 mode vs models.quantize's W8A8 per-layer semantics (quantize-in,
    int8 MACs, per-channel dequant + bias + act out);
  * the conv_impl hook routed through network_apply on yolov3-tiny must
    reproduce the XLA forward end-to-end.

Reference contract: SURVEY.md section 2.3 module builder
(yolo3/models.py:~90-160) -- scheduling changes only, never topology.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from yolo_deepsort_tpu.models.darknet import _activate, _conv
from yolo_deepsort_tpu.ops.pallas_conv import (
    backbone_conv_eligible,
    conv_mxu_bf16,
    conv_mxu_int8,
    make_backbone_conv_impl,
)


def _rand_case(rng, n, hw, ci, co, k):
    x = rng.standard_normal((n, hw, hw, ci), np.float32).astype(jnp.bfloat16)
    w = (rng.standard_normal((k, k, ci, co), np.float32) / np.sqrt(k * k * ci))
    b = rng.standard_normal((co,), np.float32)
    return x, w.astype(np.float32), b


# backbone-representative shapes (v3-416 deep stages + heads), small-N
CASES = [
    # n, hw, ci, co, k, stride, act
    (2, 16, 128, 256, 3, 1, "leaky"),
    (2, 16, 256, 128, 1, 1, "leaky"),
    (2, 16, 128, 256, 3, 2, "leaky"),
    (1, 13, 256, 512, 3, 1, "leaky"),   # odd spatial, odd N
    (4, 8, 256, 255, 1, 1, "linear"),   # head conv: co not 128-multiple
    (2, 16, 128, 256, 3, 1, "mish"),    # v4 CSP backbone activation
]


@pytest.mark.parametrize("n,hw,ci,co,k,stride,act", CASES)
def test_conv_bf16_matches_xla(n, hw, ci, co, k, stride, act):
    if stride == 2 and hw % 2:
        pytest.skip("odd spatial stride-2 not routed")
    rng = np.random.default_rng(hash((n, hw, ci, co, k, stride)) % 2**32)
    x, w, b = _rand_case(rng, n, hw, ci, co, k)
    pad = (k - 1) // 2
    ref = _activate(
        _conv(x, w, b, stride, pad, jnp.bfloat16), act, jnp.bfloat16
    )
    got = conv_mxu_bf16(
        x, jnp.asarray(w, jnp.bfloat16), jnp.asarray(b), stride=stride,
        pad=pad, act=act, interpret=True,
    )
    assert got.shape == ref.shape and got.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32),
        rtol=2e-2, atol=2e-2,
    )


@pytest.mark.parametrize("k,stride", [(3, 1), (3, 2), (1, 1)])
def test_conv_int8_matches_quantize_semantics(k, stride):
    """int8 mode == quantize-in -> int8 conv (int32 acc) -> per-channel
    dequant + bias + leaky, the scheme gated by tools/int8_gate.py."""
    rng = np.random.default_rng(7 + k + stride)
    n, hw, ci, co = 2, 16, 128, 256
    x = rng.standard_normal((n, hw, hw, ci), np.float32).astype(np.float32)
    w = rng.standard_normal((k, k, ci, co), np.float32) / np.sqrt(k * k * ci)
    b = rng.standard_normal((co,), np.float32)
    pad = (k - 1) // 2

    xscale = np.float32(np.abs(x).max() / 127.0)
    wscale = (np.abs(w).reshape(-1, co).max(0) / 127.0).astype(np.float32)
    wq = np.clip(np.rint(w / wscale), -127, 127).astype(np.int8)

    # semantics twin in plain XLA
    xq = jnp.clip(jnp.round(jnp.asarray(x) / xscale), -127, 127).astype(jnp.int8)
    acc = jax.lax.conv_general_dilated(
        xq.astype(jnp.int32), jnp.asarray(wq, jnp.int32),
        window_strides=(stride, stride), padding=[(pad, pad)] * 2,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    ref = acc.astype(jnp.float32) * (xscale * wscale)[None, None, None, :] + b
    ref = jnp.where(ref > 0, ref, 0.1 * ref)

    got = conv_mxu_int8(
        jnp.asarray(x), jnp.asarray(wq), jnp.asarray(b),
        jnp.asarray(xscale * wscale), jnp.asarray(1.0 / xscale),
        stride=stride, pad=pad, act="leaky", interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32),
        rtol=1e-2, atol=1e-2,
    )


def test_eligibility_policy():
    assert backbone_conv_eligible(52, 52, 128, 256, 3, 1, "leaky")
    assert backbone_conv_eligible(13, 13, 512, 1024, 3, 1, "leaky")
    assert not backbone_conv_eligible(104, 104, 128, 256, 3, 1, "leaky")
    assert not backbone_conv_eligible(52, 52, 64, 128, 3, 1, "leaky")
    assert backbone_conv_eligible(52, 52, 128, 256, 3, 1, "mish")  # v4 CSP
    assert not backbone_conv_eligible(52, 52, 128, 256, 3, 1, "swish")
    assert not backbone_conv_eligible(13, 13, 512, 1024, 5, 1, "leaky")
    assert not backbone_conv_eligible(13, 13, 512, 1024, 3, 2, "leaky")


def test_network_apply_conv_impl_tiny_parity():
    """Full tiny-416 forward with the hook == plain XLA forward (both bf16);
    exercises routing (early layers fall back, deep layers take the kernel)
    and the fused activation parity in-graph."""
    from yolo_deepsort_tpu.cfg.architectures import yolov3_tiny
    from yolo_deepsort_tpu.models.darknet import build_network, network_apply
    from yolo_deepsort_tpu.models import weights as W

    cfg = yolov3_tiny()
    plan = build_network(cfg, 416)
    defs = [dict(d) for d in cfg[1:]]
    params = W.fold_inference_params(W.random_raw_params(defs, seed=4), defs)
    rng = np.random.default_rng(0)
    x = rng.random((1, 416, 416, 3), np.float32)

    ref = network_apply(plan, params, jnp.asarray(x), jnp.bfloat16)
    impl = make_backbone_conv_impl(interpret=True)
    routed = {"n": 0}

    def counting_impl(*a):
        out = impl(*a)
        if out is not None:
            routed["n"] += 1
        return out

    got = network_apply(plan, params, jnp.asarray(x), jnp.bfloat16,
                        conv_impl=counting_impl)
    assert routed["n"] >= 3, routed  # deep tiny layers must route
    r = np.asarray(ref, np.float32)
    g = np.asarray(got, np.float32)
    # decoded boxes: coords in px (atol dominated), sigmoided scores
    # coords pass through exp(tw)*anchor: bf16 tap-sum reassociation shows
    # up as ~2-3% relative on a handful of boxes -- that is the bf16 noise
    # floor, not a kernel bug (f32-accumulated taps, tested above)
    np.testing.assert_allclose(g[..., :4], r[..., :4], atol=3.0, rtol=4e-2)
    np.testing.assert_allclose(g[..., 4:], r[..., 4:], atol=3e-2)


def _v3tiny_setup(seed=4):
    from yolo_deepsort_tpu.cfg.architectures import yolov3_tiny
    from yolo_deepsort_tpu.models.darknet import build_network
    from yolo_deepsort_tpu.models import weights as W

    cfg = yolov3_tiny()
    plan = build_network(cfg, 416)
    defs = [dict(d) for d in cfg[1:]]
    params = W.fold_inference_params(
        W.random_raw_params(defs, seed=seed), defs)
    return plan, params


def test_quantize_darknet_calibration_covers_deep_layers():
    from yolo_deepsort_tpu.models.quantize_darknet import (
        calibrate_darknet_act_scales, quantize_darknet_convs)

    plan, params = _v3tiny_setup()
    calib = np.random.default_rng(1).random((1, 416, 416, 3), np.float32)
    scales = calibrate_darknet_act_scales(plan, params, calib)
    assert len(scales) >= 3, scales  # tiny's deep 128/256/512/1024 convs
    pkg = quantize_darknet_convs(plan, params, calib)
    assert set(pkg) == set(scales)
    for idx, qp in pkg.items():
        assert qp["wq"].dtype == np.int8
        co = qp["wq"].shape[3]
        assert qp["scale"].shape == (co,) and qp["b"].shape == (co,)
        assert float(qp["xinv"]) > 0


def test_darknet_int8_pallas_matches_xla_twin():
    """Same int8 codes both routes: int32 accumulation is exact, so the
    Pallas kernel (interpret) and the XLA twin must agree bit-for-bit
    through the full tiny-416 forward (whitelisted to packaged layers so
    every other conv takes the identical XLA path)."""
    from yolo_deepsort_tpu.models.darknet import network_apply
    from yolo_deepsort_tpu.models.quantize_darknet import (
        make_xla_int8_conv_impl, quantize_darknet_convs)

    plan, params = _v3tiny_setup()
    rng = np.random.default_rng(2)
    calib = rng.random((1, 416, 416, 3), np.float32)
    pkg = quantize_darknet_convs(plan, params, calib)
    x = jnp.asarray(rng.random((1, 416, 416, 3), np.float32))

    twin = network_apply(plan, params, x, jnp.bfloat16,
                         conv_impl=make_xla_int8_conv_impl(pkg))
    pl_impl = make_backbone_conv_impl(
        int8_pkg=pkg, layer_whitelist=frozenset(pkg), interpret=True)
    got = network_apply(plan, params, x, jnp.bfloat16, conv_impl=pl_impl)
    np.testing.assert_array_equal(
        np.asarray(got, np.float32), np.asarray(twin, np.float32))


def test_darknet_int8_accuracy_near_bf16():
    """int8 detect outputs must stay close to f32 on the quantities NMS
    consumes (objectness ordering, box geometry) -- the cheap in-suite
    sibling of tools/int8_detect_gate.py."""
    from yolo_deepsort_tpu.models.darknet import network_apply
    from yolo_deepsort_tpu.models.quantize_darknet import (
        make_xla_int8_conv_impl, quantize_darknet_convs)

    plan, params = _v3tiny_setup(seed=11)
    rng = np.random.default_rng(3)
    calib = rng.random((2, 416, 416, 3), np.float32)
    pkg = quantize_darknet_convs(plan, params, calib)
    x = jnp.asarray(rng.random((1, 416, 416, 3), np.float32))

    f32 = np.asarray(network_apply(plan, params, x, jnp.float32), np.float32)
    q = np.asarray(network_apply(plan, params, x, jnp.bfloat16,
                                 conv_impl=make_xla_int8_conv_impl(pkg)),
                   np.float32)
    # top-32 objectness rows (what NMS sees at serving thresholds)
    top = np.argsort(-f32[0, :, 4])[:32]
    conf_mae = float(np.abs(q[0, top, 4] - f32[0, top, 4]).mean())
    assert conf_mae < 0.05, conf_mae
    # geometry of those rows within a few px at 416
    box_err = float(np.abs(q[0, top, :4] - f32[0, top, :4]).max())
    assert box_err < 8.0, box_err


@pytest.mark.slow
def test_darknet_int8_yolov4_mish_route():
    """yolov4's CSP backbone (mish activations, route groups, SPP) through
    the int8 package: eligibility must pick up mish layers, and the XLA
    twin's detect output must stay near f32 (the Pallas kernel is bitwise
    vs the twin per test_darknet_int8_pallas_matches_xla_twin; the mish
    epilogue itself is covered by the CASES sweep)."""
    from yolo_deepsort_tpu.cfg.architectures import yolov4
    from yolo_deepsort_tpu.models.darknet import build_network, network_apply
    from yolo_deepsort_tpu.models import weights as W
    from yolo_deepsort_tpu.models.quantize_darknet import (
        make_xla_int8_conv_impl, quantize_darknet_convs)

    cfg = yolov4(img_size=256)
    plan = build_network(cfg, 256)
    defs = [dict(d) for d in cfg[1:]]
    params = W.fold_inference_params(
        W.random_raw_params(defs, seed=5), defs)
    rng = np.random.default_rng(6)
    calib = rng.random((1, 256, 256, 3), np.float32)
    pkg = quantize_darknet_convs(plan, params, calib)
    mish_layers = [i for i in pkg
                   if plan.defs()[i].get("activation") == "mish"]
    assert len(pkg) >= 8 and mish_layers, (len(pkg), mish_layers)

    x = jnp.asarray(rng.random((1, 256, 256, 3), np.float32))
    f32 = np.asarray(network_apply(plan, params, x, jnp.float32), np.float32)
    q = np.asarray(network_apply(plan, params, x, jnp.bfloat16,
                                 conv_impl=make_xla_int8_conv_impl(pkg)),
                   np.float32)
    top = np.argsort(-f32[0, :, 4])[:32]
    conf_mae = float(np.abs(q[0, top, 4] - f32[0, top, 4]).mean())
    assert conf_mae < 0.05, conf_mae
    # random (non-BN-consistent) v4 weights overflow exp(tw) to inf for
    # some rows in BOTH paths (reference-faithful decode, App. C); compare
    # geometry only where the f32 reference is finite
    fin = np.isfinite(f32[0, top, :4]).all(1)
    assert fin.any()
    box_err = float(np.abs(q[0, top, :4][fin] - f32[0, top, :4][fin]).max())
    assert box_err < 8.0, box_err


def test_step_plumbing_backbone_conv_int8():
    """The serving-step plumbing: BucketedScannedStep and make_batched_step
    accept (use_pallas_conv, backbone_int8_pkg) and run end-to-end on CPU in
    interpret mode -- covers the batched-step restructure that hoists the
    backbone out of the per-stream vmap (streams.py fused_frame_step
    decoded=...)."""
    from yolo_deepsort_tpu.cfg.architectures import yolov3_tiny
    from yolo_deepsort_tpu.config import DetectorConfig, TrackerConfig
    from yolo_deepsort_tpu.models.darknet import build_network
    from yolo_deepsort_tpu.models import weights as W
    from yolo_deepsort_tpu.models.quantize_darknet import (
        quantize_darknet_from_frames)
    from yolo_deepsort_tpu.models.reid import random_reid_params
    from yolo_deepsort_tpu.parallel.streams import (
        BucketedScannedStep, init_stream_states, make_batched_step)

    size, h, w, s, k = 256, 256, 320, 2, 2
    cfg = yolov3_tiny(img_size=size)
    plan = build_network(cfg, size)
    defs = [dict(d) for d in cfg[1:]]
    params = W.fold_inference_params(
        W.random_raw_params(defs, seed=7), defs)
    rng = np.random.default_rng(9)
    frames = rng.integers(0, 256, (k, s, h, w, 3), dtype=np.uint8)
    pkg = quantize_darknet_from_frames(plan, params, frames[0], size)
    assert pkg, "tiny-256 deep layers must be eligible"

    det_cfg = DetectorConfig(img_size=size, conf_thres=0.3, nms_thres=0.4,
                             max_dets=8)
    trk_cfg = TrackerConfig(max_dets=8, max_tracks=16)

    step = BucketedScannedStep(
        plan, det_cfg, trk_cfg, (h, w), buckets=(4, 8),
        compute_dtype=jnp.bfloat16, donate_state=False,
        use_pallas_conv="interpret", backbone_int8_pkg=pkg,
    )
    states = init_stream_states(trk_cfg, s)
    states, (outputs, emit) = step(
        params, random_reid_params(seed=1), states, jnp.asarray(frames))
    assert outputs.shape == (k, s, trk_cfg.max_tracks, 5)
    assert np.isfinite(np.asarray(states.mean)).all()

    step1 = make_batched_step(
        plan, det_cfg, trk_cfg, (h, w), compute_dtype=jnp.bfloat16,
        donate_state=False, use_pallas_conv="interpret",
        backbone_int8_pkg=pkg,
    )
    st1 = init_stream_states(trk_cfg, s)
    st1, (o1, e1) = step1(params, random_reid_params(seed=1), st1,
                          jnp.asarray(frames[0]))
    assert o1.shape == (s, trk_cfg.max_tracks, 5)
    assert np.isfinite(np.asarray(st1.mean)).all()


def test_load_conv_whitelist_roundtrip(tmp_path):
    """tools/autotune_conv.py emits {"bf16": [...], "int8": [...],
    "backend": ...}; the loader must refuse a whitelist tuned on another
    backend (per-shape winners are chip-specific)."""
    import json

    from yolo_deepsort_tpu.ops.pallas_conv import load_conv_whitelist

    rec = {"model": "yolov3", "img_size": 416, "batch": 8,
           "backend": jax.default_backend(), "bf16": [37, 64], "int8": [63]}
    path = tmp_path / "conv_whitelist_yolov3_416_b8.json"
    path.write_text(json.dumps(rec))
    wl = load_conv_whitelist("yolov3", 416, 8, tuned_dir=str(tmp_path))
    assert wl == {"bf16": frozenset({37, 64}), "int8": frozenset({63})}

    rec["backend"] = "not-this-backend"
    path.write_text(json.dumps(rec))
    assert load_conv_whitelist("yolov3", 416, 8,
                               tuned_dir=str(tmp_path)) is None
    del rec["backend"]  # a file missing the field is equally untrusted
    path.write_text(json.dumps(rec))
    assert load_conv_whitelist("yolov3", 416, 8,
                               tuned_dir=str(tmp_path)) is None
    assert load_conv_whitelist("yolov3", 608, 8,
                               tuned_dir=str(tmp_path)) is None  # no file


def test_quantize_layers_restriction():
    """quantize_darknet_convs(layers=...) packages only the requested
    subset -- the whitelist route must not pay calibration for layers it
    keeps in bf16."""
    from yolo_deepsort_tpu.models.quantize_darknet import (
        quantize_darknet_convs)

    plan, params = _v3tiny_setup()
    rng = np.random.default_rng(3)
    x = rng.random((1, 416, 416, 3), np.float32)
    full = quantize_darknet_convs(plan, params, x)
    assert len(full) >= 2
    keep = {sorted(full)[0]}
    sub = quantize_darknet_convs(plan, params, x, layers=keep)
    assert set(sub) == keep


def test_whitelist_dict_conv_route():
    """The serving steps accept use_pallas_conv as a load_conv_whitelist
    dict: only whitelisted layers leave XLA, int8-whitelisted layers take
    the W8A8 kernel, and the full forward stays at XLA parity."""
    from yolo_deepsort_tpu.models.darknet import network_apply
    from yolo_deepsort_tpu.models.quantize_darknet import (
        make_xla_int8_conv_impl, quantize_darknet_convs)
    from yolo_deepsort_tpu.parallel.streams import _make_conv_impl

    plan, params = _v3tiny_setup()
    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.random((1, 416, 416, 3), np.float32))

    # discover which layers the unrestricted impl would route
    probe = make_backbone_conv_impl(interpret=True)
    routed = []

    def discover(xv, w, b, stride, pad, act, idx):
        out = probe(xv, w, b, stride, pad, act, idx)
        if out is not None:
            routed.append(idx)
        return None  # discovery only: keep the forward on XLA

    network_apply(plan, params, x, jnp.bfloat16, conv_impl=discover)
    assert len(routed) >= 3
    bf16_l, int8_l = routed[0], routed[1]
    pkg = quantize_darknet_convs(plan, params, np.asarray(x),
                                 layers={int8_l})
    assert set(pkg) == {int8_l}

    # reference: the same routing decision composed by hand -- bf16 kernel
    # on bf16_l, the arithmetically-identical XLA int8 twin on int8_l.
    # This isolates ROUTING; quantization accuracy has its own tests.
    bf16_impl = make_backbone_conv_impl(interpret=True,
                                        layer_whitelist=frozenset({bf16_l}))
    twin = make_xla_int8_conv_impl(pkg)

    def composed(xv, w, b, stride, pad, act, idx):
        if idx == int8_l:
            return twin(xv, w, b, stride, pad, act, idx)
        return bf16_impl(xv, w, b, stride, pad, act, idx)

    ref = np.asarray(
        network_apply(plan, params, x, jnp.bfloat16, conv_impl=composed),
        np.float32)

    wl = {"bf16": frozenset({bf16_l}), "int8": frozenset({int8_l}),
          "interpret": True}
    impl = _make_conv_impl(wl, pkg)
    taken = []

    def counting(xv, w, b, stride, pad, act, idx):
        out = impl(xv, w, b, stride, pad, act, idx)
        if out is not None:
            taken.append(idx)
        return out

    got = np.asarray(
        network_apply(plan, params, x, jnp.bfloat16, conv_impl=counting),
        np.float32)
    assert sorted(taken) == sorted({bf16_l, int8_l})
    # interpret kernel vs XLA twin: same int8 MACs, bf16-level noise only
    np.testing.assert_allclose(got[..., :4], ref[..., :4], atol=3.0,
                               rtol=4e-2)
    np.testing.assert_allclose(got[..., 4:], ref[..., 4:], atol=3e-2)
