"""cfg-driven JAX darknet vs the numpy oracle (specs/model_np.py), weight IO
round-trips, and structural checks of the built-in architectures."""

import numpy as np
import pytest

from specs import model_np, weights_np
from yolo_deepsort_tpu.cfg import (
    emit_cfg,
    parse_model_config,
    yolov3,
    yolov3_tiny,
    yolov4,
)
from yolo_deepsort_tpu.models import weights as W
from yolo_deepsort_tpu.models.darknet import build_network, network_apply


def jax_forward(module_defs, raw_params, x_nchw, img_size):
    plan = build_network(module_defs, img_size=img_size)
    params = W.fold_inference_params(raw_params, plan.defs())
    x = np.ascontiguousarray(np.transpose(x_nchw, (0, 2, 3, 1)))
    return plan, network_apply(plan, params, x)


TINY_NET = [
    {"type": "net", "width": "16", "height": "16", "channels": "3"},
    {"type": "convolutional", "batch_normalize": "1", "filters": "8",
     "size": "3", "stride": "1", "pad": "1", "activation": "leaky"},
    {"type": "maxpool", "size": "2", "stride": "2"},
    {"type": "convolutional", "batch_normalize": "1", "filters": "12",
     "size": "3", "stride": "1", "pad": "1", "activation": "mish"},
    {"type": "route", "layers": "-2"},
    {"type": "convolutional", "batch_normalize": "1", "filters": "12",
     "size": "1", "stride": "1", "pad": "1", "activation": "leaky"},
    {"type": "shortcut", "from": "-3", "activation": "linear"},
    {"type": "maxpool", "size": "2", "stride": "1"},
    {"type": "upsample", "stride": "2"},
    {"type": "route", "layers": "-1, 0"},
    {"type": "convolutional", "batch_normalize": "0", "filters": "14",
     "size": "1", "stride": "1", "pad": "1", "activation": "linear"},
    {"type": "yolo", "mask": "0,1", "anchors": "4,6, 8,10, 12,14",
     "classes": "2", "num": "3", "jitter": ".3", "ignore_thresh": ".5",
     "truth_thresh": "1", "random": "1"},
]


def test_layer_zoo_matches_numpy_oracle():
    defs = [dict(d) for d in TINY_NET[1:]]
    blob = weights_np.random_darknet_weights(defs, seed=5)
    _, raw = weights_np.read_darknet_weights(blob, defs)
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 3, 16, 16)).astype(np.float32)

    dets_o, outs_o = model_np.forward(defs, raw, x.astype(np.float64), img_dim=16)
    _, dets_j = jax_forward(TINY_NET, raw, x, img_size=16)
    assert dets_j.shape == dets_o.shape
    np.testing.assert_allclose(np.asarray(dets_j), dets_o, rtol=2e-4, atol=2e-4)


def test_route_groups_v4_tiny_style():
    defs = [
        {"type": "convolutional", "batch_normalize": "1", "filters": "8",
         "size": "3", "stride": "1", "pad": "1", "activation": "leaky"},
        {"type": "route", "layers": "-1", "groups": "2", "group_id": "1"},
        {"type": "convolutional", "batch_normalize": "1", "filters": "6",
         "size": "1", "stride": "1", "pad": "1", "activation": "leaky"},
    ]
    blob = weights_np.random_darknet_weights(defs, seed=6)
    _, raw = weights_np.read_darknet_weights(blob, defs)
    x = np.random.default_rng(1).normal(size=(1, 3, 8, 8)).astype(np.float32)
    _, outs_o = model_np.forward(defs, raw, x.astype(np.float64))
    plan = build_network(defs, img_size=8)
    params = W.fold_inference_params(raw, defs)
    from yolo_deepsort_tpu.models.darknet import network_apply as napply

    # no yolo head: run through and compare the last feature map via oracle
    dets = napply(plan, params, np.transpose(x, (0, 2, 3, 1)))
    assert dets is None
    # compare using the oracle's layer outputs against a manual jax rebuild:
    # (route with groups halves channels: 8 -> 4 -> conv 6)
    assert outs_o[1].shape == (1, 4, 8, 8)
    assert outs_o[2].shape == (1, 6, 8, 8)


@pytest.mark.parametrize("arch,convs,params_exact", [
    (yolov3_tiny, 13, 8_858_734),
    (yolov3, 75, 62_001_757),
    (yolov4, 110, 64_429_405),
])
def test_architecture_structure(arch, convs, params_exact):
    defs = arch()[1:]
    shapes = W.conv_layer_shapes(defs)
    assert len(shapes) == convs
    # exact float payload of the official .weights files
    assert W.count_params(defs) == params_exact


def test_architecture_module_counts():
    tiny = [d["type"] for d in yolov3_tiny()[1:]]
    assert tiny.count("maxpool") == 6 and tiny.count("yolo") == 2
    v3 = [d["type"] for d in yolov3()[1:]]
    assert (v3.count("shortcut"), v3.count("route"), v3.count("upsample"),
            v3.count("yolo")) == (23, 4, 2, 3)
    v4 = [d["type"] for d in yolov4()[1:]]
    assert v4.count("yolo") == 3 and v4.count("maxpool") == 3


def test_cfg_roundtrip(tmp_path):
    for arch in (yolov3_tiny, yolov3, yolov4):
        path = tmp_path / "net.cfg"
        emit_cfg(arch(), path)
        parsed = parse_model_config(path)
        original = arch()
        assert len(parsed) == len(original)
        for a, b in zip(parsed, original):
            for k, v in b.items():
                assert str(a.get(k, "0")) == str(v), (k, a, b)


def test_weight_file_roundtrip(tmp_path):
    defs = [dict(d) for d in TINY_NET[1:]]
    raw = W.random_raw_params(defs, seed=3)
    path = tmp_path / "t.weights"
    header = np.array([0, 2, 0, 123, 0], np.int32)
    W.save_darknet_weights(path, header, raw, defs)
    header2, raw2 = W.load_darknet_weights(str(path), defs)
    assert list(header2) == [0, 2, 0, 123, 0]
    for i in raw:
        for k in raw[i]:
            np.testing.assert_array_equal(raw[i][k], raw2[i][k])
    # and the oracle reads the same bytes identically
    _, raw3 = weights_np.read_darknet_weights(path.read_bytes(), defs)
    for i in raw:
        np.testing.assert_array_equal(raw[i]["conv_weight"], raw3[i]["conv_weight"])


def test_tiny_yolo_full_arch_parity():
    """yolov3-tiny at 64x64 input (grids 2 and 4), random weights: decoded
    detections must match the numpy oracle."""
    defs = yolov3_tiny(num_classes=3, img_size=64)[1:]
    raw = W.random_raw_params(defs, seed=9)
    x = np.random.default_rng(2).normal(0.5, 0.2, (1, 3, 64, 64)).astype(np.float32)
    dets_o, _ = model_np.forward(defs, raw, x.astype(np.float64), img_dim=64)
    _, dets_j = jax_forward([{"type": "net", "width": "64", "height": "64",
                              "channels": "3"}] + defs, raw, x, img_size=64)
    assert dets_o.shape == dets_j.shape == (1, 2 * 2 * 3 + 4 * 4 * 3, 8)
    np.testing.assert_allclose(np.asarray(dets_j), dets_o, rtol=3e-3, atol=3e-3)


def test_scale_x_y_decode():
    from specs.decode_np import sigmoid
    from yolo_deepsort_tpu.ops.decode import yolo_decode as jdecode

    rng = np.random.default_rng(0)
    raw = rng.normal(size=(1, 2, 2, 1 * 7)).astype(np.float32)
    out = np.asarray(jdecode(raw, [(16.0, 16.0)], 2, 32, scale_x_y=1.2))
    cell = raw[0, 0, 0]
    expected_x = (sigmoid(cell[0]) * 1.2 - 0.1) * 16
    assert out[0, 0, 0] == pytest.approx(expected_x, rel=1e-5)


@pytest.mark.slow
def test_yolov4_full_arch_parity():
    """yolov4 (CSP routes, SPP maxpools, PAN up/down, mish, scale_x_y) at
    64x64 input with random weights: decoded detections must match the numpy
    oracle -- exercises every module type in the v4 graph."""
    defs = yolov4(num_classes=2, img_size=64)[1:]
    raw = W.random_raw_params(defs, seed=11)
    x = np.random.default_rng(5).normal(0.45, 0.15, (1, 3, 64, 64)).astype(np.float32)
    dets_o, _ = model_np.forward(defs, raw, x.astype(np.float64), img_dim=64)
    _, dets_j = jax_forward(
        [{"type": "net", "width": "64", "height": "64", "channels": "3"}] + defs,
        raw, x, img_size=64,
    )
    # grids 8 (stride 8), 4, 2 with 3 anchors each
    assert dets_o.shape == dets_j.shape == (1, 3 * (64 + 16 + 4), 7)
    np.testing.assert_allclose(np.asarray(dets_j), dets_o, rtol=4e-3, atol=4e-3)
