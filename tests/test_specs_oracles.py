"""Self-consistency tests of the numpy oracle spec (specs/), plus cross-checks
of the layer math against torch (the reference framework's semantics)."""

import numpy as np
import pytest

from specs.kalman_np import KalmanFilterNp, chi2inv95
from specs.nms_np import non_max_suppression, roi_non_max_suppression, xywh2xyxy
from specs.decode_np import yolo_decode, sigmoid
from specs.letterbox_np import letterbox, pad_to_square, rescale_boxes
from specs.tracker_np import DeepSortLogic, Detection, Tracker, NearestNeighborDistanceMetric
from specs import model_np, weights_np


# ---------------------------------------------------------------- Kalman (App A)

def test_kalman_initiate_predict_update_cycle():
    kf = KalmanFilterNp()
    z0 = np.array([100.0, 200.0, 0.5, 80.0])
    mean, cov = kf.initiate(z0)
    assert mean.shape == (8,) and cov.shape == (8, 8)
    np.testing.assert_allclose(mean[:4], z0)
    np.testing.assert_allclose(mean[4:], 0)
    # initiate std spec
    expected_std = np.array([8.0, 8.0, 1e-2, 8.0, 5.0, 5.0, 1e-5, 5.0])
    np.testing.assert_allclose(np.sqrt(np.diag(cov)), expected_std)

    mean_p, cov_p = kf.predict(mean, cov)
    np.testing.assert_allclose(mean_p[:4], z0)  # zero velocity: position fixed
    assert np.all(np.linalg.eigvalsh(cov_p) > 0)
    # predict inflates position uncertainty
    assert np.diag(cov_p)[0] > np.diag(cov)[0]

    z1 = np.array([104.0, 203.0, 0.5, 82.0])
    mean_u, cov_u = kf.update(mean_p, cov_p, z1)
    # update pulls the state toward the measurement and shrinks uncertainty
    assert abs(mean_u[0] - z1[0]) < abs(mean_p[0] - z1[0])
    assert np.diag(cov_u)[0] < np.diag(cov_p)[0]
    assert np.all(np.linalg.eigvalsh(cov_u) > -1e-9)


def test_kalman_gating_distance_zero_at_mean():
    kf = KalmanFilterNp()
    mean, cov = kf.initiate(np.array([10.0, 20.0, 0.5, 40.0]))
    mean, cov = kf.predict(mean, cov)
    proj_mean = mean[:4]
    d = kf.gating_distance(mean, cov, proj_mean[None, :])
    assert d[0] == pytest.approx(0.0, abs=1e-9)
    far = proj_mean + np.array([1000.0, 0, 0, 0])
    d_far = kf.gating_distance(mean, cov, far[None, :])
    assert d_far[0] > chi2inv95[4]


def test_kalman_converges_on_constant_velocity_target():
    kf = KalmanFilterNp()
    mean, cov = kf.initiate(np.array([0.0, 0.0, 0.5, 50.0]))
    for t in range(1, 30):
        mean, cov = kf.predict(mean, cov)
        z = np.array([3.0 * t, 4.0 * t, 0.5, 50.0])
        mean, cov = kf.update(mean, cov, z)
    assert mean[4] == pytest.approx(3.0, abs=0.3)
    assert mean[5] == pytest.approx(4.0, abs=0.3)


# ------------------------------------------------------------------ NMS (App D)

def _pred_row(cx, cy, w, h, obj, cls_scores):
    return np.array([cx, cy, w, h, obj] + list(cls_scores))


def test_nms_weighted_merge_same_class():
    # two heavily-overlapping boxes, same class -> single merged output box
    rows = np.stack([
        _pred_row(50, 50, 20, 20, 0.9, [0.8, 0.1]),
        _pred_row(52, 50, 20, 20, 0.6, [0.7, 0.2]),
    ])[None]
    out = non_max_suppression(rows, conf_thres=0.5, nms_thres=0.4)[0]
    assert out.shape[0] == 1
    # weighted merge of x1: boxes are [40,60] and [42,62] with weights .9/.6
    x1_expected = (0.9 * 40 + 0.6 * 42) / 1.5
    assert out[0, 0] == pytest.approx(x1_expected)
    assert out[0, 4] == pytest.approx(0.9)  # top row's obj conf
    assert out[0, 6] == 0  # class


def test_nms_different_class_not_suppressed():
    rows = np.stack([
        _pred_row(50, 50, 20, 20, 0.9, [0.8, 0.1]),
        _pred_row(52, 50, 20, 20, 0.8, [0.1, 0.9]),
    ])[None]
    out = non_max_suppression(rows, conf_thres=0.5, nms_thres=0.4)[0]
    assert out.shape[0] == 2
    assert set(out[:, 6].astype(int).tolist()) == {0, 1}


def test_nms_conf_filter_and_empty():
    rows = np.stack([_pred_row(50, 50, 20, 20, 0.3, [0.9, 0.0])])[None]
    out = non_max_suppression(rows, conf_thres=0.5, nms_thres=0.4)
    assert out[0] is None


def test_nms_disjoint_boxes_kept():
    rows = np.stack([
        _pred_row(20, 20, 10, 10, 0.9, [0.9]),
        _pred_row(80, 80, 10, 10, 0.8, [0.9]),
        _pred_row(20, 80, 10, 10, 0.7, [0.9]),
    ])[None]
    out = non_max_suppression(rows, conf_thres=0.5, nms_thres=0.4)[0]
    assert out.shape[0] == 3


def test_roi_nms_passthrough_at_one():
    boxes = np.array([[0, 0, 10, 10], [1, 1, 10, 10], [50, 50, 5, 5]], dtype=float)
    scores = np.array([0.9, 0.8, 0.7])
    keep = roi_non_max_suppression(boxes, 1.0, scores)
    assert sorted(keep) == [0, 1, 2]
    keep2 = roi_non_max_suppression(boxes, 0.5, scores)
    assert 1 not in keep2 and 0 in keep2 and 2 in keep2


# ---------------------------------------------------------------- decode (App C)

def test_yolo_decode_shapes_and_math():
    rng = np.random.default_rng(0)
    g, a, c, s = 4, 3, 2, 64  # grid 4, stride 16
    anchors = [(16.0, 32.0), (32.0, 16.0), (48.0, 48.0)]
    raw = rng.normal(size=(2, a * (5 + c), g, g))
    out = yolo_decode(raw, anchors, c, s)
    assert out.shape == (2, a * g * g, 5 + c)
    stride = s / g
    # check one cell by hand: anchor 1, cell (row 2, col 3), batch 1
    cell = raw[1, (5 + c) : 2 * (5 + c), 2, 3]
    flat_idx = 1 * g * g + 2 * g + 3
    row = out[1, flat_idx]
    assert row[0] == pytest.approx((sigmoid(cell[0]) + 3) * stride)
    assert row[1] == pytest.approx((sigmoid(cell[1]) + 2) * stride)
    assert row[2] == pytest.approx(np.exp(cell[2]) * anchors[1][0])
    assert row[3] == pytest.approx(np.exp(cell[3]) * anchors[1][1])
    assert row[4] == pytest.approx(sigmoid(cell[4]))
    np.testing.assert_allclose(row[5:], sigmoid(cell[5:]))


# ------------------------------------------------------------- letterbox (App F)

def test_pad_to_square_symmetric():
    img = np.ones((10, 16, 3))
    padded, pad = pad_to_square(img, 0.0)
    assert padded.shape == (16, 16, 3)
    assert pad == (3, 3, 0, 0)
    img2 = np.ones((17, 10, 3))
    padded2, pad2 = pad_to_square(img2, 0.0)
    assert padded2.shape == (17, 17, 3)
    assert pad2 == (0, 0, 3, 4)


def test_rescale_boxes_roundtrip():
    # a box in a 1080x1920 frame, mapped through letterbox space and back
    orig_shape = (1080, 1920)
    s = 416
    # forward mapping: scale + pad (as the letterbox does)
    scale = s / 1920
    pad_y_total = (1920 - 1080)  # pixels added in original space
    box_orig = np.array([100.0, 200.0, 600.0, 800.0])
    # original -> padded square -> network
    y_off = pad_y_total // 2
    box_net = np.array([
        box_orig[0] * scale,
        (box_orig[1] + y_off) * scale,
        box_orig[2] * scale,
        (box_orig[3] + y_off) * scale,
    ])
    back = rescale_boxes(box_net[None], s, orig_shape)[0]
    np.testing.assert_allclose(back, box_orig, atol=1.5)


def test_letterbox_shape_and_range():
    img = (np.random.default_rng(0).uniform(0, 255, (30, 50, 3))).astype(np.uint8)
    out = letterbox(img, 32)
    assert out.shape == (32, 32, 3)
    assert out.min() >= 0 and out.max() <= 1.0


# ------------------------------------------------- tracker end-to-end (App A/B)

def _feat(seed, dim=8):
    rng = np.random.default_rng(seed)
    f = rng.normal(size=dim)
    return f / np.linalg.norm(f)


def test_tracker_lifecycle_and_ids():
    ds = DeepSortLogic(n_init=3, max_age=70)
    img_shape = (480, 640)
    fa, fb = _feat(1), _feat(2)
    # two objects moving right; constant distinct features
    for t in range(5):
        boxes = np.array([
            [100 + 5 * t, 100, 40, 80],
            [300 + 5 * t, 200, 40, 80],
        ], dtype=float)
        out = ds.update(boxes, [0.9, 0.9], np.stack([fa, fb]), img_shape)
        if t < 2:
            assert out.shape[0] == 0  # still tentative
        else:
            assert out.shape[0] == 2  # confirmed from 3rd hit
    ids = set(out[:, 4].tolist())
    assert ids == {1, 2}
    # object A's track follows its position
    a_row = out[out[:, 4] == 1][0]
    assert abs((a_row[0] + a_row[2]) / 2 - (100 + 5 * 4)) < 10


def test_tracker_handles_miss_and_reacquire():
    ds = DeepSortLogic(n_init=2, max_age=70)
    img_shape = (480, 640)
    f = _feat(3)
    for t in range(4):
        out = ds.update(np.array([[100 + 5 * t, 100, 40, 80]]), [0.9], f[None], img_shape)
    assert out.shape[0] == 1 and out[0, 4] == 1
    # miss two frames: coasting output only for tsu<=1
    out = ds.update(np.zeros((0, 4)), [], np.zeros((0, 8)), img_shape)
    assert out.shape[0] == 1  # tsu == 1, still emitted (predicted box)
    out = ds.update(np.zeros((0, 4)), [], np.zeros((0, 8)), img_shape)
    assert out.shape[0] == 0  # tsu == 2, muted
    # reappears near prediction with same feature -> same id via cascade
    out = ds.update(np.array([[100 + 5 * 6, 100, 40, 80]]), [0.9], f[None], img_shape)
    assert out.shape[0] == 1 and out[0, 4] == 1


def test_tentative_track_deleted_on_single_miss():
    ds = DeepSortLogic(n_init=3)
    img_shape = (480, 640)
    ds.update(np.array([[100, 100, 40, 80]]), [0.9], _feat(4)[None], img_shape)
    assert len(ds.tracker.tracks) == 1
    ds.update(np.zeros((0, 4)), [], np.zeros((0, 8)), img_shape)
    assert len(ds.tracker.tracks) == 0


def test_gallery_budget_trim():
    metric = NearestNeighborDistanceMetric("cosine", 0.2, budget=5)
    feats = [_feat(i) for i in range(10)]
    metric.partial_fit(feats, [7] * 10, [7])
    assert len(metric.samples[7]) == 5
    np.testing.assert_allclose(metric.samples[7][-1], feats[-1])


# ------------------------------------------------------- weights format (App E)

TINY_DEFS = [
    {"type": "convolutional", "batch_normalize": 1, "filters": 4, "size": 3,
     "stride": 1, "pad": 1, "activation": "leaky"},
    {"type": "maxpool", "size": 2, "stride": 2},
    {"type": "convolutional", "batch_normalize": 1, "filters": 8, "size": 3,
     "stride": 1, "pad": 1, "activation": "leaky"},
    {"type": "route", "layers": "-2"},
    {"type": "convolutional", "batch_normalize": 0, "filters": 6, "size": 1,
     "stride": 1, "pad": 1, "activation": "linear"},
]


def test_weights_roundtrip():
    blob = weights_np.random_darknet_weights(TINY_DEFS, in_channels=3, seed=1)
    header, params = weights_np.read_darknet_weights(blob, TINY_DEFS)
    assert list(header) == [0, 2, 0, 0, 0]
    assert set(params.keys()) == {0, 2, 4}
    assert params[0]["conv_weight"].shape == (4, 3, 3, 3)
    assert params[2]["conv_weight"].shape == (8, 4, 3, 3)
    # route -2 from module 3 refers to module 1 output (4 channels)
    assert params[4]["conv_weight"].shape == (6, 4, 1, 1)
    assert "conv_bias" in params[4] and "bn_weight" not in params[4]
    blob2 = weights_np.write_darknet_weights(header, params, TINY_DEFS)
    assert blob == blob2


# ------------------------------------------------ numpy model vs torch semantics

torch = pytest.importorskip("torch")


def test_conv2d_matches_torch():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 3, 9, 9))
    w = rng.normal(size=(5, 3, 3, 3))
    ours = model_np.conv2d(x, w, stride=2, pad=1)
    theirs = torch.nn.functional.conv2d(
        torch.tensor(x), torch.tensor(w), stride=2, padding=1
    ).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-10)


def test_batchnorm_matches_torch():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, 4, 5, 5))
    g, b = rng.normal(size=4), rng.normal(size=4)
    m, v = rng.normal(size=4), rng.uniform(0.5, 2, 4)
    ours = model_np.batch_norm(x, g, b, m, v)
    bn = torch.nn.BatchNorm2d(4, eps=1e-5, momentum=0.9).eval()
    bn.weight.data = torch.tensor(g)
    bn.bias.data = torch.tensor(b)
    bn.running_mean.data = torch.tensor(m)
    bn.running_var.data = torch.tensor(v)
    theirs = bn(torch.tensor(x)).detach().numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-6)


def test_mish_and_leaky_match_torch():
    x = np.linspace(-6, 6, 101)
    np.testing.assert_allclose(
        model_np.mish(x),
        torch.nn.functional.mish(torch.tensor(x)).numpy(),
        atol=1e-10,
    )
    np.testing.assert_allclose(
        model_np.leaky_relu(x),
        torch.nn.functional.leaky_relu(torch.tensor(x), 0.1).numpy(),
        atol=1e-12,
    )


def test_maxpool_matches_torch():
    rng = np.random.default_rng(2)
    x = rng.normal(size=(1, 2, 8, 8))
    # standard darknet maxpool k2 s2
    ours = model_np.maxpool(x, 2, 2)
    theirs = torch.nn.functional.max_pool2d(torch.tensor(x), 2, 2).numpy()
    np.testing.assert_allclose(ours, theirs)
    # tiny-yolo's k2 s1 with ZeroPad2d((0,1,0,1))
    ours2 = model_np.maxpool(x, 2, 1)
    xp = torch.nn.functional.pad(torch.tensor(x), (0, 1, 0, 1))
    theirs2 = torch.nn.functional.max_pool2d(xp, 2, 1).numpy()
    np.testing.assert_allclose(ours2, theirs2)
    # SPP-style k5 s1 p2
    ours3 = model_np.maxpool(x, 5, 1)
    theirs3 = torch.nn.functional.max_pool2d(torch.tensor(x), 5, 1, padding=2).numpy()
    np.testing.assert_allclose(ours3, theirs3)


def test_numpy_forward_tiny_net_runs():
    defs = TINY_DEFS
    blob = weights_np.random_darknet_weights(defs, seed=3)
    _, params = weights_np.read_darknet_weights(blob, defs)
    x = np.random.default_rng(4).normal(size=(1, 3, 8, 8))
    dets, outs = model_np.forward(defs, params, x)
    assert dets is None
    assert outs[0].shape == (1, 4, 8, 8)
    assert outs[1].shape == (1, 4, 4, 4)
    assert outs[2].shape == (1, 8, 4, 4)
    assert outs[3].shape == (1, 4, 4, 4)  # route back to maxpool output
    assert outs[4].shape == (1, 6, 4, 4)
