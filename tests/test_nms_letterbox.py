"""Batched NMS and letterbox ops vs their numpy oracles."""

import numpy as np
import pytest

from specs.letterbox_np import letterbox as letterbox_np
from specs.letterbox_np import rescale_boxes as rescale_np
from specs.nms_np import non_max_suppression as nms_np
from specs.nms_np import roi_non_max_suppression as roi_nms_np
from yolo_deepsort_tpu.ops.letterbox import letterbox, rescale_boxes
from yolo_deepsort_tpu.ops.nms import batched_nms, roi_nms_mask


def random_pred(rng, n_img, n_boxes, n_classes, clustered=True):
    """Synthetic decoded YOLO output with clusters of overlapping boxes."""
    preds = []
    for _ in range(n_img):
        rows = []
        n_clusters = max(1, n_boxes // 6)
        centers = rng.uniform(50, 350, (n_clusters, 2))
        for b in range(n_boxes):
            c = centers[b % n_clusters]
            cx, cy = c + rng.normal(0, 3 if clustered else 80, 2)
            w, h = rng.uniform(20, 60, 2)
            obj = rng.uniform(0, 1)
            cls = rng.dirichlet(np.ones(n_classes)) * rng.uniform(0.5, 1)
            rows.append([cx, cy, w, h, obj, *cls])
        preds.append(rows)
    return np.array(preds, np.float32)


@pytest.mark.parametrize("seed", range(5))
def test_nms_matches_oracle(seed):
    rng = np.random.default_rng(seed)
    pred = random_pred(rng, 2, 40, 3)
    dets, mask = batched_nms(pred, conf_thres=0.5, nms_thres=0.4,
                             max_boxes=64, max_dets=32)
    expected = nms_np(pred.astype(np.float64), 0.5, 0.4)
    for i in range(2):
        got = np.asarray(dets[i])[np.asarray(mask[i])]
        exp = expected[i]
        if exp is None:
            assert got.shape[0] == 0
            continue
        assert got.shape[0] == exp.shape[0], (
            f"img {i}: {got.shape[0]} vs oracle {exp.shape[0]}\n{got}\n{exp}"
        )
        np.testing.assert_allclose(got[:, :4], exp[:, :4], rtol=1e-4, atol=1e-3)
        np.testing.assert_allclose(got[:, 4:6], exp[:, 4:6], rtol=1e-5, atol=1e-6)
        np.testing.assert_array_equal(got[:, 6], exp[:, 6])


def test_nms_weighted_merge_exact():
    pred = np.array([[
        [50, 50, 20, 20, 0.9, 0.8, 0.1],
        [52, 50, 20, 20, 0.6, 0.7, 0.2],
        [200, 200, 20, 20, 0.7, 0.1, 0.85],
    ]], np.float32)
    dets, mask = batched_nms(pred, 0.5, 0.4, max_boxes=8, max_dets=4)
    got = np.asarray(dets[0])[np.asarray(mask[0])]
    assert got.shape[0] == 2
    x1_expected = (0.9 * 40 + 0.6 * 42) / 1.5
    assert got[0, 0] == pytest.approx(x1_expected, rel=1e-5)
    assert got[0, 6] == 0 and got[1, 6] == 1


def test_nms_empty_and_all_below_threshold():
    pred = np.zeros((1, 10, 7), np.float32)
    pred[..., 4] = 0.1
    dets, mask = batched_nms(pred, 0.5, 0.4, max_boxes=8, max_dets=4)
    assert not np.asarray(mask).any()


@pytest.mark.parametrize("seed", range(4))
def test_roi_nms_matches_oracle(seed):
    rng = np.random.default_rng(seed)
    d = 12
    boxes = np.concatenate(
        [rng.uniform(0, 200, (d, 2)), rng.uniform(20, 80, (d, 2))], axis=1
    ).astype(np.float32)
    scores = rng.uniform(0.1, 1.0, d).astype(np.float32)
    for thr in (0.3, 0.5, 0.7):
        keep_ref = set(roi_nms_np(boxes.astype(np.float64), thr, scores))
        keep_jax = set(
            np.flatnonzero(
                np.asarray(roi_nms_mask(boxes, scores, np.ones(d, bool), thr))
            ).tolist()
        )
        assert keep_jax == keep_ref, f"thr={thr}: {keep_jax} vs {keep_ref}"


@pytest.mark.parametrize("hw", [(30, 50), (50, 30), (41, 41), (17, 64)])
@pytest.mark.parametrize("interp", ["bilinear", "nearest"])
def test_letterbox_matches_oracle(hw, interp):
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (*hw, 3), dtype=np.uint8)
    out = np.asarray(letterbox(img, 32, interp=interp))
    exp = letterbox_np(img, 32, interp=interp)
    np.testing.assert_allclose(out, exp, atol=2e-3)


def test_rescale_boxes_matches_oracle():
    rng = np.random.default_rng(1)
    boxes = rng.uniform(0, 416, (10, 4)).astype(np.float32)
    out = np.asarray(rescale_boxes(boxes, 416, 1080, 1920))
    exp = rescale_np(boxes.astype(np.float64), 416, (1080, 1920))
    np.testing.assert_allclose(out, exp, rtol=1e-4, atol=1e-3)
    out2 = np.asarray(rescale_boxes(boxes, 416, 1920, 1080))
    exp2 = rescale_np(boxes.astype(np.float64), 416, (1920, 1080))
    np.testing.assert_allclose(out2, exp2, rtol=1e-4, atol=1e-3)


def test_nms_prefix_property_smaller_max_dets():
    """NMS at a smaller max_dets equals the larger-capacity run's prefix
    (rows emit score-descending into contiguous slots) -- the property the
    K=1 low-latency path relies on to run NMS at ``cap`` directly instead
    of slicing a full-capacity run."""
    rng = np.random.default_rng(42)
    n, b, c = 2, 400, 8
    pred = np.zeros((n, b, 5 + c), np.float32)
    pred[..., 0:2] = rng.uniform(40, 200, (n, b, 2))
    pred[..., 2:4] = rng.uniform(10, 60, (n, b, 2))
    pred[..., 4] = rng.uniform(0, 1, (n, b))
    pred[..., 5:] = rng.uniform(0, 1, (n, b, c))
    big, big_mask = batched_nms(pred, 0.3, 0.5, max_boxes=256, max_dets=32)
    small, small_mask = batched_nms(pred, 0.3, 0.5, max_boxes=256,
                                    max_dets=12)
    np.testing.assert_array_equal(np.asarray(small_mask),
                                  np.asarray(big_mask)[:, :12])
    np.testing.assert_array_equal(
        np.asarray(small)[np.asarray(small_mask)],
        np.asarray(big)[:, :12][np.asarray(small_mask)])
