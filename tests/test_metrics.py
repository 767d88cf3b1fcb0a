"""mAP machinery and CLEAR-MOT evaluation tests."""

import numpy as np
import pytest

from yolo_deepsort_tpu.utils.metrics import (
    ap_per_class,
    compute_ap,
    evaluate_map,
    get_batch_statistics,
)
from yolo_deepsort_tpu.utils.mot import MotMetrics, evaluate_mot, load_mot_file


def test_compute_ap_perfect_and_zero():
    assert compute_ap([1.0], [1.0]) == pytest.approx(1.0)
    assert compute_ap([0.0], [0.0]) == pytest.approx(0.0)


def test_map_perfect_detections():
    # two images, detections exactly on targets
    outputs = [
        np.array([[10, 10, 50, 50, 0.9, 0.9, 0], [60, 60, 90, 90, 0.8, 0.9, 1]]),
        np.array([[20, 20, 40, 40, 0.95, 0.9, 0]]),
    ]
    targets = np.array([
        [0, 0, 10, 10, 50, 50],
        [0, 1, 60, 60, 90, 90],
        [1, 0, 20, 20, 40, 40],
    ], np.float64)
    p, r, ap, f1, classes = evaluate_map(outputs, targets)
    assert ap.mean() == pytest.approx(1.0)
    assert list(classes) == [0, 1]


def test_map_false_positive_lowers_precision():
    outputs = [
        np.array([
            [10, 10, 50, 50, 0.9, 0.9, 0],
            [200, 200, 240, 240, 0.95, 0.9, 0],  # FP with higher conf
        ]),
    ]
    targets = np.array([[0, 0, 10, 10, 50, 50]], np.float64)
    p, r, ap, f1, classes = evaluate_map(outputs, targets)
    assert 0.0 < ap[0] < 1.0


def test_mot_perfect_tracking():
    gt, hyp = [], []
    for t in range(10):
        gt.append(np.array([[1, 10 + t, 10, 40 + t, 80],
                            [2, 100, 10 + t, 140, 90 + t]]))
        hyp.append(np.array([[10 + t, 10, 40 + t, 80, 7],
                             [100, 10 + t, 140, 90 + t, 9]]))
    m = evaluate_mot(gt, hyp)
    assert m.mota == pytest.approx(1.0)
    assert m.id_switches == 0 and m.misses == 0 and m.false_positives == 0
    assert m.motp == pytest.approx(1.0)


def test_mot_id_switch_counted():
    gt, hyp = [], []
    for t in range(6):
        gt.append(np.array([[1, 10, 10, 40, 80]]))
        hyp_id = 5 if t < 3 else 6  # tracker switches id mid-sequence
        hyp.append(np.array([[10, 10, 40, 80, hyp_id]]))
    m = evaluate_mot(gt, hyp)
    assert m.id_switches == 1
    assert m.mota == pytest.approx(1.0 - 1 / 6)


def test_mot_misses_and_fps():
    gt = [np.array([[1, 10, 10, 40, 80]])] * 4
    hyp = [np.zeros((0, 5))] * 2 + [
        np.array([[10, 10, 40, 80, 3], [200, 200, 240, 280, 4]])
    ] * 2
    m = evaluate_mot(gt, hyp)
    assert m.misses == 2 and m.false_positives == 2
    assert m.mota == pytest.approx(1.0 - 4 / 4)


def test_mot_file_roundtrip(tmp_path):
    path = tmp_path / "gt.txt"
    path.write_text(
        "1,1,10,20,30,40,1,1,1.0\n"
        "1,2,50,60,30,40,1,1,1.0\n"
        "2,1,12,20,30,40,1,1,1.0\n"
        "2,3,0,0,10,10,0,1,1.0\n"  # conf 0 => ignore
        "3,4,5,5,10,10,1,11,1.0\n"  # class 11 => not pedestrian
    )
    frames = load_mot_file(path)
    assert set(frames.keys()) == {1, 2}
    assert frames[1].shape == (2, 6)
    np.testing.assert_allclose(frames[1][0, 1:5], [10, 20, 40, 60])


def test_idf1_perfect_and_switched():
    from yolo_deepsort_tpu.utils.mot import idf1_score

    def frame(rows_gt, rows_hyp):
        gt = np.array([[i, x, y, x + 20, y + 40] for i, x, y in rows_gt],
                      np.float64).reshape(-1, 5)
        hyp = np.array([[x, y, x + 20, y + 40, i] for i, x, y in rows_hyp],
                       np.float64).reshape(-1, 5)
        return gt, hyp

    # perfect tracking: IDF1 = 1
    seq = [frame([(1, 10 + t, 50), (2, 100, 80 + t)],
                 [(7, 10 + t, 50), (9, 100, 80 + t)]) for t in range(10)]
    gts, hyps = zip(*seq)
    assert idf1_score(gts, hyps) == 1.0

    # identity swap at t=5: each gt trajectory is covered half by one hyp
    # id, half by another -> IDTP = 10 of 20 -> IDF1 = 0.5
    seq = [frame([(1, 10 + t, 50), (2, 100, 80 + t)],
                 [(7, 10 + t, 50), (9, 100, 80 + t)] if t < 5 else
                 [(9, 10 + t, 50), (7, 100, 80 + t)]) for t in range(10)]
    gts, hyps = zip(*seq)
    assert abs(idf1_score(gts, hyps) - 0.5) < 1e-9

    # empty sequences
    assert idf1_score([np.zeros((0, 5))], [np.zeros((0, 5))]) == 1.0
    assert idf1_score([np.array([[1, 0, 0, 20, 40]])], [np.zeros((0, 5))]) == 0.0
