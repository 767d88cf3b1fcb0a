"""MOTChallenge file-path end-to-end: a synthesized MOT16-format sequence
directory (img1/ frames + gt/gt.txt + det/det.txt) driven through
benchmarks/mot_eval.py sequence_eval (round-1 review: this path was written
but never exercised)."""

import os
import sys

import numpy as np
import pytest

PIL = pytest.importorskip("PIL")
from PIL import Image  # noqa: E402

sys.path.insert(0, "/root/repo")

H, W = 160, 240


def _make_mot16_dir(root, n_frames=14, seed=0):
    """Two colored objects on constant trajectories; det.txt = gt boxes with
    jitter and MOTChallenge-style raw confidence scores."""
    rng = np.random.default_rng(seed)
    img_dir = os.path.join(root, "img1")
    os.makedirs(img_dir)
    os.makedirs(os.path.join(root, "gt"))
    os.makedirs(os.path.join(root, "det"))

    objs = [  # (x0, y0, vx, vy, w, h, color)
        (20, 40, 6, 1, 30, 60, (200, 40, 40)),
        (170, 30, -6, 2, 28, 56, (40, 60, 200)),
    ]
    gt_rows, det_rows = [], []
    for t in range(n_frames):
        frame = np.full((H, W, 3), 25, np.uint8)
        for tid, (x0, y0, vx, vy, bw, bh, color) in enumerate(objs, start=1):
            x = x0 + vx * t
            y = y0 + vy * t
            frame[max(y, 0):y + bh, max(x, 0):x + bw] = color
            # gt: frame,id,x,y,w,h,conf,class,visibility
            gt_rows.append(f"{t + 1},{tid},{x},{y},{bw},{bh},1,1,1.0")
            jx, jy = rng.normal(0, 1.0, 2)
            det_rows.append(
                f"{t + 1},-1,{x + jx:.2f},{y + jy:.2f},{bw},{bh},"
                f"{rng.uniform(10, 40):.2f},-1,-1"
            )
        Image.fromarray(frame).save(os.path.join(img_dir, f"{t + 1:06d}.jpg"))
    with open(os.path.join(root, "gt", "gt.txt"), "w") as f:
        f.write("\n".join(gt_rows))
    with open(os.path.join(root, "det", "det.txt"), "w") as f:
        f.write("\n".join(det_rows))
    return n_frames


def test_sequence_eval_public_detections(tmp_path):
    from benchmarks.mot_eval import sequence_eval

    seq = str(tmp_path / "MOT16-99")
    os.makedirs(seq)
    _make_mot16_dir(seq)
    m = sequence_eval(seq, detector=None, weights=None, reid_ckpt=None,
                      img_size=416, max_dets=8)
    # 2 stable objects, jittered near-perfect detections: high MOTA, no
    # switches; the first n_init-1 frames per track are unconfirmed misses
    assert m.mota > 0.5, m
    assert m.id_switches == 0, m
    assert m.num_gt == 2 * 14


def test_load_mot_file_filters(tmp_path):
    from yolo_deepsort_tpu.utils.mot import load_mot_file, mot_sequence_frames

    p = tmp_path / "gt.txt"
    p.write_text(
        "1,1,10,10,20,40,1,1,1.0\n"
        "1,2,50,10,20,40,0,1,1.0\n"   # conf 0 = ignore region
        "1,3,90,10,20,40,1,7,1.0\n"   # class 7 = non-pedestrian
        "2,1,12,11,20,40,1,1,0.1\n"   # below min_visibility
    )
    gt = load_mot_file(str(p), min_visibility=0.25)
    assert list(gt) == [1] and gt[1].shape == (1, 6)
    np.testing.assert_allclose(gt[1][0, :5], [1, 10, 10, 30, 50])
    dense = mot_sequence_frames(gt, 3)
    assert len(dense) == 3 and dense[1].shape == (0, 5)
