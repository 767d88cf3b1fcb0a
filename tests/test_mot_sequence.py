"""benchmarks/mot_eval.py sequence mode on a synthetic MOTChallenge-format
directory (img1/ + gt/gt.txt + det/det.txt)."""

import os
import sys

import numpy as np
import pytest

PIL = pytest.importorskip("PIL")
from PIL import Image  # noqa: E402

sys.path.insert(0, "/root/repo/benchmarks")

from mot_eval import sequence_eval  # noqa: E402


def make_sequence(root, n_frames=12, h=240, w=320):
    """Two bright objects moving on a dark background; gt + perfect dets."""
    os.makedirs(root / "img1")
    os.makedirs(root / "gt")
    os.makedirs(root / "det")
    gt_rows, det_rows = [], []
    colors = [(220, 60, 60), (60, 60, 220)]
    for t in range(1, n_frames + 1):
        frame = np.full((h, w, 3), 25, np.uint8)
        for oid in (1, 2):
            x = 30 + 8 * t + 120 * (oid - 1)
            y = 60 + 4 * t + 40 * (oid - 1)
            bw, bh = 30, 60
            frame[y : y + bh, x : x + bw] = colors[oid - 1]
            gt_rows.append(f"{t},{oid},{x},{y},{bw},{bh},1,1,1.0")
            det_rows.append(f"{t},-1,{x},{y},{bw},{bh},20")
        Image.fromarray(frame).save(root / "img1" / f"{t:06d}.jpg")
    (root / "gt" / "gt.txt").write_text("\n".join(gt_rows))
    (root / "det" / "det.txt").write_text("\n".join(det_rows))


@pytest.mark.slow
def test_sequence_eval_from_public_detections(tmp_path):
    seq = tmp_path / "SYN-01"
    make_sequence(seq)
    m = sequence_eval(str(seq), detector=None, weights=None, reid_ckpt=None,
                      img_size=416)
    # perfect detections: after the 2-frame confirmation delay everything
    # tracks cleanly
    assert m.id_switches == 0, m
    assert m.misses <= 4, m  # confirmation delay only
    assert m.false_positives == 0, m
    assert m.mota > 0.8, m
