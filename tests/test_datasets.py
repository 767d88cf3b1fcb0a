"""Detection datasets: folder globbing, label letterbox re-normalization,
flip augmentation, multiscale batching."""

import os

import numpy as np
import pytest

PIL = pytest.importorskip("PIL")
from PIL import Image  # noqa: E402

from yolo_deepsort_tpu.data import ImageFolder, ListDataset  # noqa: E402


def _write_img(path, h, w, value):
    Image.fromarray(np.full((h, w, 3), value, np.uint8)).save(path)


def test_image_folder(tmp_path):
    for i in range(3):
        _write_img(tmp_path / f"{i}.jpg", 40, 60, 50 * i)
    (tmp_path / "notes.txt").write_text("ignored")
    ds = ImageFolder(str(tmp_path), img_size=32)
    assert len(ds) == 3
    path, img = ds[0]
    assert path.endswith("0.jpg") and img.shape == (32, 32, 3)


def _make_det_dataset(root, boxes_per_img):
    img_dir = root / "images"
    lbl_dir = root / "labels"
    img_dir.mkdir()
    lbl_dir.mkdir()
    paths = []
    for i, boxes in enumerate(boxes_per_img):
        p = img_dir / f"im{i}.jpg"
        _write_img(p, 48, 96, 30 * (i + 1))  # wide images: vertical padding
        lines = [" ".join(str(v) for v in b) for b in boxes]
        (lbl_dir / f"im{i}.txt").write_text("\n".join(lines))
        paths.append(str(p))
    lst = root / "train.txt"
    lst.write_text("\n".join(paths))
    return str(lst)


def test_list_dataset_label_renormalization(tmp_path):
    # a box centered at (0.5, 0.5) of a 96x48 image: after pad-to-square the
    # center stays at x=0.5, y = (0.5*48+24)/96 = 0.5; w scales by 1, h by 1/2
    lst = _make_det_dataset(tmp_path, [[[0, 0.5, 0.5, 0.5, 0.5]]])
    ds = ListDataset(lst, img_size=32, augment=False, multiscale=False)
    x, boxes = ds.load_sample(0, 32)
    assert x.shape == (32, 32, 3)
    np.testing.assert_allclose(boxes[0], [0, 0.5, 0.5, 0.5, 0.25], atol=1e-6)


def test_list_dataset_flip(tmp_path):
    lst = _make_det_dataset(tmp_path, [[[1, 0.25, 0.5, 0.1, 0.2]]])
    ds = ListDataset(lst, img_size=32, augment=True, multiscale=False, seed=0)
    seen_x = set()
    for _ in range(20):
        _, boxes = ds.load_sample(0, 32)
        seen_x.add(round(float(boxes[0, 1]), 4))
    assert seen_x == {0.25, 0.75}  # original and mirrored


def test_list_dataset_batches_and_multiscale(tmp_path):
    lst = _make_det_dataset(
        tmp_path,
        [[[0, 0.5, 0.5, 0.2, 0.2]], [[1, 0.3, 0.4, 0.1, 0.1],
                                     [0, 0.7, 0.6, 0.2, 0.3]], [], []],
    )
    ds = ListDataset(lst, img_size=96, augment=False, multiscale=True,
                     max_targets=8, seed=1)
    sizes = set()
    for imgs, targets, mask, size in ds.batches(2, shuffle=False):
        assert imgs.shape == (2, size, size, 3)
        assert targets.shape == (8, 6) and mask.shape == (8,)
        assert size % 32 == 0 and 0 < size <= 96 + 96
        sizes.add(size)
        # batch indices within range
        assert (targets[mask][:, 0] < 2).all()
    # re-run enough epochs to see multiscale variation
    for _ in range(12):
        for _ in ds.batches(2):
            pass
        sizes.update([s for *_x, s in [(None, None, None, ds.img_size)]])
    assert len(sizes) >= 1


def test_mosaic_augmentation(tmp_path):
    """Mosaic: 4-image composite, labels clipped to visible quadrants,
    normalized coords in range, degenerate slivers dropped."""
    from PIL import Image

    from yolo_deepsort_tpu.data.datasets import ListDataset

    img_dir = tmp_path / "images"
    lbl_dir = tmp_path / "labels"
    img_dir.mkdir(); lbl_dir.mkdir()
    rng = np.random.default_rng(0)
    paths = []
    colors = [(200, 30, 30), (30, 200, 30), (30, 30, 200), (200, 200, 30)]
    for i in range(4):
        p = img_dir / f"im{i}.jpg"
        Image.fromarray(np.full((64, 64, 3), colors[i], np.uint8)).save(p)
        (lbl_dir / f"im{i}.txt").write_text("0 0.5 0.5 0.5 0.5")
        paths.append(str(p))
    lst = tmp_path / "train.txt"
    lst.write_text("\n".join(paths))

    ds = ListDataset(str(lst), img_size=64, augment=False, multiscale=False,
                     max_targets=16, mosaic=True, seed=1)
    for _ in range(4):  # several random centers
        for imgs, targets, mask, size in ds.batches(2, shuffle=False):
            assert imgs.shape == (2, 64, 64, 3)
            t = targets[mask]
            assert len(t) >= 2  # some boxes always survive clipping
            # normalized, in-range, non-degenerate
            assert (t[:, 2:] >= 0).all() and (t[:, 2:] <= 1).all()
            assert (t[:, 4] > 0).all() and (t[:, 5] > 0).all()
            # box extents stay inside the canvas
            assert ((t[:, 2] - t[:, 4] / 2) >= -1e-6).all()
            assert ((t[:, 2] + t[:, 4] / 2) <= 1 + 1e-6).all()
            # and the composite actually contains several source images
            assert len(np.unique(imgs[0].reshape(-1, 3), axis=0)) > 2
