"""Pallas fused letterbox vs the XLA/numpy letterbox (interpret mode on CPU)."""

import numpy as np
import pytest

from specs.letterbox_np import letterbox as letterbox_np
from yolo_deepsort_tpu.ops.pallas_letterbox import pallas_letterbox


@pytest.mark.parametrize("hw", [(48, 64), (64, 48), (64, 64), (36, 64)])
def test_pallas_letterbox_matches_oracle(hw):
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (*hw, 3), dtype=np.uint8)
    out = np.asarray(pallas_letterbox(img, size=32, tile=8, interpret=True))
    exp = letterbox_np(img, 32, interp="bilinear")
    np.testing.assert_allclose(out, exp, atol=3e-3)


def test_pallas_letterbox_1080p_shape():
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, (270, 480, 3), dtype=np.uint8)  # 1080p/4 geom
    out = np.asarray(pallas_letterbox(img, size=416, tile=8, interpret=True))
    assert out.shape == (416, 416, 3)
    exp = letterbox_np(img, 416, interp="bilinear")
    np.testing.assert_allclose(out, exp, atol=3e-3)
