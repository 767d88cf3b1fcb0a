"""Pallas fused windowed crop kernel vs the XLA windowed resampler
(interpret mode on CPU; the on-chip parity/speed A/B lives in
tools/bench_probes.py --probe crop-window)."""

import jax
import jax.numpy as jnp
import numpy as np

from yolo_deepsort_tpu.ops.crops import crop_and_normalize_windowed
from yolo_deepsort_tpu.ops.pallas_crops import (
    pallas_crop_and_normalize_batch,
    pallas_crops_supported,
)


def _boxes(rng, b, d, h, w, max_w, max_h):
    bw = rng.uniform(2, max_w, (b, d))
    bh = rng.uniform(2, max_h, (b, d))
    x1 = rng.uniform(-10, w, (b, d))  # includes edge-clipped boxes
    y1 = rng.uniform(-10, h, (b, d))
    return np.stack([x1, y1, x1 + bw, y1 + bh], -1).astype(np.float32)


def test_pallas_crops_match_windowed_xla():
    rng = np.random.default_rng(2)
    b, d, h, w = 2, 5, 64, 128
    frames = rng.integers(0, 256, (b, h, w, 3), dtype=np.uint8)
    boxes = _boxes(rng, b, d, h, w, max_w=40, max_h=30)
    got = np.asarray(pallas_crop_and_normalize_batch(
        frames, boxes, 32, 40, interpret=True))
    want = np.asarray(jax.vmap(
        lambda f, bx: crop_and_normalize_windowed(
            f, bx, 32, 40, compute_dtype=jnp.bfloat16)
    )(jnp.asarray(frames), jnp.asarray(boxes)))
    assert got.shape == (b, d, 128, 64, 3)
    # both paths are bf16 compute; difference is accumulation order only
    np.testing.assert_allclose(got, want, atol=0.06)


def test_pallas_crops_interleaved_layout_matches(monkeypatch):
    """The interleaved-RGB variant (kept for reproducible A/B re-measurement
    on future hardware, YDT_CROPS_LAYOUT=interleaved) must stay numerically
    equivalent to the default planar kernel."""
    rng = np.random.default_rng(4)
    b, d, h, w = 1, 4, 64, 128
    frames = rng.integers(0, 256, (b, h, w, 3), dtype=np.uint8)
    boxes = _boxes(rng, b, d, h, w, max_w=40, max_h=30)
    planar = np.asarray(pallas_crop_and_normalize_batch(
        frames, boxes, 32, 40, interpret=True))
    monkeypatch.setenv("YDT_CROPS_LAYOUT", "interleaved")
    inter = np.asarray(pallas_crop_and_normalize_batch(
        frames, boxes, 32, 40, interpret=True))
    np.testing.assert_allclose(inter, planar, atol=0.06)


def test_pallas_crops_pad_to_crops_per_program():
    """d not divisible by crops_per_program pads internally and slices back."""
    rng = np.random.default_rng(3)
    b, d, h, w = 1, 3, 64, 128
    frames = rng.integers(0, 256, (b, h, w, 3), dtype=np.uint8)
    boxes = _boxes(rng, b, d, h, w, max_w=40, max_h=30)
    a = np.asarray(pallas_crop_and_normalize_batch(
        frames, boxes, 32, 40, crops_per_program=4, interpret=True))
    bb = np.asarray(pallas_crop_and_normalize_batch(
        frames, boxes, 32, 40, crops_per_program=1, interpret=True))
    assert a.shape == (b, d, 128, 64, 3)
    np.testing.assert_allclose(a, bb, atol=1e-5)


def test_pallas_crops_supported_geometry():
    assert pallas_crops_supported(1080, 1920, 320, 192)
    assert pallas_crops_supported(2160, 3840, 640, 384)
    assert not pallas_crops_supported(1079, 1920, 320, 192)  # H % 8
    assert not pallas_crops_supported(1080, 1900, 320, 192)  # W % 128
