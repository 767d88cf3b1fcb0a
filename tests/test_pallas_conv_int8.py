"""Fused int8 conv kernel (ops/pallas_conv_int8.py) and the int8-resident
ReID path (models/quantize.reid_apply_int8_resident).

Pinning strategy: the XLA twin (_xla_conv_int8_resident) defines the
semantics; the Pallas kernel must produce the SAME int8 codes up to
FMA-fusion rounding ties (XLA may contract ``acc*scale + bias`` into an
fma whose 1-ULP difference flips a value sitting exactly on a rounding
boundary: observed 1 code in ~65k; bounded here at <=1 code on <=0.01% of
elements). Interpret mode on CPU; the real-TPU A/B runs in
tools/bench_chunk_stages.py. The resident path as a whole is pinned
against the per-layer int8 path (reid_apply_int8) by feature cosine --
they differ only by the documented extra shortcut roundings -- and
against f32 by the same bound the round-3 accuracy gate passed.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from yolo_deepsort_tpu.models.quantize import (  # noqa: E402
    _xla_conv_int8_resident,
    quantize_reid_params,
    quantize_reid_params_resident,
    reid_apply_int8,
    reid_apply_int8_resident,
)
from yolo_deepsort_tpu.models.reid import random_reid_params, reid_apply  # noqa: E402
from yolo_deepsort_tpu.ops.pallas_conv_int8 import conv_int8  # noqa: E402


def _rand_qconv(rng, k, ci, co, out_scale=0.05):
    w = rng.normal(0, 0.4, (k, k, ci, co)).astype(np.float32)
    wscale = np.abs(w).reshape(-1, co).max(0) / 127.0
    wq = np.clip(np.rint(w / wscale), -127, 127).astype(np.int8)
    return {
        "wq": jnp.asarray(wq),
        "scale": jnp.asarray(0.02 * wscale, jnp.float32),
        "b": jnp.asarray(rng.normal(0, 0.1, co), jnp.float32),
        "oinv": jnp.float32(1.0 / out_scale),
    }


CASES = [
    # (n, hi, wi, ci, co, k, stride, pad, relu, out_int8, residual)
    (4, 8, 8, 128, 128, 3, 1, 1, True, True, False),
    (4, 8, 8, 128, 128, 3, 1, 1, True, True, True),
    (4, 8, 8, 64, 128, 3, 2, 1, True, True, False),
    (8, 4, 4, 256, 256, 3, 1, 1, True, False, True),   # f32 out (last conv)
    (4, 8, 8, 128, 256, 1, 2, 0, False, True, False),  # 1x1 downsample
]


@pytest.mark.parametrize("case", CASES)
def test_kernel_matches_xla_twin_exactly(case):
    """Same int8 codes (or f32 values) as the XLA twin, every case."""
    n, hi, wi, ci, co, k, stride, pad, relu, out_int8, has_res = case
    rng = np.random.default_rng(hash(case) % 2**31)
    xq = jnp.asarray(
        rng.integers(-127, 128, (n, hi, wi, ci)).astype(np.int8))
    qp = _rand_qconv(rng, k, ci, co)
    ho = (hi + 2 * pad - k) // stride + 1
    wo = (wi + 2 * pad - k) // stride + 1
    res = res_scale = None
    if has_res:
        res = jnp.asarray(
            rng.integers(-127, 128, (n, ho, wo, co)).astype(np.int8))
        res_scale = jnp.float32(0.03)

    want = _xla_conv_int8_resident(
        xq, qp, stride, pad, relu, out_int8, residual=res,
        res_scale=res_scale)
    got = conv_int8(
        xq, qp["wq"], qp["scale"], qp["b"], qp["oinv"], res, res_scale,
        stride=stride, pad=pad, relu=relu, out_int8=out_int8,
        interpret=True)
    assert got.dtype == want.dtype
    if out_int8:
        _assert_codes_match(np.asarray(got), np.asarray(want))
    else:
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=1e-6, atol=1e-5)


def _assert_codes_match(got: np.ndarray, want: np.ndarray) -> None:
    """Equal int8 codes up to FMA rounding ties: <=1 code apart, on
    <=0.01% of elements."""
    diff = np.abs(got.astype(np.int32) - want.astype(np.int32))
    assert diff.max() <= 1, diff.max()
    frac = float((diff > 0).mean())
    assert frac <= 1e-4, frac


@pytest.fixture(scope="module")
def resident_setup():
    params = random_reid_params(seed=3)
    rng = np.random.default_rng(11)
    calib = rng.normal(0, 1, (16, 128, 64, 3)).astype(np.float32)
    x = rng.normal(0, 1, (8, 128, 64, 3)).astype(np.float32)
    qres = quantize_reid_params_resident(params, calib)
    return params, calib, x, qres


def test_resident_close_to_per_layer_int8(resident_setup):
    """The resident path only adds the documented shortcut roundings on
    top of the per-layer int8 path: features stay nearly identical, and
    both stay close to f32 (the gate bound)."""
    params, calib, x, qres = resident_setup
    q = quantize_reid_params(params, calib)
    f_layer = np.asarray(reid_apply_int8(q, jnp.asarray(x)))
    f_res = np.asarray(
        reid_apply_int8_resident(qres, jnp.asarray(x),
                                 front_dtype=jnp.float32))
    f_f32 = np.asarray(reid_apply(params, jnp.asarray(x)))
    cos_rl = np.sum(f_res * f_layer, axis=1)
    cos_rf = np.sum(f_res * f_f32, axis=1)
    assert cos_rl.min() > 0.995, cos_rl
    assert cos_rf.min() > 0.99, cos_rf


def test_resident_pallas_matches_xla_resident(resident_setup):
    """Full net: kernel-backed resident forward == XLA-twin resident
    forward (same int8 dataflow, interpret mode)."""
    params, calib, x, qres = resident_setup
    f_xla = np.asarray(
        reid_apply_int8_resident(qres, jnp.asarray(x),
                                 front_dtype=jnp.float32))
    f_pl = np.asarray(
        reid_apply_int8_resident(qres, jnp.asarray(x), use_pallas=True,
                                 interpret=True, front_dtype=jnp.float32))
    # int8 codes match through stages 2-4 up to FMA rounding ties (see
    # module docstring); one flipped code moves a normalized feature by
    # O(scale/||feat||) -- bound the feature delta accordingly
    cos = np.sum(f_pl * f_xla, axis=1)
    assert cos.min() > 0.99999, cos
    np.testing.assert_allclose(f_pl, f_xla, atol=2e-3)


def test_resident_batch_shapes(resident_setup):
    """Capacity-bucket batch sizes (odd multiples of 8, K=1 sizes) all
    route through _pick_g without divisibility surprises."""
    params, calib, _, qres = resident_setup
    rng = np.random.default_rng(0)
    for n in (8, 24, 72):
        x = rng.normal(0, 1, (n, 128, 64, 3)).astype(np.float32)
        f = reid_apply_int8_resident(qres, jnp.asarray(x), use_pallas=True,
                                     interpret=True,
                                     front_dtype=jnp.float32)
        assert f.shape == (n, 512)
        assert np.isfinite(np.asarray(f)).all()
