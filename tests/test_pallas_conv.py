"""Parity tests for the backbone MXU conv kernels (ops/pallas_conv.py).

Interpret mode on CPU: same arithmetic as the TPU kernel, minus the Mosaic
lowering. Parity anchors:
  * bf16 mode vs models.darknet._conv + _activate (bf16 inputs, f32
    accumulate) -- f32 tolerance (sums reassociate across the 9 taps);
  * int8 mode vs models.quantize's W8A8 per-layer semantics (quantize-in,
    int8 MACs, per-channel dequant + bias + act out);
  * the conv_impl hook routed through network_apply on yolov3-tiny must
    reproduce the XLA forward end-to-end.

Reference contract: SURVEY.md section 2.3 module builder
(yolo3/models.py:~90-160) -- scheduling changes only, never topology.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from yolo_deepsort_tpu.models.darknet import _activate, _conv
from yolo_deepsort_tpu.ops.pallas_conv import (
    backbone_conv_eligible,
    conv_mxu_bf16,
    conv_mxu_int8,
    make_backbone_conv_impl,
)


def _rand_case(rng, n, hw, ci, co, k):
    x = rng.standard_normal((n, hw, hw, ci), np.float32).astype(jnp.bfloat16)
    w = (rng.standard_normal((k, k, ci, co), np.float32) / np.sqrt(k * k * ci))
    b = rng.standard_normal((co,), np.float32)
    return x, w.astype(np.float32), b


# backbone-representative shapes (v3-416 deep stages + heads), small-N
CASES = [
    # n, hw, ci, co, k, stride, act
    (2, 16, 128, 256, 3, 1, "leaky"),
    (2, 16, 256, 128, 1, 1, "leaky"),
    (2, 16, 128, 256, 3, 2, "leaky"),
    (1, 13, 256, 512, 3, 1, "leaky"),   # odd spatial, odd N
    (4, 8, 256, 255, 1, 1, "linear"),   # head conv: co not 128-multiple
]


@pytest.mark.parametrize("n,hw,ci,co,k,stride,act", CASES)
def test_conv_bf16_matches_xla(n, hw, ci, co, k, stride, act):
    if stride == 2 and hw % 2:
        pytest.skip("odd spatial stride-2 not routed")
    rng = np.random.default_rng(hash((n, hw, ci, co, k, stride)) % 2**32)
    x, w, b = _rand_case(rng, n, hw, ci, co, k)
    pad = (k - 1) // 2
    ref = _activate(
        _conv(x, w, b, stride, pad, jnp.bfloat16), act, jnp.bfloat16
    )
    got = conv_mxu_bf16(
        x, jnp.asarray(w, jnp.bfloat16), jnp.asarray(b), stride=stride,
        pad=pad, act=act, interpret=True,
    )
    assert got.shape == ref.shape and got.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32),
        rtol=2e-2, atol=2e-2,
    )


@pytest.mark.parametrize("k,stride", [(3, 1), (3, 2), (1, 1)])
def test_conv_int8_matches_quantize_semantics(k, stride):
    """int8 mode == quantize-in -> int8 conv (int32 acc) -> per-channel
    dequant + bias + leaky, the scheme gated by tools/int8_gate.py."""
    rng = np.random.default_rng(7 + k + stride)
    n, hw, ci, co = 2, 16, 128, 256
    x = rng.standard_normal((n, hw, hw, ci), np.float32).astype(np.float32)
    w = rng.standard_normal((k, k, ci, co), np.float32) / np.sqrt(k * k * ci)
    b = rng.standard_normal((co,), np.float32)
    pad = (k - 1) // 2

    xscale = np.float32(np.abs(x).max() / 127.0)
    wscale = (np.abs(w).reshape(-1, co).max(0) / 127.0).astype(np.float32)
    wq = np.clip(np.rint(w / wscale), -127, 127).astype(np.int8)

    # semantics twin in plain XLA
    xq = jnp.clip(jnp.round(jnp.asarray(x) / xscale), -127, 127).astype(jnp.int8)
    acc = jax.lax.conv_general_dilated(
        xq.astype(jnp.int32), jnp.asarray(wq, jnp.int32),
        window_strides=(stride, stride), padding=[(pad, pad)] * 2,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    ref = acc.astype(jnp.float32) * (xscale * wscale)[None, None, None, :] + b
    ref = jnp.where(ref > 0, ref, 0.1 * ref)

    got = conv_mxu_int8(
        jnp.asarray(x), jnp.asarray(wq), jnp.asarray(b),
        jnp.asarray(xscale * wscale), jnp.asarray(1.0 / xscale),
        stride=stride, pad=pad, act="leaky", interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32),
        rtol=1e-2, atol=1e-2,
    )


def test_eligibility_policy():
    assert backbone_conv_eligible(52, 52, 128, 256, 3, 1, "leaky")
    assert backbone_conv_eligible(13, 13, 512, 1024, 3, 1, "leaky")
    assert not backbone_conv_eligible(104, 104, 128, 256, 3, 1, "leaky")
    assert not backbone_conv_eligible(52, 52, 64, 128, 3, 1, "leaky")
    assert not backbone_conv_eligible(52, 52, 128, 256, 3, 1, "mish")
    assert not backbone_conv_eligible(13, 13, 512, 1024, 5, 1, "leaky")
    assert not backbone_conv_eligible(13, 13, 512, 1024, 3, 2, "leaky")


def test_network_apply_conv_impl_tiny_parity():
    """Full tiny-416 forward with the hook == plain XLA forward (both bf16);
    exercises routing (early layers fall back, deep layers take the kernel)
    and the fused activation parity in-graph."""
    from yolo_deepsort_tpu.cfg.architectures import yolov3_tiny
    from yolo_deepsort_tpu.models.darknet import build_network, network_apply
    from yolo_deepsort_tpu.models import weights as W

    cfg = yolov3_tiny()
    plan = build_network(cfg, 416)
    defs = [dict(d) for d in cfg[1:]]
    params = W.fold_inference_params(W.random_raw_params(defs, seed=4), defs)
    rng = np.random.default_rng(0)
    x = rng.random((1, 416, 416, 3), np.float32)

    ref = network_apply(plan, params, jnp.asarray(x), jnp.bfloat16)
    impl = make_backbone_conv_impl(interpret=True)
    routed = {"n": 0}

    def counting_impl(*a):
        out = impl(*a)
        if out is not None:
            routed["n"] += 1
        return out

    got = network_apply(plan, params, jnp.asarray(x), jnp.bfloat16,
                        conv_impl=counting_impl)
    assert routed["n"] >= 3, routed  # deep tiny layers must route
    r = np.asarray(ref, np.float32)
    g = np.asarray(got, np.float32)
    # decoded boxes: coords in px (atol dominated), sigmoided scores
    # coords pass through exp(tw)*anchor: bf16 tap-sum reassociation shows
    # up as ~2-3% relative on a handful of boxes -- that is the bf16 noise
    # floor, not a kernel bug (f32-accumulated taps, tested above)
    np.testing.assert_allclose(g[..., :4], r[..., :4], atol=3.0, rtol=4e-2)
    np.testing.assert_allclose(g[..., 4:], r[..., 4:], atol=3e-2)
