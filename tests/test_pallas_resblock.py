"""Parity tests for the fused residual-block chain kernels
(ops/pallas_resblock.py).

Interpret mode on CPU: same arithmetic as the TPU kernel, minus the
Mosaic lowering. Parity anchors:
  * bf16 chains vs the per-layer XLA path (models.darknet._conv +
    _activate + shortcut add at bf16 compute dtype) -- f32 tolerance
    (per-conv sums reassociate);
  * int8 chains vs the composed W8A8 XLA twin
    (models.quantize_darknet.make_xla_int8_conv_impl semantics);
  * span discovery on the stock yolov3 cfg (darknet-53's residual
    stages) must exclude externally-referenced intermediates;
  * the block_impl hook routed through network_apply must reproduce the
    XLA forward end-to-end on a residual toy network.

Reference contract: SURVEY.md section 2.3 module builder
(yolo3/models.py:~90-160 conv/shortcut stack) -- scheduling + optional
MAC precision changes only, never topology.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from yolo_deepsort_tpu.models.darknet import (
    _activate,
    _conv,
    build_network,
    network_apply,
)
from yolo_deepsort_tpu.cfg.parse import parse_model_config
from yolo_deepsort_tpu.ops.pallas_resblock import (
    find_residual_spans,
    make_resblock_impl,
    plan_chain_schedule,
    resblock_chain_bf16,
    resblock_chain_int8,
)


def _chain_case(rng, n, h, w, ci, cm, nblk):
    x = rng.standard_normal((n, h, w, ci), np.float32).astype(jnp.bfloat16)
    w1 = (rng.standard_normal((nblk, 1, 1, ci, cm), np.float32)
          / np.sqrt(ci))
    b1 = rng.standard_normal((nblk, cm), np.float32)
    w2 = (rng.standard_normal((nblk, 3, 3, cm, ci), np.float32)
          / np.sqrt(9 * cm))
    b2 = rng.standard_normal((nblk, ci), np.float32)
    return x, w1, b1, w2, b2


def _xla_chain(x, w1, b1, w2, b2, act):
    """Per-layer bf16 reference: conv1x1+act -> conv3x3+act -> add."""
    out = x
    for b in range(w1.shape[0]):
        m = _activate(_conv(out, w1[b], b1[b], 1, 0, jnp.bfloat16), act,
                      jnp.bfloat16)
        y = _activate(_conv(m, w2[b], b2[b], 1, 1, jnp.bfloat16), act,
                      jnp.bfloat16)
        out = out + y
    return out


CASES = [
    # n, h, w, ci, cm, nblk, act
    (2, 16, 16, 256, 128, 1, "leaky"),
    (2, 16, 16, 256, 128, 3, "leaky"),   # chain: state stays resident
    (1, 13, 13, 256, 128, 2, "leaky"),   # odd spatial (v3-416 deep stage)
    (2, 8, 8, 128, 128, 2, "mish"),      # v4 CSP act, Cm == Ci
    (16, 8, 8, 128, 128, 1, "leaky"),    # multi-program batch grid
]


@pytest.mark.parametrize("n,h,w,ci,cm,nblk,act", CASES)
def test_chain_bf16_matches_xla(n, h, w, ci, cm, nblk, act):
    rng = np.random.default_rng(hash((n, h, ci, cm, nblk)) % 2**32)
    x, w1, b1, w2, b2 = _chain_case(rng, n, h, w, ci, cm, nblk)
    ref = _xla_chain(x, w1, b1, w2, b2, act)
    got = resblock_chain_bf16(
        x, jnp.asarray(w1.reshape(nblk, ci, cm), jnp.bfloat16),
        jnp.asarray(b1), jnp.asarray(w2, jnp.bfloat16), jnp.asarray(b2),
        act=act, interpret=True)
    assert got.shape == ref.shape and got.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32),
        rtol=3e-2, atol=3e-2)


def _quant_layer(rng, w, xabs):
    """absmax per-channel weight quant + an activation scale chosen so
    |xq| <= 31: every int32 accumulation then stays < 2^24, i.e. exactly
    representable in the f32 arithmetic XLA CPU *emulates* int8 convs
    with -- otherwise the twin's (and interpret-mode kernel's) results
    shift with the backend's accumulation partitioning (observed: the
    same bits pass or fail depending on virtual device count)."""
    wmax = np.abs(w).max(axis=(0, 1, 2)) + 1e-8
    wscale = wmax / 127.0
    wq = np.clip(np.round(w / wscale), -127, 127).astype(np.int8)
    xscale = np.float32(max(xabs, 1e-6) / 31.0)
    return wq, wscale.astype(np.float32), xscale


def _xla_int8_chain(x, pkgs, act):
    """Composed W8A8 twin: quantize-in -> int8 conv (int32 acc) ->
    per-channel dequant + bias + act -> bf16; bf16 shortcut add."""
    from jax import lax

    out = x.astype(jnp.bfloat16)
    for p1, p2 in pkgs:
        cur = out
        for p, (stride, pad) in ((p1, (1, 0)), (p2, (1, 1))):
            xq = jnp.clip(
                jnp.round(cur.astype(jnp.float32) * p["xinv"]), -127, 127
            ).astype(jnp.int8)
            acc = lax.conv_general_dilated(
                xq, jnp.asarray(p["wq"]), window_strides=(stride, stride),
                padding=[(pad, pad), (pad, pad)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.int32)
            y = acc.astype(jnp.float32) * jnp.asarray(p["scale"])
            cur = _activate(y + jnp.asarray(p["b"]), act,
                            jnp.bfloat16).astype(jnp.bfloat16)
        out = out + cur
    return out


def _calib_absmax(x, w1, b1, w2, b2, act):
    """Per-conv input absmax from a bf16 pre-pass (chain state, then the
    mid activation) -- the test's stand-in for calibration."""
    out = x
    abses = []
    for b in range(w1.shape[0]):
        a1 = float(jnp.abs(out.astype(jnp.float32)).max())
        m = _activate(_conv(out, w1[b], b1[b], 1, 0, jnp.bfloat16), act,
                      jnp.bfloat16)
        a2 = float(jnp.abs(m.astype(jnp.float32)).max())
        y = _activate(_conv(m, w2[b], b2[b], 1, 1, jnp.bfloat16), act,
                      jnp.bfloat16)
        out = out + y
        abses.append((a1, a2))
    return abses


@pytest.mark.parametrize("nblk,act", [(1, "leaky"), (2, "leaky"),
                                      (2, "mish")])
def test_chain_int8_matches_twin(nblk, act):
    rng = np.random.default_rng(11 + nblk)
    n, h, w, ci, cm = 2, 13, 13, 256, 128
    x, w1, b1, w2, b2 = _chain_case(rng, n, h, w, ci, cm, nblk)
    abses = _calib_absmax(x, w1, b1, w2, b2, act)

    pkgs = []
    for b in range(nblk):
        wq1, ws1, xs1 = _quant_layer(rng, w1[b], abses[b][0])
        wq2, ws2, xs2 = _quant_layer(rng, w2[b], abses[b][1])
        pkgs.append((
            {"wq": wq1, "scale": xs1 * ws1, "b": b1[b],
             "xinv": np.float32(1.0 / xs1)},
            {"wq": wq2, "scale": xs2 * ws2, "b": b2[b],
             "xinv": np.float32(1.0 / xs2)},
        ))
    # The twin MUST run jitted: XLA CPU contracts the dequant glue
    # (acc*scale + bias) into an FMA under jit (one rounding) but not in
    # eager op-by-op dispatch (two roundings) -- a 1-ulp f32 difference
    # that flips ~3% of re-quantisation codes at round(.5) boundaries.
    # The kernel (always jitted) is bit-exact vs the jitted twin; an
    # eager twin is a different program, not a reference.  (Round-5
    # attribution; second CPU-emulation artifact after the 2^24 one.)
    ref = jax.jit(lambda xx: _xla_int8_chain(xx, pkgs, act))(x)

    got = resblock_chain_int8(
        x,
        jnp.stack([jnp.asarray(p1["wq"]).reshape(ci, cm)
                   for p1, _ in pkgs]),
        jnp.asarray(b1),
        jnp.stack([jnp.asarray(p2["wq"]) for _, p2 in pkgs]),
        jnp.asarray(b2),
        jnp.stack([jnp.asarray(p1["scale"]) for p1, _ in pkgs]),
        jnp.stack([jnp.asarray(p2["scale"]) for _, p2 in pkgs]),
        jnp.stack([jnp.asarray([p1["xinv"], p2["xinv"]])
                   for p1, p2 in pkgs]),
        act=act, interpret=True)
    # identical quantized MACs; f32 glue reassociates within each conv
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32),
        rtol=3e-2, atol=3e-2)


def test_plan_chain_schedule_splits_and_refuses():
    # v3-416 52x52 stage: all 8 blocks should fit in at most a few calls
    sched = plan_chain_schedule(8, 52, 52, 256, 128, 8, False)
    assert sched is not None
    g, per_call, chunk = sched
    assert 8 % g == 0 and sum(per_call) == 8 and 52 % chunk == 0
    # int8 fits at least as long a chain as bf16 (weights halve)
    s8 = plan_chain_schedule(8, 52, 52, 256, 128, 8, True)
    assert s8 is not None and max(s8[1]) >= max(per_call)
    # absurd geometry: nothing fits -> None (caller falls back to XLA)
    assert plan_chain_schedule(1, 512, 512, 2048, 1024, 1, False) is None


TOY_CFG = """
[net]
width=64
height=64
channels=3

[convolutional]
batch_normalize=1
filters=128
size=3
stride=2
pad=1
activation=leaky

[convolutional]
batch_normalize=1
filters=128
size=1
stride=1
pad=1
activation=leaky

[convolutional]
batch_normalize=1
filters=128
size=3
stride=1
pad=1
activation=leaky

[shortcut]
from=-3
activation=linear

[convolutional]
batch_normalize=1
filters=128
size=1
stride=1
pad=1
activation=leaky

[convolutional]
batch_normalize=1
filters=128
size=3
stride=1
pad=1
activation=leaky

[shortcut]
from=-3
activation=linear

[convolutional]
filters=24
size=1
stride=1
pad=1
activation=linear

[yolo]
mask=0,1,2
anchors=10,13, 16,30, 33,23
classes=3
num=3
jitter=.3
ignore_thresh=.7
truth_thresh=1
random=1
"""


def _parse_text(text):
    import tempfile

    with tempfile.NamedTemporaryFile("w", suffix=".cfg", delete=False) as f:
        f.write(text)
        path = f.name
    return parse_model_config(path)


def _toy_net():
    plan = build_network(_parse_text(TOY_CFG))
    rng = np.random.default_rng(3)
    params = {}
    for i, d in enumerate(plan.defs()):
        if d["type"] != "convolutional":
            continue
        k = int(d["size"])
        co = int(d["filters"])
        ci = 3 if i == 0 else 128
        params[i] = {
            "w": (rng.standard_normal((k, k, ci, co), np.float32)
                  / np.sqrt(k * k * ci)).astype(np.float32),
            "b": rng.standard_normal((co,), np.float32) * 0.1,
        }
    return plan, params


def test_find_spans_toy_and_yolov3():
    plan, _ = _toy_net()
    chains = find_residual_spans(plan)
    # two consecutive spans (start 1 and 4) merge into one chain
    assert chains == [(1, 4)]

    import os
    cfg = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "config", "yolov3.cfg")
    if os.path.exists(cfg):
        from yolo_deepsort_tpu.cfg.parse import parse_model_config

        p3 = build_network(parse_model_config(cfg), img_size=416)
        chains3 = find_residual_spans(p3)
        spans = [s for c in chains3 for s in c]
        # darknet-53 has 23 residual blocks; stage-end shortcuts feed
        # routes (layers 36, 61) so those spans must still be discovered
        # (the ROUTE references the shortcut output, not the conv mids)
        assert len(spans) == 23
        defs = p3.defs()
        for c in chains3:
            for s in c:
                assert defs[s + 2]["type"] == "shortcut"
        # chain lengths per stage: 1, 2, 8, 8, 4
        assert sorted(len(c) for c in chains3) == [1, 2, 4, 8, 8]
        assert sum(len(c) for c in chains3) == 23


def test_block_impl_network_apply_parity():
    plan, params = _toy_net()
    x = np.random.default_rng(5).random((2, 64, 64, 3), np.float32)
    ref = network_apply(plan, params, jnp.asarray(x),
                        compute_dtype=jnp.bfloat16)
    impl = make_resblock_impl(plan, interpret=True)
    got = network_apply(plan, params, jnp.asarray(x),
                        compute_dtype=jnp.bfloat16, block_impl=impl)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32),
        rtol=4e-2, atol=4e-2)


def test_block_impl_refuses_oversize_and_unlisted():
    plan, params = _toy_net()
    impl = make_resblock_impl(plan, max_hw=16, interpret=True)
    x = jnp.zeros((2, 32, 32, 128), jnp.bfloat16)  # 32 > max_hw
    assert impl(x, params, 1) is None
    impl2 = make_resblock_impl(plan, chain_whitelist=frozenset(),
                               interpret=True)
    assert impl2(jnp.zeros((2, 32, 32, 128), jnp.bfloat16), params, 1) is None
    # non-span start indices are never claimed
    impl3 = make_resblock_impl(plan, interpret=True)
    assert impl3(x, params, 0) is None
