"""YOLO training loss: JAX masked version vs the numpy oracle."""

import numpy as np
import pytest

from specs.yolo_loss_np import yolo_head_loss as loss_np
from yolo_deepsort_tpu.train.yolo_loss import yolo_head_loss as loss_jax

ANCHORS = [(16.0, 32.0), (32.0, 16.0), (48.0, 48.0)]


def make_case(seed, n_targets, nB=2, g=8, nC=4, img=128):
    rng = np.random.default_rng(seed)
    raw = rng.normal(0, 1, (nB, len(ANCHORS) * (5 + nC), g, g)).astype(np.float32)
    targets = []
    used = set()
    while len(targets) < n_targets:
        b = rng.integers(0, nB)
        cx, cy = rng.uniform(0.05, 0.95, 2)
        cell = (b, int(cx * g), int(cy * g))
        if cell in used:  # avoid duplicate-cell scatter-order ambiguity
            continue
        used.add(cell)
        targets.append([b, rng.integers(0, nC), cx, cy,
                        rng.uniform(0.05, 0.4), rng.uniform(0.05, 0.4)])
    return raw, np.array(targets, np.float64).reshape(-1, 6), g, nC, img


@pytest.mark.parametrize("seed,n_targets", [(0, 5), (1, 1), (2, 12), (3, 0)])
def test_head_loss_matches_oracle(seed, n_targets):
    raw, targets, g, nC, img = make_case(seed, n_targets)
    total_o, metrics_o = loss_np(
        raw.astype(np.float64), targets, ANCHORS, nC, img
    )
    # jax takes NHWC raw + padded targets
    raw_nhwc = raw.transpose(0, 2, 3, 1)
    max_t = 16
    tpad = np.zeros((max_t, 6), np.float32)
    tmask = np.zeros((max_t,), bool)
    tpad[: len(targets)] = targets
    tmask[: len(targets)] = True
    total_j, metrics_j = loss_jax(raw_nhwc, tpad, tmask, ANCHORS, nC, img)
    assert float(total_j) == pytest.approx(total_o, rel=2e-4, abs=1e-5)
    for k in ("loss_x", "loss_y", "loss_w", "loss_h", "loss_conf", "loss_cls"):
        assert float(metrics_j[k]) == pytest.approx(
            metrics_o[k], rel=2e-3, abs=1e-5
        ), k


def test_loss_is_differentiable():
    import jax

    raw, targets, g, nC, img = make_case(7, 4)
    raw_nhwc = raw.transpose(0, 2, 3, 1)
    tpad = np.zeros((8, 6), np.float32)
    tmask = np.zeros((8,), bool)
    tpad[: len(targets)] = targets
    tmask[: len(targets)] = True

    def f(r):
        return loss_jax(r, tpad, tmask, ANCHORS, nC, img)[0]

    grad = jax.grad(f)(raw_nhwc)
    assert np.isfinite(np.asarray(grad)).all()
    assert float(np.abs(np.asarray(grad)).max()) > 0


def test_full_net_loss_runs():
    import jax.numpy as jnp

    from yolo_deepsort_tpu.cfg import yolov3_tiny
    from yolo_deepsort_tpu.models import weights as W
    from yolo_deepsort_tpu.models.darknet import build_network, network_apply
    from yolo_deepsort_tpu.train.yolo_loss import yolo_loss

    plan = build_network(yolov3_tiny(num_classes=4, img_size=64))
    params = W.fold_inference_params(
        W.random_raw_params(plan.defs(), seed=0), plan.defs()
    )
    x = np.random.default_rng(0).uniform(0, 1, (2, 64, 64, 3)).astype(np.float32)
    _, raw_maps = network_apply(plan, params, x, return_feature_maps=True)
    tpad = np.array([[0, 1, 0.5, 0.5, 0.2, 0.3]], np.float32)
    tpad = np.concatenate([tpad, np.zeros((7, 6), np.float32)])
    tmask = np.array([True] + [False] * 7)
    total, metrics = yolo_loss(plan, raw_maps, tpad, tmask)
    assert np.isfinite(float(total))


def test_ciou_box_loss_properties():
    """CIoU option: zero for a perfect prediction, positive and decreasing
    under gradient steps, finite at garbage non-obj cells."""
    import jax
    import jax.numpy as jnp

    from yolo_deepsort_tpu.train.yolo_loss import yolo_head_loss

    rng = np.random.default_rng(0)
    nB, g, nC, img = 2, 8, 4, 128
    targets = np.array([[0, 1, 0.53, 0.47, 0.25, 0.3],
                        [1, 2, 0.22, 0.81, 0.1, 0.15]], np.float32)
    tmask = np.ones(2, bool)

    # craft a raw map whose decoded box EXACTLY matches target 0's cell
    raw = rng.normal(0, 3, (nB, g, g, 3 * (5 + nC))).astype(np.float32)

    def sigmoid_inv(p):
        return np.log(p / (1 - p))

    stride = img / g
    anchors = np.asarray(ANCHORS, np.float32)
    for b, cls_, cx, cy, w, h in targets:
        gx, gy = cx * g, cy * g
        gi, gj = int(gx), int(gy)
        gwn, ghn = w * g, h * g
        ious = (np.minimum(anchors[:, 0] / stride, gwn)
                * np.minimum(anchors[:, 1] / stride, ghn))
        ious /= (anchors[:, 0] / stride * anchors[:, 1] / stride
                 + gwn * ghn - ious)
        a = int(np.argmax(ious))
        base = a * (5 + nC)
        raw[int(b), gj, gi, base + 0] = sigmoid_inv(np.clip(gx - gi, 1e-3, 1 - 1e-3))
        raw[int(b), gj, gi, base + 1] = sigmoid_inv(np.clip(gy - gj, 1e-3, 1 - 1e-3))
        raw[int(b), gj, gi, base + 2] = np.log(gwn / (anchors[a, 0] / stride))
        raw[int(b), gj, gi, base + 3] = np.log(ghn / (anchors[a, 1] / stride))

    total, m = yolo_head_loss(jnp.asarray(raw), jnp.asarray(targets),
                              jnp.asarray(tmask), ANCHORS, nC, img,
                              box_loss="ciou")
    box = float(m["loss_x"] + m["loss_y"] + m["loss_w"] + m["loss_h"])
    assert np.isfinite(float(total))
    assert box < 1e-4, box  # perfect boxes: CIoU loss ~ 0

    # gradient descent on a perturbed map must reduce the box term
    raw2 = raw.copy()
    raw2 += rng.normal(0, 0.5, raw.shape).astype(np.float32)

    def box_term(r):
        _, mm = yolo_head_loss(r, jnp.asarray(targets), jnp.asarray(tmask),
                               ANCHORS, nC, img, box_loss="ciou")
        return mm["loss_x"] + mm["loss_y"] + mm["loss_w"] + mm["loss_h"]

    gfn = jax.jit(jax.value_and_grad(box_term))
    r = jnp.asarray(raw2)
    v0, _ = gfn(r)
    for _ in range(25):
        v, grad = gfn(r)
        assert np.isfinite(float(v))
        r = r - 0.5 * grad
    vN, _ = gfn(r)
    assert float(vN) < float(v0) * 0.5, (float(v0), float(vN))
