"""YOLO training loss in JAX (fixed-shape masked targets).

Contract: SURVEY.md Appendix C training branch (reference: yolo3/models.py
YOLOLayer training path + utils.py build_targets:~300).
Oracle: specs/yolo_loss_np.py.

Targets are (MAX_TARGETS, 6) rows [batch_idx, class, cx, cy, w, h]
(normalized boxes) with a validity mask -- the reference's variable-length
target list becomes masked scatters with out-of-bounds drops.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp

OBJ_SCALE = 1.0
NOOBJ_SCALE = 100.0


def _bce(pred, tgt, eps=1e-12):
    pred = jnp.clip(pred, eps, 1 - eps)
    return -(tgt * jnp.log(pred) + (1 - tgt) * jnp.log(1 - pred))


def _masked_mean(values, mask):
    s = jnp.sum(values * mask)
    n = jnp.sum(mask)
    return jnp.where(n > 0, s / jnp.maximum(n, 1), 0.0)


def yolo_head_loss(
    raw_nhwc: jnp.ndarray,  # (B, G, G, A*(5+C)) raw head map
    targets: jnp.ndarray,  # (MAX_T, 6) [b, cls, cx, cy, w, h] normalized
    target_mask: jnp.ndarray,  # (MAX_T,) bool
    anchors_px: Sequence[Tuple[float, float]],
    num_classes: int,
    img_dim: int,
    ignore_thres: float = 0.5,
    box_loss: str = "mse",
):
    nB, g, _, ch = raw_nhwc.shape
    nA = len(anchors_px)
    nC = num_classes
    stride = img_dim / g
    pred = raw_nhwc.reshape(nB, g, g, nA, 5 + nC).transpose(0, 3, 1, 2, 4)

    x = jax_sigmoid(pred[..., 0])
    y = jax_sigmoid(pred[..., 1])
    w = pred[..., 2]
    h = pred[..., 3]
    conf = jax_sigmoid(pred[..., 4])
    cls = jax_sigmoid(pred[..., 5:])

    anchors_g = jnp.asarray(anchors_px, jnp.float32) / stride  # (A, 2)

    # ---- build_targets, fixed shape
    tb = targets[:, 0].astype(jnp.int32)
    tlab = targets[:, 1].astype(jnp.int32)
    gxy = targets[:, 2:4] * g
    gwh = targets[:, 4:6] * g
    gi = jnp.clip(gxy[:, 0].astype(jnp.int32), 0, g - 1)
    gj = jnp.clip(gxy[:, 1].astype(jnp.int32), 0, g - 1)

    # anchor-wh IoU: (A, MAX_T)
    inter = jnp.minimum(anchors_g[:, 0:1], gwh[None, :, 0]) * jnp.minimum(
        anchors_g[:, 1:2], gwh[None, :, 1]
    )
    union = (
        anchors_g[:, 0:1] * anchors_g[:, 1:2]
        + gwh[None, :, 0] * gwh[None, :, 1]
        - inter
    )
    ious = inter / (union + 1e-16)
    best_n = jnp.argmax(ious, axis=0)  # (MAX_T,)

    nb_idx = jnp.where(target_mask, tb, nB)  # OOB drop for padded rows
    shape4 = (nB, nA, g, g)
    obj_mask = (
        jnp.zeros(shape4, bool).at[nb_idx, best_n, gj, gi].set(True, mode="drop")
    )
    noobj_mask = (
        jnp.ones(shape4, bool).at[nb_idx, best_n, gj, gi].set(False, mode="drop")
    )
    # ignore non-best anchors with IoU > thres for the noobj loss
    over = (ious > ignore_thres) & target_mask[None, :]  # (A, MAX_T)
    a_idx = jnp.broadcast_to(jnp.arange(nA)[:, None], over.shape)
    b_over = jnp.where(over, jnp.broadcast_to(nb_idx[None, :], over.shape), nB)
    noobj_mask = noobj_mask.at[
        b_over, a_idx, jnp.broadcast_to(gj[None, :], over.shape),
        jnp.broadcast_to(gi[None, :], over.shape)
    ].set(False, mode="drop")

    def scatter(vals):
        return (
            jnp.zeros(shape4, jnp.float32)
            .at[nb_idx, best_n, gj, gi]
            .set(vals, mode="drop")
        )

    tx = scatter(gxy[:, 0] - jnp.floor(gxy[:, 0]))
    ty = scatter(gxy[:, 1] - jnp.floor(gxy[:, 1]))
    tw = scatter(jnp.log(gwh[:, 0] / anchors_g[best_n, 0] + 1e-16))
    th = scatter(jnp.log(gwh[:, 1] / anchors_g[best_n, 1] + 1e-16))
    tcls = (
        jnp.zeros(shape4 + (nC,), jnp.float32)
        .at[nb_idx, best_n, gj, gi, tlab]
        .set(1.0, mode="drop")
    )
    tconf = obj_mask.astype(jnp.float32)

    obj_f = obj_mask.astype(jnp.float32)
    noobj_f = noobj_mask.astype(jnp.float32)
    if box_loss == "ciou":
        # YOLOv4's Complete-IoU box regression (Zheng et al. 2020): IoU
        # term + normalized center distance + aspect-consistency penalty.
        # The reference lineage trains with per-coordinate MSE; this is the
        # yolov4-paper upgrade, opt-in via --box-loss ciou.
        tgw = scatter(gwh[:, 0])
        tgh = scatter(gwh[:, 1])
        # clip raw wh logits: non-obj cells still flow through the masked
        # mean multiplied by 0, and exp overflow there would poison it
        # with inf*0=nan
        pw = anchors_g[None, :, None, None, 0] * jnp.exp(jnp.clip(w, -20, 20))
        ph = anchors_g[None, :, None, None, 1] * jnp.exp(jnp.clip(h, -20, 20))
        eps = 1e-9
        # same-cell origin: center offsets compare directly (grid units)
        inter_w = jnp.maximum(
            jnp.minimum(x + pw / 2, tx + tgw / 2)
            - jnp.maximum(x - pw / 2, tx - tgw / 2), 0.0)
        inter_h = jnp.maximum(
            jnp.minimum(y + ph / 2, ty + tgh / 2)
            - jnp.maximum(y - ph / 2, ty - tgh / 2), 0.0)
        inter = inter_w * inter_h
        union = pw * ph + tgw * tgh - inter + eps
        iou_b = inter / union
        rho2 = (x - tx) ** 2 + (y - ty) ** 2
        cw = (jnp.maximum(x + pw / 2, tx + tgw / 2)
              - jnp.minimum(x - pw / 2, tx - tgw / 2))
        chh = (jnp.maximum(y + ph / 2, ty + tgh / 2)
               - jnp.minimum(y - ph / 2, ty - tgh / 2))
        c2 = cw ** 2 + chh ** 2 + eps
        vv = (4.0 / jnp.pi ** 2) * (
            jnp.arctan(tgw / (tgh + eps)) - jnp.arctan(pw / (ph + eps))
        ) ** 2
        import jax.lax as _lax

        alpha = _lax.stop_gradient(vv / (1.0 - iou_b + vv + eps))
        ciou = iou_b - rho2 / c2 - alpha * vv
        loss_box = _masked_mean(1.0 - ciou, obj_f)
        loss_x = loss_y = loss_w = loss_h = loss_box / 4.0  # metric split
    else:
        loss_x = _masked_mean((x - tx) ** 2, obj_f)
        loss_y = _masked_mean((y - ty) ** 2, obj_f)
        loss_w = _masked_mean((w - tw) ** 2, obj_f)
        loss_h = _masked_mean((h - th) ** 2, obj_f)
    loss_conf_obj = _masked_mean(_bce(conf, tconf), obj_f)
    loss_conf_noobj = _masked_mean(_bce(conf, tconf), noobj_f)
    # reference: BCE over class vector averaged over all obj cells and classes
    loss_cls = _masked_mean(jnp.mean(_bce(cls, tcls), axis=-1), obj_f)
    loss_conf = OBJ_SCALE * loss_conf_obj + NOOBJ_SCALE * loss_conf_noobj
    total = loss_x + loss_y + loss_w + loss_h + loss_conf + loss_cls
    metrics = {
        "loss_x": loss_x, "loss_y": loss_y, "loss_w": loss_w, "loss_h": loss_h,
        "loss_conf": loss_conf, "loss_cls": loss_cls,
    }
    return total, metrics


def jax_sigmoid(v):
    return 1.0 / (1.0 + jnp.exp(-v))


def yolo_loss(
    plan,
    raw_maps: Sequence[jnp.ndarray],
    targets: jnp.ndarray,
    target_mask: jnp.ndarray,
    ignore_thres: float = 0.5,
    box_loss: str = "mse",
):
    """Total loss over all heads of a network plan (models.py Darknet.forward
    training: sum of per-head losses). ``raw_maps`` from
    network_apply(..., return_feature_maps=True). ``box_loss``: "mse"
    (reference lineage) or "ciou" (yolov4-paper box regression)."""
    total = 0.0
    metrics = {}
    for spec, raw in zip(plan.heads, raw_maps):
        t, m = yolo_head_loss(
            raw, targets, target_mask, spec.anchors, spec.num_classes,
            plan.img_size, ignore_thres, box_loss=box_loss,
        )
        total = total + t
        for k, v in m.items():
            metrics[k] = metrics.get(k, 0.0) + v
    return total, metrics
