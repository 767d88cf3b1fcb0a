"""Honest-load machinery of the headline bench (bench.py): the planted
box-geometry prior must make the live decode emit exactly person-sized
boxes (the property the crop-window selection and the load's realism rest
on)."""

import numpy as np

from bench import BOX_PRIOR_ASPECT, BOX_PRIOR_HEIGHTS, plant_box_prior


def test_plant_box_prior_decodes_target_sizes():
    import jax.numpy as jnp

    from yolo_deepsort_tpu.cfg.architectures import ARCHITECTURES
    from yolo_deepsort_tpu.models import weights as W
    from yolo_deepsort_tpu.models.darknet import build_network, network_apply

    size, frame_hw = 96, (270, 480)  # 1080p/4 geometry
    plan = build_network(ARCHITECTURES["yolov3-tiny"](img_size=size))
    raw = W.random_raw_params(plan.defs(), seed=0)
    before = {i: np.array(raw[i]["conv_bias"]) for i in raw
              if "conv_bias" in raw[i]}
    raw = plant_box_prior(raw, plan, frame_hw)

    # only the yolo-head tw/th channels moved; everything else untouched
    head_convs = {h.module_index - 1 for h in plan.heads}
    for i, old in before.items():
        if i not in head_convs:
            np.testing.assert_array_equal(old, raw[i]["conv_bias"])

    params = W.fold_inference_params(raw, plan.defs())
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.random((1, size, size, 3), np.float32))
    decoded = np.asarray(network_apply(plan, params, x))  # (1, N, 85)

    # with the tw/th weight rows zeroed the decode emits EXACT target
    # sizes per anchor; check every head/anchor block against its rung
    scale = size / max(frame_hw) * (frame_hw[0] / 1080.0)
    for g, head in enumerate(plan.heads):
        for a, _ in enumerate(head.anchors):
            h_t = BOX_PRIOR_HEIGHTS[(3 * g + a) % len(BOX_PRIOR_HEIGHTS)]
            w_t = BOX_PRIOR_ASPECT * h_t * scale
            h_t = h_t * scale
            # this anchor's boxes all share the identical target (w, h)
            ws = decoded[0, :, 2]
            hs = decoded[0, :, 3]
            match = (np.abs(ws - w_t) < 0.05 * w_t) & (
                np.abs(hs - h_t) < 0.05 * h_t
            )
            assert match.any(), (g, a, w_t, h_t)
    # and nothing decodes frame-sized: all boxes stay in the person range
    max_h_lb = max(BOX_PRIOR_HEIGHTS) * scale
    assert decoded[0, :, 3].max() <= max_h_lb * 1.05
