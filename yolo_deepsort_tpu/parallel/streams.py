"""Stream-parallel tracking: batch many video streams on one chip (vmap) and
shard the stream axis across a device mesh (SURVEY.md section 2.2: the
reference has NO parallelism; the TPU-native scale-out story is
stream-data-parallel execution with an optional all-gathered cross-camera
ReID gallery, section 5.8)."""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import DetectorConfig, TrackerConfig
from ..models.darknet import NetworkPlan, network_apply
from ..models.reid import reid_apply
from ..ops.crops import (
    crop_and_normalize,
    crop_and_normalize_windowed,
    crop_window_bounds,
)
from ..ops.letterbox import letterbox, rescale_boxes
from ..ops.pallas_letterbox import pallas_letterbox_batch
from ..ops.nms import batched_nms, batched_nms_with_stats
from ..tracking.tracker import init_tracker_state, tracker_step
from ..tracking.tracker_pallas import (
    tracker_step_fused_batched,
    use_fused_tracker_default,
)


def _resolve_fused_tracker(use_fused_tracker, trk_cfg) -> bool:
    """None = auto by backend; the megakernel also requires max_tracks % 8."""
    if use_fused_tracker is None:
        use_fused_tracker = use_fused_tracker_default()
    return bool(use_fused_tracker) and trk_cfg.max_tracks % 8 == 0


def make_stream_mesh(n_devices: Optional[int] = None, axis: str = "stream") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis,))


def _make_conv_impl(use_pallas_conv, backbone_int8_pkg):
    """Resolve the backbone conv route for the serving steps.

    use_pallas_conv: False (XLA convs) | True (Pallas MXU kernel, TPU) |
    "interpret" (Pallas kernel, interpret mode -- CPU tests) | "xla-twin"
    (the arithmetically-identical XLA int8 route,
    models/quantize_darknet.make_xla_int8_conv_impl -- fast on CPU, used by
    the accuracy/consistency gates; requires backbone_int8_pkg) | a dict
    {"bf16": frozenset, "int8": frozenset} from
    ops/pallas_conv.load_conv_whitelist (autotuned per-layer routing:
    only whitelisted layers leave XLA; int8 layers additionally need
    their entry in backbone_int8_pkg, else they run the bf16 kernel)."""
    if not use_pallas_conv:
        return None
    if isinstance(use_pallas_conv, dict):
        from ..ops.pallas_conv import make_backbone_conv_impl

        wl = (frozenset(use_pallas_conv.get("bf16", ()))
              | frozenset(use_pallas_conv.get("int8", ())))
        return make_backbone_conv_impl(
            interpret=bool(use_pallas_conv.get("interpret", False)),
            layer_whitelist=wl, int8_pkg=backbone_int8_pkg)
    if use_pallas_conv == "xla-twin":
        if backbone_int8_pkg is None:
            raise ValueError("xla-twin conv route requires backbone_int8_pkg")
        from ..models.quantize_darknet import make_xla_int8_conv_impl

        return make_xla_int8_conv_impl(backbone_int8_pkg)
    from ..ops.pallas_conv import make_backbone_conv_impl

    return make_backbone_conv_impl(
        interpret=use_pallas_conv == "interpret",
        int8_pkg=backbone_int8_pkg)


def _make_block_impl(plan, use_resblock, backbone_int8_pkg):
    """Resolve the fused residual-block-chain route (ops/pallas_resblock.py).

    use_resblock: False (off) | True (bf16 chains) | "int8" (W8A8 chains
    for blocks whose BOTH convs are in backbone_int8_pkg; bf16 otherwise) |
    "interpret" (CPU tests) | a dict {"chains": [start indices], "int8":
    bool, "interpret": bool} for per-chain A/B attribution.  Composable
    with a conv_impl: network_apply consults block_impl first (claims
    whole residual spans), the conv route sees the remaining layers."""
    if not use_resblock:
        return None
    from ..ops.pallas_resblock import make_resblock_impl

    if isinstance(use_resblock, dict):
        wl = use_resblock.get("chains")
        return make_resblock_impl(
            plan,
            int8_pkg=(backbone_int8_pkg if use_resblock.get("int8")
                      else None),
            interpret=bool(use_resblock.get("interpret", False)),
            chain_whitelist=None if wl is None else frozenset(wl))
    if use_resblock == "int8" and backbone_int8_pkg is None:
        raise ValueError("int8 resblock route requires backbone_int8_pkg")
    return make_resblock_impl(
        plan,
        int8_pkg=backbone_int8_pkg if use_resblock == "int8" else None,
        interpret=use_resblock == "interpret")


def fused_frame_step(
    plan: NetworkPlan,
    det_cfg: DetectorConfig,
    trk_cfg: TrackerConfig,
    frame_hw: Tuple[int, int],
    det_params,
    reid_params,
    state,
    frame_rgb,  # (H, W, 3) uint8
    tracked_class_ids=None,  # optional (K,) int32
    compute_dtype=jnp.float32,
    letterboxed=None,  # optional precomputed (size, size, 3) input
    decoded=None,  # optional precomputed (N, 5+C) network output
    return_dets=False,  # True: skip the tracker, return (tlwh, conf, feats, mask)
):
    """One stream, one frame: letterbox -> detect -> NMS -> rescale -> crop ->
    embed -> associate. Pure function of fixed shapes; vmap over streams.
    ``letterboxed`` lets callers substitute a fused Pallas-preprocessed input
    (the Pallas kernel batches internally and cannot live under this vmap);
    ``decoded`` additionally skips the backbone (callers that route convs
    through the Pallas MXU kernel run network_apply at full stream batch
    outside the vmap, ops/pallas_conv.py)."""
    h, w = frame_hw
    size = det_cfg.img_size
    if decoded is not None:
        decoded = decoded[None] if decoded.ndim == 2 else decoded
    else:
        if letterboxed is not None:
            x = letterboxed[None]
        else:
            x = letterbox(frame_rgb, size)[None]
        decoded = network_apply(plan, det_params, x,
                                compute_dtype=compute_dtype)
    boxes7, mask = batched_nms(
        decoded, det_cfg.conf_thres, det_cfg.nms_thres, det_cfg.max_boxes,
        trk_cfg.max_dets,
    )
    boxes7, mask = boxes7[0], mask[0]
    xyxy = rescale_boxes(boxes7[:, :4], size, h, w)
    if tracked_class_ids is not None:
        mask = mask & jnp.isin(
            boxes7[:, 6].astype(jnp.int32), jnp.asarray(tracked_class_ids)
        )
    x1 = jnp.clip(xyxy[:, 0], 0, w - 1)
    y1 = jnp.clip(xyxy[:, 1], 0, h - 1)
    x2 = jnp.clip(xyxy[:, 2], 0, w - 1)
    y2 = jnp.clip(xyxy[:, 3], 0, h - 1)
    tlwh = jnp.stack([x1, y1, x2 - x1, y2 - y1], axis=1)
    if return_dets == "boxes":
        # boxes only: the caller runs crops/embed at batch level (the
        # low-latency capped/windowed path) before the batched tracker
        return tlwh, boxes7[:, 5], mask, jnp.stack([x1, y1, x2, y2], axis=1)
    crops = crop_and_normalize(
        frame_rgb, jnp.stack([x1, y1, x2, y2], axis=1),
        compute_dtype=compute_dtype,
    )
    feats = reid_apply(reid_params, crops, compute_dtype=compute_dtype)
    if return_dets:
        # stateless half only: callers run the BATCHED fused tracker
        # megakernel outside this per-stream vmap
        return tlwh, boxes7[:, 5], feats, mask
    img_hw = jnp.array([h, w], jnp.int32)
    state, outputs, emit = tracker_step(
        trk_cfg, state, tlwh, boxes7[:, 5], feats, mask, img_hw
    )
    return state, (outputs, emit)


def make_batched_step(
    plan: NetworkPlan,
    det_cfg: DetectorConfig,
    trk_cfg: TrackerConfig,
    frame_hw: Tuple[int, int],
    tracked_class_ids=None,
    compute_dtype=jnp.float32,
    donate_state: bool = True,
    with_validity: bool = False,
    use_pallas_letterbox: bool = False,
    use_fused_tracker=None,  # None = auto by backend (tracker megakernel)
    cap: Optional[int] = None,  # slice post-NMS dets to top-``cap`` by score
    crop_window: Optional[Tuple[int, int]] = None,  # windowed ReID crops
    embed_int8=False,  # False | "resident" | "resident_pallas" (fused-
    #                    tracker path only; reid_params must be the
    #                    quantize_reid_params_resident package)
    use_pallas_conv=False,  # True | "interpret" | "xla-twin": backbone conv
    #                         route (see _make_conv_impl)
    backbone_int8_pkg=None,  # models.quantize_darknet package: W8A8 kernel
    #                          for packaged layers (requires use_pallas_conv)
    use_resblock=False,  # fused residual-block chains (_make_block_impl)
):
    """Multi-stream step: (det_params, reid_params, states, frames (S,H,W,3))
    -> (states, (outputs (S,T,5), emit (S,T))). Model params are broadcast;
    tracker state is per-stream (vmap axis 0).

    ``with_validity`` adds a (S,) bool ``frame_valid`` argument implementing
    per-stream failure isolation (SURVEY.md section 5.3): a stream whose
    decode failed this step keeps its tracker state UNCHANGED (no aging, no
    deletions -- the frame simply never happened) and emits nothing, while
    healthy streams proceed normally.

    Low-latency mode (fused-tracker path only): ``cap`` slices the post-NMS
    detections to the top-cap by score (NMS emits score-descending; same
    slicing as the bucketed stage, but STATIC -- a frame with > cap
    real detections drops its lowest-score ones), and ``crop_window`` routes
    ReID crops through the windowed resampler with an ON-DEVICE exactness
    guard: any consumed crop exceeding the window flips the whole batch to
    the dense path (lax.cond, no host readback). Measured K=1 device-side
    step latency 32.9 -> 28.2 ms at S=8x1080p (cap 40, window (320, 192));
    the remainder is backbone-at-batch-8 (~10 ms) plus fixed dispatch
    costs, not detection capacity (tools/bench_probes.py --probe
    k1-split)."""

    fused = _resolve_fused_tracker(use_fused_tracker, trk_cfg)
    h, w = frame_hw
    if cap is not None and not fused:
        raise ValueError("cap/crop_window need the fused-tracker path")
    if crop_window is not None:
        cw = (min(crop_window[0], h), min(crop_window[1], w))
        crop_window_eff = None if cw == (h, w) else cw
    else:
        crop_window_eff = None
    cfg_c = trk_cfg
    if cap is not None and cap < trk_cfg.max_dets:
        import dataclasses

        cfg_c = dataclasses.replace(trk_cfg, max_dets=cap)

    conv_impl = _make_conv_impl(use_pallas_conv, backbone_int8_pkg)
    block_impl = _make_block_impl(plan, use_resblock, backbone_int8_pkg)
    full_batch_backbone = conv_impl is not None or block_impl is not None

    def run(det_params, reid_params, states, frames):
        # cfg_c: NMS runs at the ``cap`` capacity directly -- it emits rows
        # score-descending into a contiguous prefix, so its first ``cap``
        # outputs are identical to running at max_dets and slicing, and the
        # while_loop does cap-many iterations instead of max_dets-many
        # (K=1 latency lever; non-fused paths have cfg_c == trk_cfg)
        fn = partial(
            fused_frame_step, plan, det_cfg, cfg_c, frame_hw,
            tracked_class_ids=tracked_class_ids, compute_dtype=compute_dtype,
            return_dets="boxes" if fused else False,
        )
        if use_pallas_letterbox:
            xs = pallas_letterbox_batch(frames, det_cfg.img_size)
        elif full_batch_backbone:
            xs = jax.vmap(lambda f: letterbox(f, det_cfg.img_size))(frames)
        else:
            xs = None
        if full_batch_backbone:
            # backbone at full stream batch OUTSIDE the per-stream vmap:
            # the Pallas kernels grid over the batch itself
            decoded_all = network_apply(
                plan, det_params, xs, compute_dtype=compute_dtype,
                conv_impl=conv_impl, block_impl=block_impl)
            out = jax.vmap(
                lambda st, fr, dec: fn(det_params, reid_params, st, fr,
                                       decoded=dec),
                in_axes=(None, 0, 0) if fused else (0, 0, 0),
            )(None if fused else states, frames, decoded_all)
        elif use_pallas_letterbox:
            out = jax.vmap(
                lambda st, fr, x: fn(det_params, reid_params, st, fr,
                                     letterboxed=x),
                in_axes=(None, 0, 0) if fused else (0, 0, 0),
            )(None if fused else states, frames, xs)
        else:
            out = jax.vmap(
                lambda st, fr: fn(det_params, reid_params, st, fr),
                in_axes=(None, 0) if fused else (0, 0),
            )(None if fused else states, frames)
        if not fused:
            return out
        tlwh, conf, mask, bxyxy = out
        d = cfg_c.max_dets
        tlwh, conf, mask, bxyxy = (
            tlwh[:, :d], conf[:, :d], mask[:, :d], bxyxy[:, :d])

        def dense(fr, bx):
            return jax.vmap(lambda f, b: crop_and_normalize(
                f, b, compute_dtype=compute_dtype))(fr, bx)

        if crop_window_eff is not None:
            wh, ww = crop_window_eff

            def windowed(fr, bx):
                return jax.vmap(lambda f, b: crop_and_normalize_windowed(
                    f, b, wh, ww, compute_dtype=compute_dtype))(fr, bx)

            # exactness guard ON DEVICE (no host readback in the latency
            # path): the windowed resampler is bit-identical to dense only
            # when every consumed crop fits the window, else fall back
            x1i, y1i, x2i, y2i = crop_window_bounds(bxyxy, h, w)
            fits = jnp.all(
                ~mask | (((y2i - y1i) <= wh) & ((x2i - x1i) <= ww)))
            crops = jax.lax.cond(fits, windowed, dense, frames, bxyxy)
        else:
            crops = dense(frames, bxyxy)
        s = crops.shape[0]
        if embed_int8 in ("resident", "resident_pallas"):
            from ..models.quantize import reid_apply_int8_resident

            feats = reid_apply_int8_resident(
                reid_params, crops.reshape(s * d, *crops.shape[2:]),
                use_pallas=embed_int8 == "resident_pallas",
            ).reshape(s, d, -1)
        else:
            feats = reid_apply(
                reid_params, crops.reshape(s * d, *crops.shape[2:]),
                compute_dtype=compute_dtype,
            ).reshape(s, d, -1)
        img_hw = jnp.array(frame_hw, jnp.int32)
        states, outputs, emit = tracker_step_fused_batched(
            cfg_c, states, tlwh, conf, feats, mask, img_hw
        )
        return states, (outputs, emit)

    if not with_validity:
        return jax.jit(run, donate_argnums=(2,) if donate_state else ())

    def step(det_params, reid_params, states, frames, frame_valid):
        new_states, (outputs, emit) = run(det_params, reid_params, states, frames)
        kept = jax.tree_util.tree_map(
            lambda new, old: jnp.where(
                frame_valid.reshape((-1,) + (1,) * (new.ndim - 1)), new, old
            ),
            new_states,
            states,
        )
        emit = emit & frame_valid[:, None]
        return kept, (outputs, emit)

    return jax.jit(step, donate_argnums=(2,) if donate_state else ())


def make_scanned_step(
    plan: NetworkPlan,
    det_cfg: DetectorConfig,
    trk_cfg: TrackerConfig,
    frame_hw: Tuple[int, int],
    n_frames: int,
    tracked_class_ids=None,
    compute_dtype=jnp.float32,
    donate_state: bool = True,
    use_pallas_letterbox: bool = False,
    use_fused_tracker=None,  # None = auto by backend (tracker megakernel)
):
    """Multi-frame multi-stream step over a chunk of ``n_frames`` frames per
    device dispatch.

    (det_params, reid_params, states, frames (K, S, H, W, 3)) ->
    (states, (outputs (K, S, T, 5), emit (K, S, T))). Identical math to
    calling the batched step K times, restructured for the hardware: the
    STATELESS stages (letterbox, backbone, NMS, crop, ReID embed) run as one
    K*S batch -- bigger convolutions, better MXU utilization -- and only the
    stateful tracker association scans sequentially over the K frames
    (SURVEY.md section 7 stage pipelining, at a K-frame latency cost)."""

    h, w = frame_hw
    size = det_cfg.img_size

    def step(det_params, reid_params, states, frames):
        k, s = frames.shape[0], frames.shape[1]
        flat = frames.reshape(k * s, h, w, 3)

        # ---- stateless stages, one big batch
        if use_pallas_letterbox:
            xs = pallas_letterbox_batch(flat, size)
        else:
            xs = jax.vmap(lambda f: letterbox(f, size))(flat)
        decoded = network_apply(
            plan, det_params, xs, compute_dtype=compute_dtype
        )
        boxes7, mask = batched_nms(
            decoded, det_cfg.conf_thres, det_cfg.nms_thres,
            det_cfg.max_boxes, trk_cfg.max_dets,
        )  # (K*S, D, 7)
        xyxy = jax.vmap(lambda b: rescale_boxes(b[:, :4], size, h, w))(boxes7)
        if tracked_class_ids is not None:
            mask = mask & jnp.isin(
                boxes7[..., 6].astype(jnp.int32), jnp.asarray(tracked_class_ids)
            )
        x1 = jnp.clip(xyxy[..., 0], 0, w - 1)
        y1 = jnp.clip(xyxy[..., 1], 0, h - 1)
        x2 = jnp.clip(xyxy[..., 2], 0, w - 1)
        y2 = jnp.clip(xyxy[..., 3], 0, h - 1)
        tlwh = jnp.stack([x1, y1, x2 - x1, y2 - y1], axis=-1)
        crops = jax.vmap(
            lambda f, b: crop_and_normalize(f, b, compute_dtype=compute_dtype)
        )(flat, jnp.stack([x1, y1, x2, y2], axis=-1))  # (K*S, D, 128, 64, 3)
        d = crops.shape[1]
        feats = reid_apply(
            reid_params, crops.reshape(k * s * d, *crops.shape[2:]),
            compute_dtype=compute_dtype,
        ).reshape(k * s, d, -1)

        # ---- stateful tracker, scanned over frames
        per_frame = lambda a: a.reshape(k, s, *a.shape[1:])
        img_hw = jnp.array([h, w], jnp.int32)

        if _resolve_fused_tracker(use_fused_tracker, trk_cfg):
            def scan_body(states, frame_data):
                tlwh_t, conf_t, feats_t, mask_t = frame_data
                states, outputs, emit = tracker_step_fused_batched(
                    trk_cfg, states, tlwh_t, conf_t, feats_t, mask_t, img_hw
                )
                return states, (outputs, emit)
        else:
            def scan_body(states, frame_data):
                tlwh_t, conf_t, feats_t, mask_t = frame_data
                states, outputs, emit = jax.vmap(
                    lambda st, t_, c_, f_, m_: tracker_step(
                        trk_cfg, st, t_, c_, f_, m_, img_hw
                    )
                )(states, tlwh_t, conf_t, feats_t, mask_t)
                return states, (outputs, emit)

        return jax.lax.scan(
            scan_body,
            states,
            (per_frame(tlwh), per_frame(boxes7[..., 5]), per_frame(feats),
             per_frame(mask)),
        )

    return jax.jit(step, donate_argnums=(2,) if donate_state else ())


def make_scanned_detect_stage(
    plan: NetworkPlan,
    det_cfg: DetectorConfig,
    trk_cfg: TrackerConfig,
    frame_hw: Tuple[int, int],
    compute_dtype=jnp.float32,
    use_pallas_letterbox: bool = False,
    use_pallas_conv=False,  # True | "interpret": route deep backbone convs
    #                         through the MXU Pallas kernel (ops/pallas_conv.py)
    backbone_int8_pkg=None,  # models.quantize_darknet package: W8A8 kernel
    #                          for packaged layers (requires use_pallas_conv;
    #                          gate with tools/int8_detect_gate.py first)
    use_resblock=False,  # fused residual-block chains (_make_block_impl)
    conf_thres_per_stream=None,  # optional (S,) overriding det_cfg.conf_thres
    tracked_class_ids=None,
):
    """Detection half of the bucketed scanned step: letterbox -> backbone ->
    NMS over the whole (K, S) chunk at FULL det capacity.

    Returns jitted (det_params, frames (K,S,H,W,3)) ->
    (boxes7 (K*S, D, 7), mask (K*S, D), stats (5,) int32) where stats =
    [max_count, max_crop_h, max_crop_w, nms_dropped_topk, nms_dropped_dets]
    over the chunk -- the one host readback that selects the downstream
    capacity bucket and crop window. The last two are saturation counters
    (no silent caps): detections above threshold that the NMS max_boxes
    top-k or max_dets output capacity dropped anywhere in the chunk.
    max_count is the largest per-frame detection count (NMS emits valid rows
    as a contiguous prefix -- ops/nms.py body writes slot i on iteration i --
    so any capacity >= max_count preserves every detection exactly);
    max_crop_h/w are the largest integer crop extents among rows that
    survive mask AND the tracked-class filter (only those rows' ReID
    features are ever consumed, so any crop window covering them keeps the
    windowed resampler exact, ops/crops.py)."""
    h, w = frame_hw
    size = det_cfg.img_size

    thr = (None if conf_thres_per_stream is None
           else np.asarray(conf_thres_per_stream, np.float32))

    conv_impl = _make_conv_impl(use_pallas_conv, backbone_int8_pkg)
    block_impl = _make_block_impl(plan, use_resblock, backbone_int8_pkg)

    def detect(det_params, frames):
        k, s = frames.shape[0], frames.shape[1]
        flat = frames.reshape(k * s, h, w, 3)
        if use_pallas_letterbox:
            xs = pallas_letterbox_batch(flat, size)
        else:
            xs = jax.vmap(lambda f: letterbox(f, size))(flat)
        decoded = network_apply(
            plan, det_params, xs, compute_dtype=compute_dtype,
            conv_impl=conv_impl, block_impl=block_impl,
        )
        conf = det_cfg.conf_thres if thr is None else jnp.tile(thr, k)
        boxes7, mask, nms_sat = batched_nms_with_stats(
            decoded, conf, det_cfg.nms_thres,
            det_cfg.max_boxes, trk_cfg.max_dets,
        )
        # pre-capacity survivor count: survivors the max_dets output had no
        # room for (nms_sat[:, 1]) count toward the bucket stat, so the
        # ladder's saturation counter can fire (a post-cap count could
        # never exceed buckets[-1] == max_dets)
        max_count = jnp.max(
            jnp.sum(mask, axis=-1) + nms_sat[:, 1]
        ).astype(jnp.int32)

        consumed = mask
        if tracked_class_ids is not None:
            consumed = consumed & jnp.isin(
                boxes7[..., 6].astype(jnp.int32), jnp.asarray(tracked_class_ids)
            )
        xyxy = jax.vmap(lambda b: rescale_boxes(b[:, :4], size, h, w))(boxes7)
        x1, y1, x2, y2 = crop_window_bounds(xyxy, h, w)
        ch = jnp.where(consumed, y2 - y1, 0)
        cw = jnp.where(consumed, x2 - x1, 0)
        stats = jnp.stack(
            [max_count, jnp.max(ch).astype(jnp.int32),
             jnp.max(cw).astype(jnp.int32),
             jnp.sum(nms_sat[:, 0]), jnp.sum(nms_sat[:, 1])]
        )
        return boxes7, mask, stats

    return jax.jit(detect)


def make_scanned_track_stage(
    det_cfg: DetectorConfig,
    trk_cfg: TrackerConfig,
    frame_hw: Tuple[int, int],
    cap: int,
    tracked_class_ids=None,
    compute_dtype=jnp.float32,
    donate_state: bool = True,
    crop_window: Optional[Tuple[int, int]] = None,
    use_pallas_crops: bool = False,
    use_fused_tracker=None,  # None = auto by backend (tracker megakernel)
    embed_int8=False,  # False | True (per-layer XLA W8A8) | "resident"
    #                    (int8-resident XLA twin) | "resident_pallas"
    #                    (fused Pallas int8 conv kernels, TPU)
):
    """Tracking half of the bucketed scanned step at detection capacity
    ``cap``: rescale -> crop -> ReID embed -> scanned tracker association,
    all shapes sliced to the first ``cap`` det slots. The ReID embed is the
    step's largest fixed cost (round-1 stage budget: 9.4 of 29.3 ms at
    cap=64); running it at the chunk's actual load is the bucketing win.

    ``crop_window`` (win_h, win_w) routes the ReID crop resampler through a
    fixed source window per box (ops/crops.py crop_and_normalize_windowed)
    instead of contracting the full frame -- exact as long as every
    CONSUMED detection's crop extent fits the window, which the caller
    guarantees from the detect stage's measured max (stats readback).

    Output shapes ((K,S,T,5), (K,S,T)) do not depend on ``cap``."""
    import dataclasses

    h, w = frame_hw
    size = det_cfg.img_size
    cfg_c = dataclasses.replace(trk_cfg, max_dets=cap)
    if crop_window is not None and (crop_window[0] >= h and crop_window[1] >= w):
        crop_window = None  # full-frame window degenerates to the dense path
    if use_pallas_crops and compute_dtype != jnp.bfloat16:
        # the Pallas crop kernel is fixed bf16; honoring any other
        # compute_dtype silently would hand the caller bf16 crops
        raise ValueError(
            "use_pallas_crops=True requires compute_dtype=bfloat16 "
            f"(got {jnp.dtype(compute_dtype).name}); use the XLA windowed "
            "path for other dtypes"
        )

    def track(reid_params, states, frames, boxes7, mask):
        k, s = frames.shape[0], frames.shape[1]
        flat = frames.reshape(k * s, h, w, 3)
        b7 = boxes7[:, :cap]
        m = mask[:, :cap]
        xyxy = jax.vmap(lambda b: rescale_boxes(b[:, :4], size, h, w))(b7)
        if tracked_class_ids is not None:
            m = m & jnp.isin(
                b7[..., 6].astype(jnp.int32), jnp.asarray(tracked_class_ids)
            )
        x1 = jnp.clip(xyxy[..., 0], 0, w - 1)
        y1 = jnp.clip(xyxy[..., 1], 0, h - 1)
        x2 = jnp.clip(xyxy[..., 2], 0, w - 1)
        y2 = jnp.clip(xyxy[..., 3], 0, h - 1)
        tlwh = jnp.stack([x1, y1, x2 - x1, y2 - y1], axis=-1)
        boxes_xyxy = jnp.stack([x1, y1, x2, y2], axis=-1)
        if crop_window is not None and use_pallas_crops:
            from ..ops.pallas_crops import pallas_crop_and_normalize_batch

            crops = pallas_crop_and_normalize_batch(
                flat, boxes_xyxy, crop_window[0], crop_window[1]
            )
        else:
            if crop_window is not None:
                wh, ww = crop_window
                crop_fn = lambda f, b: crop_and_normalize_windowed(
                    f, b, wh, ww, compute_dtype=compute_dtype
                )
            else:
                crop_fn = lambda f, b: crop_and_normalize(
                    f, b, compute_dtype=compute_dtype
                )
            crops = jax.vmap(crop_fn)(flat, boxes_xyxy)
        # (K*S, cap, 128, 64, 3)
        flat_crops = crops.reshape(k * s * cap, *crops.shape[2:])
        if embed_int8 in ("resident", "resident_pallas"):
            # reid_params is the resident quantized package from
            # models/quantize.quantize_reid_params_resident: int8
            # activations end-to-end through stages 2-4, fused Pallas
            # int8 convs on TPU (accuracy-gated by tools/int8_gate.py
            # int8_res rows)
            from ..models.quantize import reid_apply_int8_resident

            feats = reid_apply_int8_resident(
                reid_params, flat_crops,
                use_pallas=embed_int8 == "resident_pallas")
        elif embed_int8:
            # reid_params is the quantized package from
            # models/quantize.quantize_reid_params (accuracy-gated by
            # tools/int8_gate.py before this flag may ship)
            from ..models.quantize import reid_apply_int8

            feats = reid_apply_int8(reid_params, flat_crops)
        else:
            feats = reid_apply(reid_params, flat_crops,
                               compute_dtype=compute_dtype)
        feats = feats.reshape(k * s, cap, -1)

        per_frame = lambda a: a.reshape(k, s, *a.shape[1:])
        img_hw = jnp.array([h, w], jnp.int32)

        if _resolve_fused_tracker(use_fused_tracker, cfg_c):
            def scan_body(states, frame_data):
                tlwh_t, conf_t, feats_t, mask_t = frame_data
                states, outputs, emit = tracker_step_fused_batched(
                    cfg_c, states, tlwh_t, conf_t, feats_t, mask_t, img_hw
                )
                return states, (outputs, emit)
        else:
            def scan_body(states, frame_data):
                tlwh_t, conf_t, feats_t, mask_t = frame_data
                states, outputs, emit = jax.vmap(
                    lambda st, t_, c_, f_, m_: tracker_step(
                        cfg_c, st, t_, c_, f_, m_, img_hw
                    )
                )(states, tlwh_t, conf_t, feats_t, mask_t)
                return states, (outputs, emit)

        return jax.lax.scan(
            scan_body,
            states,
            (per_frame(tlwh), per_frame(b7[..., 5]), per_frame(feats),
             per_frame(m)),
        )

    return jax.jit(track, donate_argnums=(1,) if donate_state else ())


class BucketedScannedStep:
    """Drop-in replacement for make_scanned_step that sizes the post-NMS
    pipeline to the chunk's actual detection load.

    The fused step's crop/embed/associate stages otherwise run at worst-case
    MAX_DETS capacity on every chunk. Here detection runs first (full
    capacity), a single int32 readback exposes the chunk's max per-frame
    detection count, and the smallest compiled capacity bucket >= that count
    runs the rest. Exact-output property: NMS rows are a contiguous valid
    prefix, so slicing to any capacity >= the count keeps every detection,
    and tracker state layouts are capacity-independent -- states flow across
    buckets unchanged.

    The same readback also carries the chunk's max crop extents, which pick
    a ReID crop WINDOW from ``windows`` (smallest ladder entry covering
    every consumed detection's crop): the windowed resampler's compute and
    HBM traffic scale with the window instead of the full frame
    (ops/crops.py crop_and_normalize_windowed), and any window covering the
    measured max is exact. A chunk with one frame-sized box simply falls
    back to the dense full-frame path.

    One readback per K*S-frame chunk (~sub-ms vs a multi-hundred-ms chunk).
    Track-stage variants compile lazily per (bucket, window) and persist in
    the jit cache."""

    def __init__(
        self,
        plan: NetworkPlan,
        det_cfg: DetectorConfig,
        trk_cfg: TrackerConfig,
        frame_hw: Tuple[int, int],
        buckets: Tuple[int, ...] = (8, 16, 32),
        tracked_class_ids=None,
        compute_dtype=jnp.float32,
        donate_state: bool = True,
        use_pallas_letterbox: bool = False,
        conf_thres_per_stream=None,
        windows: Optional[Tuple[Tuple[int, int], ...]] = (
            (160, 96), (240, 128), (320, 192), (640, 384),
        ),
        use_pallas_crops: Optional[bool] = None,  # None = auto by backend
        embed_int8=False,  # False | "resident" | "resident_pallas": the
        #                    int8-resident ReID embed (reid_params must be
        #                    the quantize_reid_params_resident package)
        use_pallas_conv=False,  # True | "interpret": backbone convs through
        #                         the MXU Pallas kernel (ops/pallas_conv.py)
        backbone_int8_pkg=None,  # quantize_darknet package -> W8A8 kernel
        use_resblock=False,  # fused residual-block chains (_make_block_impl)
    ):
        h, w = frame_hw
        if use_pallas_crops is None:
            from ..ops.pallas_crops import use_pallas_crops_default

            use_pallas_crops = use_pallas_crops_default()
        self._detect = make_scanned_detect_stage(
            plan, det_cfg, trk_cfg, frame_hw, compute_dtype=compute_dtype,
            use_pallas_letterbox=use_pallas_letterbox,
            use_pallas_conv=use_pallas_conv,
            backbone_int8_pkg=backbone_int8_pkg,
            use_resblock=use_resblock,
            conf_thres_per_stream=conf_thres_per_stream,
            tracked_class_ids=tracked_class_ids,
        )
        self._buckets = tuple(sorted(
            {b for b in buckets if b < trk_cfg.max_dets} | {trk_cfg.max_dets}
        ))
        # window ladder, clamped to the frame; (h, w) = dense full-frame path
        ladder = [(min(wh, h), min(ww, w)) for wh, ww in (windows or ())]
        self._windows = tuple(sorted(set(ladder) | {(h, w)}))
        def _mk(cap, win, allow_pallas=True):
            # the Pallas crop kernel computes in bf16 (the production
            # dtype); f32-configured steps stay on the XLA windowed path so
            # compute_dtype is honored everywhere
            pallas_ok = False
            if (allow_pallas and use_pallas_crops and win is not None
                    and win != (h, w) and compute_dtype == jnp.bfloat16):
                from ..ops.pallas_crops import pallas_crops_supported

                pallas_ok = pallas_crops_supported(h, w, win[0], win[1])
            ei = embed_int8
            if ei == "resident_pallas" and not allow_pallas:
                ei = "resident"  # kernel-failure fallback keeps int8 route
            return make_scanned_track_stage(
                det_cfg, trk_cfg, frame_hw, cap,
                tracked_class_ids=tracked_class_ids,
                compute_dtype=compute_dtype, donate_state=donate_state,
                crop_window=win, use_pallas_crops=pallas_ok,
                use_fused_tracker=None if allow_pallas else False,
                embed_int8=ei,
            )

        self._mk = _mk
        self._track = {}
        self._compiled = set()  # (cap, win) variants that ran at least once
        self.last_bucket: Optional[int] = None
        self.last_max_count: Optional[int] = None
        self.last_window: Optional[Tuple[int, int]] = None
        self.last_crop_hw: Optional[Tuple[int, int]] = None
        # cumulative saturation counters (no silent caps)
        self.sat_nms_topk = 0    # dets lost to the NMS max_boxes top-k
        self.sat_nms_dets = 0    # dets lost to the max_dets output capacity
        self.sat_bucket_chunks = 0  # chunks whose count exceeded the ladder

    def saturation(self) -> dict:
        """Cumulative capacity-saturation counters; all-zero means the
        fixed capacities held every detection this step ever saw."""
        return {
            "sat_nms_topk": self.sat_nms_topk,
            "sat_nms_dets": self.sat_nms_dets,
            "sat_bucket_chunks": self.sat_bucket_chunks,
        }

    def _bucket_for(self, count: int) -> int:
        for b in self._buckets:
            if count <= b:
                return b
        return self._buckets[-1]

    def _window_for(self, max_h: int, max_w: int) -> Tuple[int, int]:
        for wh, ww in self._windows:
            if max_h <= wh and max_w <= ww:
                return (wh, ww)
        return self._windows[-1]

    def detect(self, det_params, frames):
        """Enqueue the detect stage; returns an opaque handle for track().
        Dispatching the NEXT chunk's detect before reading THIS chunk's
        stats hides the bucket-selection readback behind device work (the
        readback sync otherwise idles the chip for one host round-trip per
        chunk -- measured ~50 ms through the axon tunnel)."""
        boxes7, mask, stats = self._detect(det_params, frames)
        return (frames, boxes7, mask, stats)

    def track(self, reid_params, states, handle):
        """Finish a chunk started with detect(): reads the 5-int stats
        (max count, max crop extents, NMS saturation counters), picks the
        capacity bucket + crop window, runs the track stage."""
        frames, boxes7, mask, stats = handle
        count, max_h, max_w, drop_topk, drop_dets = (
            int(v) for v in np.asarray(stats))
        cap = self._bucket_for(count)
        win = self._window_for(max_h, max_w)
        self.last_bucket, self.last_max_count = cap, count
        self.last_window, self.last_crop_hw = win, (max_h, max_w)
        # no-silent-caps accounting (cumulative over the step's lifetime):
        # detections lost to the NMS max_boxes top-k / max_dets capacity,
        # plus chunks where the bucket ladder itself saturated (count
        # exceeded the largest bucket so the track stage truncated rows)
        self.sat_nms_topk += drop_topk
        self.sat_nms_dets += drop_dets
        if count > self._buckets[-1]:
            self.sat_bucket_chunks += 1
        fn = self._track.get((cap, win))
        if fn is None:
            fn = self._track[(cap, win)] = self._mk(cap, win)
        try:
            return fn(reid_params, states, frames, boxes7, mask)
        except Exception:
            # A (bucket, window) variant first selected after warmup
            # compiles lazily mid-serving; if its Pallas crop kernel fails
            # to compile on this backend, rebuild the variant on the XLA
            # windowed path instead of failing the serving step. Variants
            # that already ran once are in the jit cache and never re-trace,
            # so this retry only ever fires on a variant's first invocation.
            if (cap, win) in self._compiled:
                raise
            # Donation hazard: if the failed call already began executing
            # (donation committed under donate_state=True), `states` points
            # at deleted buffers and a retry would re-raise confusingly --
            # only compile-time failures (buffers still live) are retryable.
            if any(getattr(x, "is_deleted", lambda: False)()
                   for x in jax.tree_util.tree_leaves(states)):
                raise
            fn = self._track[(cap, win)] = self._mk(cap, win,
                                                    allow_pallas=False)
            return fn(reid_params, states, frames, boxes7, mask)
        finally:
            self._compiled.add((cap, win))

    def __call__(self, det_params, reid_params, states, frames):
        return self.track(reid_params, states,
                          self.detect(det_params, frames))


def make_scanned_step_bucketed(
    plan: NetworkPlan,
    det_cfg: DetectorConfig,
    trk_cfg: TrackerConfig,
    frame_hw: Tuple[int, int],
    buckets: Tuple[int, ...] = (8, 16, 32),
    tracked_class_ids=None,
    compute_dtype=jnp.float32,
    donate_state: bool = True,
    use_pallas_letterbox: bool = False,
    conf_thres_per_stream=None,
    windows: Optional[Tuple[Tuple[int, int], ...]] = (
        (160, 96), (240, 128), (320, 192), (640, 384),
    ),
    use_pallas_crops: Optional[bool] = None,  # None = auto by backend
    embed_int8=False,
    use_pallas_conv=False,
    backbone_int8_pkg=None,
    use_resblock=False,
) -> BucketedScannedStep:
    return BucketedScannedStep(
        plan, det_cfg, trk_cfg, frame_hw, buckets=buckets,
        tracked_class_ids=tracked_class_ids, compute_dtype=compute_dtype,
        donate_state=donate_state, use_pallas_letterbox=use_pallas_letterbox,
        conf_thres_per_stream=conf_thres_per_stream, windows=windows,
        use_pallas_crops=use_pallas_crops, embed_int8=embed_int8,
        use_pallas_conv=use_pallas_conv, backbone_int8_pkg=backbone_int8_pkg,
        use_resblock=use_resblock,
    )


def make_sharded_step(
    mesh: Mesh,
    plan: NetworkPlan,
    det_cfg: DetectorConfig,
    trk_cfg: TrackerConfig,
    frame_hw: Tuple[int, int],
    tracked_class_ids=None,
    compute_dtype=jnp.float32,
    axis: str = "stream",
    use_pallas_letterbox: bool = False,
):
    """Multi-chip: shard the stream axis of (states, frames) over the mesh.
    Model params are replicated; each chip runs its streams' full pipeline
    locally (zero collectives on the hot path -- the shared-gallery variant
    adds one all_gather, see shared_gallery_distance)."""
    replicated = NamedSharding(mesh, P())
    sharded = NamedSharding(mesh, P(axis))

    def step(det_params, reid_params, states, frames):
        fn = partial(
            fused_frame_step, plan, det_cfg, trk_cfg, frame_hw,
            tracked_class_ids=tracked_class_ids, compute_dtype=compute_dtype,
        )
        if use_pallas_letterbox:
            xs = pallas_letterbox_batch(frames, det_cfg.img_size)
            return jax.vmap(
                lambda st, fr, x: fn(det_params, reid_params, st, fr,
                                     letterboxed=x)
            )(states, frames, xs)
        return jax.vmap(
            lambda st, fr: fn(det_params, reid_params, st, fr)
        )(states, frames)

    state_shard = jax.tree_util.tree_map(lambda _: sharded, _state_struct(trk_cfg))
    out_shard = (
        state_shard,
        (sharded, sharded),
    )
    return jax.jit(
        step,
        in_shardings=(replicated, replicated, state_shard, sharded),
        out_shardings=out_shard,
    )


def _state_struct(trk_cfg: TrackerConfig):
    return init_tracker_state(trk_cfg)


def init_stream_states(trk_cfg: TrackerConfig, n_streams: int):
    """Stacked per-stream tracker states with disjoint id spaces would need
    id offsetting at read-out; ids are per-stream (like running the reference
    once per video)."""
    one = init_tracker_state(trk_cfg)
    return jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x[None], (n_streams,) + x.shape), one
    )


def shared_gallery_distance(local_feats: jnp.ndarray, axis: str = "stream"):
    """Cross-camera shared-gallery helper (BASELINE config 5): all_gather the
    per-chip ReID features over the ICI mesh so every stream can match
    against every camera's gallery. Call inside shard_map/jit with the mesh
    axis in scope."""
    return jax.lax.all_gather(local_feats, axis, tiled=True)


class GlobalIDState(NamedTuple):
    """Cross-camera aliasing table, lane-aligned with TrackerState.

    ``gid``  (S, T) int32: the global id reported for each track lane
    ``owner`` (S, T) int32: the local track_id the gid was assigned for --
    when a lane is recycled (track_id changes) the gid resets to that
    track's provisional global id."""

    gid: jnp.ndarray
    owner: jnp.ndarray


def init_global_ids(trk_cfg: TrackerConfig, n_streams: int) -> GlobalIDState:
    z = jnp.zeros((n_streams, trk_cfg.max_tracks), jnp.int32)
    return GlobalIDState(gid=z, owner=z)


def relabel_outputs_global(outputs: jnp.ndarray, gids: GlobalIDState):
    """Replace the local track-id column of lane-aligned tracker outputs
    (..., T, 5) with global ids (S, T)."""
    return jnp.concatenate(
        [outputs[..., :4],
         jnp.broadcast_to(gids.gid[..., None], outputs[..., :1].shape)
         .astype(outputs.dtype)],
        axis=-1,
    )


@partial(jax.jit, static_argnames=("n_streams_total", "stream_offset"))
def assign_provisional_gids(
    track_id: jnp.ndarray,  # (S_loc, T) local track ids
    gids: GlobalIDState,
    n_streams_total: int,
    stream_offset: int = 0,
) -> GlobalIDState:
    """Local (collective-free) half of the global-ID protocol: fresh or
    recycled lanes get their provisional unique gid immediately, so emitted
    rows never show gid 0 between collective handoff rounds."""
    s_loc, t = track_id.shape
    stream_idx = stream_offset + jnp.arange(s_loc, dtype=jnp.int32)
    prov = jnp.where(
        track_id > 0,
        (track_id - 1) * n_streams_total + stream_idx[:, None] + 1,
        0,
    )
    fresh = (track_id != gids.owner) | (gids.gid == 0)
    return GlobalIDState(
        gid=jnp.where(fresh, prov, gids.gid), owner=track_id
    )


def make_global_id_step(
    mesh: Mesh,
    trk_cfg: TrackerConfig,
    n_streams_total: int,
    axis: str = "stream",
    match_thresh: Optional[float] = None,
):
    """Cross-camera global-ID handoff (BASELINE config 5 -- the capability
    the reference never had; round-1 shipped only the matcher helper).

    Each call:
      1. assigns provisional global ids to newly-born lanes
         (gid = (track_id-1) * n_streams_total + global_stream_index + 1 --
         unique across the mesh, ordered by birth within a stream),
      2. all_gathers every confirmed track's FRESHEST gallery feature over
         the ICI mesh (the design's single hot-path collective, SURVEY.md
         section 5.8),
      3. matches them against every OTHER camera's confirmed-track galleries
         (cosine, min over each ring buffer; same-stream candidates masked),
      4. where the best cross-camera distance beats ``match_thresh``
         (default: the tracker's max_dist appearance gate), the lane ADOPTS
         the smaller global id: min-adoption is commutative and idempotent,
         so repeated calls converge to the oldest id across the camera set
         -- an object crossing cameras keeps one global identity.

    Returns a jitted fn (states, gids: GlobalIDState) -> GlobalIDState.
    Call it after tracking steps at any cadence (every chunk is typical);
    it is O(tracks^2) matmul work + two all_gathers, far below the
    detect/embed cost."""
    from ..tracking.tracker import STATE_CONFIRMED

    thresh = trk_cfg.max_dist if match_thresh is None else match_thresh
    n_chips = mesh.devices.size

    def step(states, gids):
        def shard_fn(gallery, gallery_head, gallery_count, trk_state,
                     track_id, gid, owner):
            s_loc, t = track_id.shape
            chip = jax.lax.axis_index(axis)
            s_per_chip = n_streams_total // n_chips
            stream_idx = chip * s_per_chip + jnp.arange(s_loc, dtype=jnp.int32)

            # 1. provisional ids for fresh lanes (or recycled ones)
            prov = jnp.where(
                track_id > 0,
                (track_id - 1) * n_streams_total + stream_idx[:, None] + 1,
                0,
            )
            fresh = (track_id != owner) | (gid == 0)
            gid = jnp.where(fresh, prov, gid)
            owner = track_id

            # 2. queries: freshest gallery feature of each confirmed track
            f = gallery.shape[-1]
            b = gallery.shape[-2]
            last = (gallery_head - 1) % b
            q_feat = jnp.take_along_axis(
                gallery, last[..., None, None], axis=2
            )[:, :, 0, :]  # (S_loc, T, F)
            q_ok = (trk_state == STATE_CONFIRMED) & (gallery_count > 0)
            q_loc = s_loc * t
            my_q = q_feat.reshape(q_loc, f)
            my_qok = q_ok.reshape(q_loc)
            my_qgid = gid.reshape(q_loc)
            my_qstream = jnp.broadcast_to(
                stream_idx[:, None], (s_loc, t)
            ).reshape(q_loc)
            all_q = jax.lax.all_gather(my_q, axis, tiled=True)
            all_qok = jax.lax.all_gather(my_qok, axis, tiled=True)
            all_qgid = jax.lax.all_gather(my_qgid, axis, tiled=True)
            all_qstream = jax.lax.all_gather(my_qstream, axis, tiled=True)

            # 3. my confirmed tracks as candidates vs ALL queries
            sims = jnp.einsum("stbf,qf->stbq", gallery, all_q)
            valid = (jnp.arange(b)[None, None, :]
                     < gallery_count[:, :, None])
            sims = jnp.where(valid[..., None], sims, -jnp.inf)
            dist = 1.0 - jnp.max(sims, axis=2)  # (S_loc, T, Q)
            cand_ok = (trk_state == STATE_CONFIRMED) & (gallery_count > 0)
            dist = jnp.where(cand_ok[..., None], dist, jnp.inf)
            # same-stream candidates never alias (handoff is cross-camera)
            same_stream = stream_idx[:, None, None] == all_qstream[None, None, :]
            dist = jnp.where(same_stream, jnp.inf, dist)
            dist = jnp.where(all_qok[None, None, :], dist, jnp.inf)
            dist2 = dist.reshape(-1, all_q.shape[0])
            local_best = jnp.argmin(dist2, axis=0)
            cols = jnp.arange(all_q.shape[0])
            ld = dist2[local_best, cols]
            lgid = gid.reshape(-1)[local_best]

            # 4. global best per query, then my lanes adopt the smaller gid
            all_ld = jax.lax.all_gather(ld, axis)      # (n, Q)
            all_lgid = jax.lax.all_gather(lgid, axis)
            win = jnp.argmin(all_ld, axis=0)
            g_dist = all_ld[win, cols]
            g_gid = all_lgid[win, cols]
            my_dist = jax.lax.dynamic_slice(
                g_dist, (chip * q_loc,), (q_loc,))
            my_best = jax.lax.dynamic_slice(
                g_gid, (chip * q_loc,), (q_loc,))
            adopt = my_qok & (my_dist < thresh) & (my_best > 0) & (
                my_best < my_qgid
            )
            new_gid = jnp.where(adopt, my_best, my_qgid).reshape(s_loc, t)
            return new_gid, owner

        fn = jax.shard_map(
            shard_fn,
            mesh=mesh,
            in_specs=(P(axis),) * 7,
            out_specs=(P(axis), P(axis)),
        )
        new_gid, owner = fn(
            states.gallery, states.gallery_head, states.gallery_count,
            states.state, states.track_id, gids.gid, gids.owner,
        )
        return GlobalIDState(gid=new_gid, owner=owner)

    return jax.jit(step)


def make_cross_camera_matcher(
    mesh: Mesh, trk_cfg: TrackerConfig, axis: str = "stream"
):
    """Global re-identification across a sharded camera mesh (BASELINE
    config 5: "4K multi-camera tracking with shared ReID gallery").

    Each chip holds its cameras' tracker states; this step all_gathers every
    camera's appearance gallery over the ICI mesh (the design's single
    hot-path collective, SURVEY.md section 5.8) so each chip can match its
    local detections against ALL cameras' confirmed tracks.

    Returns a jitted fn:
      (states (S, ...sharded), query_feats (S, D, F) sharded, query_mask)
        -> (best_global_track_id (S, D), best_distance (S, D))
    where best_global_track_id is the track id of the closest confirmed track
    anywhere on the mesh (cosine distance, min over each track's gallery),
    or -1 where the query is masked."""
    from ..tracking.tracker import STATE_CONFIRMED

    sharded = NamedSharding(mesh, P(axis))
    n = mesh.devices.size

    def step(states, query_feats, query_mask):
        def shard_fn(gallery, gallery_count, track_id, state, feats, mask):
            s_loc, d, f = feats.shape
            q_loc = s_loc * d
            # gather every camera's query features (the hot-path collective)
            my_q = feats.reshape(q_loc, f)
            all_q = jax.lax.all_gather(my_q, axis, tiled=True)  # (n*Q, F)

            # score MY confirmed tracks against ALL queries
            sims = jnp.einsum("stbf,qf->stbq", gallery, all_q)
            valid = (
                jnp.arange(gallery.shape[2])[None, None, :]
                < gallery_count[:, :, None]
            )
            sims = jnp.where(valid[..., None], sims, -jnp.inf)
            dist = 1.0 - jnp.max(sims, axis=2)  # (S_loc, T, n*Q)
            confirmed = state == STATE_CONFIRMED
            dist = jnp.where(confirmed[..., None], dist, jnp.inf)
            dist = dist.reshape(-1, n * q_loc)  # (local tracks, n*Q)
            local_best = jnp.argmin(dist, axis=0)
            cols = jnp.arange(n * q_loc)
            ld = dist[local_best, cols]  # (n*Q,)
            lid = track_id.reshape(-1)[local_best]

            # tiny second gather: each chip's per-query best -> global best
            all_ld = jax.lax.all_gather(ld, axis)  # (n, n*Q)
            all_lid = jax.lax.all_gather(lid, axis)
            win = jnp.argmin(all_ld, axis=0)
            g_dist = all_ld[win, cols]
            g_id = all_lid[win, cols]

            # slice out my own queries' answers
            k = jax.lax.axis_index(axis)
            my_dist = jax.lax.dynamic_slice(g_dist, (k * q_loc,), (q_loc,))
            my_id = jax.lax.dynamic_slice(g_id, (k * q_loc,), (q_loc,))
            ok = mask.reshape(-1) & jnp.isfinite(my_dist)
            my_id = jnp.where(ok, my_id, -1)
            my_dist = jnp.where(ok, my_dist, jnp.inf)
            return my_id.reshape(s_loc, d), my_dist.reshape(s_loc, d)

        fn = jax.shard_map(
            shard_fn,
            mesh=mesh,
            in_specs=(P(axis), P(axis), P(axis), P(axis), P(axis), P(axis)),
            out_specs=(P(axis), P(axis)),
        )
        return fn(
            states.gallery, states.gallery_count, states.track_id,
            states.state, query_feats, query_mask,
        )

    return jax.jit(step)
