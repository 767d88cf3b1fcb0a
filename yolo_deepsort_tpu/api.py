"""Public API mirroring the reference's surface (SURVEY.md section 0):
``Darknet``, ``ImageDetector``, ``VideoDetector``, ``VideoTracker``,
``DeepSort.update(bbox_xywh, confidences, ori_img) -> [x1,y1,x2,y2,track_id]``.

Reference call sites: yolo3/models.py Darknet, yolo3/detect/img_detect.py,
yolo3/detect/video_detect.py, the VideoTracker entry point, and
deep_sort/deep_sort.py.

TPU-first: each wrapper owns jitted device functions specialized per frame
geometry; the ``VideoTracker`` hot path runs letterbox -> backbone -> NMS ->
crop-embed -> tracker association as ONE compiled step with no host
round-trips (the reference does four per frame, SURVEY.md section 3.1)."""

from __future__ import annotations

import os
import time
from typing import Dict, Iterable, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .cfg import COCO_NAMES, parse_model_config
from .cfg.architectures import ARCHITECTURES
from .config import DetectorConfig, TrackerConfig
from .models import weights as W
from .models.darknet import NetworkPlan, build_network, network_apply
from .models.reid import (
    feat_dim_of,
    load_reid_checkpoint,
    random_reid_params,
    reid_apply,
)
from .ops import boxes as B
from .ops.crops import crop_and_normalize
from .ops.letterbox import letterbox, rescale_boxes
from .ops.nms import batched_nms, roi_nms_mask
from .tracking.tracker import TrackerState, init_tracker_state, tracker_step


class _GeometryCache:
    """Bounded LRU of jitted steps keyed by frame geometry. A stream of
    varying resolutions would otherwise recompile and cache forever
    (round-1 review: unbounded per-(h,w) jit caches)."""

    def __init__(self, maxsize: int = 8):
        from collections import OrderedDict

        self._d = OrderedDict()
        self._warm = set()
        self.maxsize = maxsize

    def get(self, key, builder):
        if key in self._d:
            self._d.move_to_end(key)
            return self._d[key]
        fn = builder()
        self._d[key] = fn
        while len(self._d) > self.maxsize:
            evicted_key, _ = self._d.popitem(last=False)
            self._warm.discard(evicted_key)
        return fn

    def replace(self, key, builder):
        """Force-rebuild (first-call Pallas fallback path)."""
        self._d.pop(key, None)
        self._warm.discard(key)
        return self.get(key, builder)

    def is_warm(self, key) -> bool:
        """True once a step for this key has executed successfully.

        Fallback guards use this: a FIRST invocation may fail because the
        Pallas letterbox cannot compile on this backend (rebuild with the
        XLA letterbox); a WARM step failing means a real runtime error
        (OOM, device fault) that must propagate, not be silently absorbed
        into a ~10x-slower permanently-pinned XLA-letterbox step."""
        return key in self._warm

    def mark_warm(self, key) -> None:
        self._warm.add(key)


def _log_letterbox_fallback(where: str, hw) -> None:
    import logging

    logging.getLogger(__name__).warning(
        "%s: Pallas letterbox failed on first call for geometry %s; "
        "rebuilding this step with the XLA letterbox (slower).", where, hw,
    )


def _letterbox_fn(size: int, interp: str = "bilinear",
                  force_xla: bool = False):
    """Letterbox implementation for the api steps: the fused Pallas kernel
    on TPU-class backends (the XLA static-index-gather letterbox costs
    200-550 ms/frame at 1080p on TPU -- round-3 measurement), XLA
    elsewhere / for non-bilinear interp / when forced by the first-call
    fallback."""
    from .ops.pallas_letterbox import (
        pallas_letterbox,
        use_pallas_letterbox_default,
    )

    if (not force_xla and interp == "bilinear"
            and use_pallas_letterbox_default()):
        return lambda frame: pallas_letterbox(frame, size)
    return lambda frame: letterbox(frame, size, interp=interp)


class Darknet:
    """cfg-driven detector model (reference: yolo3/models.py Darknet).

    ``source`` is a .cfg path or a built-in architecture name
    ('yolov3', 'yolov3-tiny', 'yolov4')."""

    def __init__(self, source: str, img_size: Optional[int] = None,
                 num_classes: int = 80):
        if source in ARCHITECTURES:
            module_defs = ARCHITECTURES[source](
                num_classes=num_classes, img_size=img_size or
                (608 if source == "yolov4" else 416))
        else:
            module_defs = parse_model_config(source)
        self.plan: NetworkPlan = build_network(module_defs, img_size=img_size)
        self.img_size = self.plan.img_size
        self.num_classes = self.plan.num_classes
        self.header = np.array([0, 2, 0, 0, 0], np.int32)
        self.raw_params: W.RawParams = W.random_raw_params(self.plan.defs())
        # inference params live on-device: passing numpy pytrees to jitted
        # calls would re-upload ~250 MB of weights on EVERY call
        self.params = jax.tree_util.tree_map(
            jnp.asarray,
            W.fold_inference_params(self.raw_params, self.plan.defs()),
        )
        self._forward = jax.jit(
            lambda p, x: network_apply(self.plan, p, x)
        )

    def load_darknet_weights(self, weights_path: str, cutoff: int | None = None):
        header, raw = W.load_darknet_weights(
            weights_path, self.plan.defs(), cutoff=cutoff
        )
        self.header = header
        self.raw_params.update(raw)
        self.params = jax.tree_util.tree_map(
            jnp.asarray,
            W.fold_inference_params(self.raw_params, self.plan.defs()),
        )
        return self

    def save_darknet_weights(self, path: str, cutoff: int | None = None):
        W.save_darknet_weights(
            path, self.header, self.raw_params, self.plan.defs(), cutoff=cutoff
        )

    def __call__(self, x_nhwc: jnp.ndarray) -> jnp.ndarray:
        """Forward pass on letterboxed input; returns decoded detections
        (N, total_boxes, 5+C) in network-input pixels."""
        return self._forward(self.params, x_nhwc)


class ImageDetector:
    """Single-image detection wrapper (reference: yolo3/detect/img_detect.py).

    ``detect`` returns (K, 7) float rows (x1, y1, x2, y2, obj_conf, cls_conf,
    cls_pred) in ORIGINAL image coordinates."""

    def __init__(
        self,
        model: Darknet,
        class_names: Optional[Sequence[str]] = None,
        conf_thres: float = 0.5,
        nms_thres: float = 0.4,
        max_dets: int = 64,
        interp: str = "bilinear",
        half: bool = False,
        font_path: Optional[str] = None,
    ):
        self.model = model
        self.font_path = font_path
        self.class_names = list(class_names) if class_names else list(COCO_NAMES)
        self.cfg = DetectorConfig(
            img_size=model.img_size, conf_thres=conf_thres, nms_thres=nms_thres,
            max_dets=max_dets, half=half,
        )
        # the reference's fp16 `half` flag -> bfloat16 on TPU
        self.compute_dtype = jnp.bfloat16 if half else jnp.float32
        self.interp = interp
        self._steps = _GeometryCache()

    def _step_for(self, h: int, w: int, force_xla_letterbox: bool = False):
        def build():
            cfg = self.cfg
            size = cfg.img_size
            lbox = _letterbox_fn(size, interp=self.interp,
                                 force_xla=force_xla_letterbox)

            @jax.jit
            def step(params, frame):
                x = lbox(frame)[None]
                dets = network_apply(self.model.plan, params, x,
                                     compute_dtype=self.compute_dtype)
                boxes7, mask = batched_nms(
                    dets, cfg.conf_thres, cfg.nms_thres, cfg.max_boxes,
                    cfg.max_dets,
                )
                boxes7 = boxes7[0]
                orig = rescale_boxes(boxes7[:, :4], size, h, w)
                return jnp.concatenate([orig, boxes7[:, 4:]], axis=1), mask[0]

            return step

        if force_xla_letterbox:
            return self._steps.replace((h, w), build)
        return self._steps.get((h, w), build)

    def detect(self, img_rgb: np.ndarray) -> np.ndarray:
        h, w = img_rgb.shape[:2]
        step = self._step_for(h, w)
        try:
            boxes, mask = step(self.model.params, img_rgb)
        except Exception:
            # First-call-only Pallas letterbox fallback (backends where the
            # kernel cannot compile). A warm step failing is a real runtime
            # error (OOM, device fault): re-raise instead of silently
            # pinning the ~10x-slower XLA-letterbox step.
            if self._steps.is_warm((h, w)):
                raise
            _log_letterbox_fallback("ImageDetector.detect", (h, w))
            step = self._step_for(h, w, force_xla_letterbox=True)
            boxes, mask = step(self.model.params, img_rgb)
        self._steps.mark_warm((h, w))
        return np.asarray(boxes)[np.asarray(mask)]

    def draw(self, img_rgb: np.ndarray, detections: np.ndarray) -> np.ndarray:
        return draw_detections(img_rgb, detections, self.class_names,
                               font_path=self.font_path)


class VideoDetector:
    """Video detection loop (reference: yolo3/detect/video_detect.py).

    A generator yielding (annotated_frame_bgr, detections); supports
    ``skip_frames`` (detect every Nth frame, reuse boxes between), optional
    mp4 output and live display, FPS overlay."""

    def __init__(self, image_detector: ImageDetector):
        self.detector = image_detector

    def detect(
        self,
        video_path: str | int,
        output_path: Optional[str] = None,
        real_show: bool = False,
        skip_frames: int = 0,
    ):
        from .runtime.video import VideoSource, VideoWriter, show_frame

        source = VideoSource(video_path)
        writer = VideoWriter(output_path, source.fps, source.size) if output_path else None
        detections = np.zeros((0, 7), np.float32)
        t_last = time.time()
        try:
            for i, frame_bgr in enumerate(source):
                frame_rgb = frame_bgr[:, :, ::-1]
                if skip_frames <= 0 or i % (skip_frames + 1) == 0:
                    detections = self.detector.detect(np.ascontiguousarray(frame_rgb))
                annotated = draw_detections(
                    np.ascontiguousarray(frame_rgb), detections,
                    self.detector.class_names,
                )
                now = time.time()
                fps = 1.0 / max(now - t_last, 1e-6)
                t_last = now
                annotated = draw_fps(annotated, fps)
                out_bgr = np.ascontiguousarray(annotated[:, :, ::-1])
                if writer:
                    writer.write(out_bgr)
                if real_show:
                    show_frame(out_bgr)
                yield annotated, detections
        finally:
            source.release()
            if writer:
                writer.release()


class Extractor:
    """ReID feature extractor facade (reference:
    deep_sort/deep/feature_extractor.py:~1-55 -- Extractor(model_path)
    resizes RGB crops to 64x128 with cv2 bilinear, /255 + ImageNet
    normalization, batched forward, L2-normalized features).

    ``__call__(im_crops)`` takes a list of HWC uint8 RGB crops (any sizes)
    and returns (N, feat_dim) float32 numpy features. Batch sizes are
    padded to powers of two so the jit cache stays bounded."""

    def __init__(self, model_path: Optional[str] = None, use_cuda: bool = True,
                 max_batch: int = 256):
        del use_cuda
        if model_path and os.path.exists(model_path):
            params = load_reid_checkpoint(model_path)
        else:
            params = random_reid_params(seed=0)
        self.params = jax.tree_util.tree_map(jnp.asarray, params)
        self.feat_dim = feat_dim_of(params)
        self.max_batch = max_batch
        self._apply = jax.jit(lambda p, x: reid_apply(p, x))

    @staticmethod
    def _preprocess(crop: np.ndarray) -> np.ndarray:
        from .ops.crops import CROP_H, CROP_W, REID_MEAN, REID_STD

        try:
            import cv2

            r = cv2.resize(crop, (CROP_W, CROP_H),
                           interpolation=cv2.INTER_LINEAR)
        except ImportError:
            from PIL import Image

            r = np.asarray(
                Image.fromarray(crop).resize((CROP_W, CROP_H), Image.BILINEAR)
            )
        return (r.astype(np.float32) / 255.0 - REID_MEAN) / REID_STD

    def __call__(self, im_crops: Sequence[np.ndarray]) -> np.ndarray:
        if not len(im_crops):
            return np.zeros((0, self.feat_dim), np.float32)
        batch = np.stack([self._preprocess(c) for c in im_crops])
        n = batch.shape[0]
        padded = 1
        while padded < n:
            padded *= 2
        padded = min(padded, max(self.max_batch, n))
        if padded > n:
            batch = np.concatenate(
                [batch, np.zeros((padded - n, *batch.shape[1:]), np.float32)]
            )
        feats = np.asarray(self._apply(self.params, batch))
        return feats[:n]


class DeepSort:
    """Reference-compatible tracking facade (deep_sort/deep_sort.py).

    ``update(bbox_xywh, confidences, ori_img)`` takes (cx, cy, w, h) pixel
    boxes and returns int rows [x1, y1, x2, y2, track_id]."""

    def __init__(
        self,
        model_path: Optional[str] = None,
        max_dist: float = 0.2,
        min_confidence: float = 0.3,
        nms_max_overlap: float = 1.0,
        max_iou_distance: float = 0.7,
        max_age: int = 70,
        n_init: int = 3,
        nn_budget: int = 100,
        use_cuda: bool = True,  # accepted for API compat; device is jax's
        max_tracks: int = 128,
        max_dets: int = 64,
    ):
        del use_cuda
        if model_path and os.path.exists(model_path):
            reid_params = load_reid_checkpoint(model_path)
        else:
            reid_params = random_reid_params(seed=0)
        self.cfg = TrackerConfig(
            max_tracks=max_tracks,
            max_dets=max_dets,
            feat_dim=feat_dim_of(reid_params),
            nn_budget=nn_budget,
            max_dist=max_dist,
            min_confidence=min_confidence,
            nms_max_overlap=nms_max_overlap,
            max_iou_distance=max_iou_distance,
            max_age=max_age,
            n_init=n_init,
        )
        self.reid_params = jax.tree_util.tree_map(jnp.asarray, reid_params)
        self.state: TrackerState = init_tracker_state(self.cfg)
        self._steps = _GeometryCache()

    def reset(self):
        self.state = init_tracker_state(self.cfg)

    def save_state(self, path: str) -> None:
        """Checkpoint the tracker runtime state (SURVEY.md section 5.4: the
        reference never could -- its state was a Python object graph; here it
        is a fixed-shape pytree of a few KB)."""
        from .utils.checkpoint import save_pytree

        save_pytree(path, self.state._asdict())

    def load_state(self, path: str) -> None:
        from .utils.checkpoint import load_pytree

        d = load_pytree(path)
        self.state = TrackerState(**{k: jnp.asarray(d[k])
                                     for k in TrackerState._fields})

    def _step_for(self, h: int, w: int):
        def build():
            cfg = self.cfg

            @jax.jit
            def step(reid_params, state, frame_rgb, tlwh, conf, mask):
                xyxy = B.tlwh_to_xyxy(tlwh)
                crops = crop_and_normalize(frame_rgb, xyxy)
                feats = reid_apply(reid_params, crops)
                if cfg.nms_max_overlap < 1.0:
                    keep = roi_nms_mask(tlwh, conf, mask, cfg.nms_max_overlap)
                    mask2 = mask & keep
                else:
                    mask2 = mask
                img_hw = jnp.array([h, w], jnp.int32)
                return tracker_step(cfg, state, tlwh, conf, feats, mask2, img_hw)

            return step

        return self._steps.get((h, w), build)

    def update(
        self,
        bbox_xywh: np.ndarray,
        confidences: Sequence[float],
        ori_img: np.ndarray,
    ) -> np.ndarray:
        h, w = ori_img.shape[:2]
        d = self.cfg.max_dets
        n = min(len(confidences), d)
        bbox_xywh = np.asarray(bbox_xywh, np.float32).reshape(-1, 4)[:n]
        tlwh = np.zeros((d, 4), np.float32)
        tlwh[:n, 0] = bbox_xywh[:, 0] - bbox_xywh[:, 2] / 2
        tlwh[:n, 1] = bbox_xywh[:, 1] - bbox_xywh[:, 3] / 2
        tlwh[:n, 2:] = bbox_xywh[:, 2:]
        conf = np.zeros((d,), np.float32)
        conf[:n] = np.asarray(confidences, np.float32)[:n]
        mask = np.zeros((d,), bool)
        mask[:n] = True

        step = self._step_for(h, w)
        self.state, outputs, emit = step(
            self.reid_params, self.state, np.ascontiguousarray(ori_img),
            tlwh, conf, mask,
        )
        out = np.asarray(outputs)[np.asarray(emit)]
        return out.astype(np.int64) if len(out) else np.zeros((0, 5), np.int64)


class VideoTracker:
    """Detection + DeepSORT tracking over video (the reference's tracking
    entry point, SURVEY.md section 3.1). The per-frame compute -- letterbox,
    backbone, NMS, crop-embed, association -- is ONE jitted device step."""

    def __init__(
        self,
        model: Darknet,
        reid_model_path: Optional[str] = None,
        class_names: Optional[Sequence[str]] = None,
        tracked_classes: Optional[Iterable[str]] = ("person",),
        conf_thres: float = 0.5,
        nms_thres: float = 0.4,
        tracker_config: Optional[TrackerConfig] = None,
        half: bool = False,
        font_path: Optional[str] = None,
    ):
        self.model = model
        self.font_path = font_path
        self.class_names = list(class_names) if class_names else list(COCO_NAMES)
        self.det_cfg = DetectorConfig(
            img_size=model.img_size, conf_thres=conf_thres, nms_thres=nms_thres,
            half=half,
        )
        self.compute_dtype = jnp.bfloat16 if half else jnp.float32
        if reid_model_path and os.path.exists(reid_model_path):
            reid_params = load_reid_checkpoint(reid_model_path)
        else:
            reid_params = random_reid_params(seed=0)
        import dataclasses as _dc

        self.trk_cfg = _dc.replace(
            tracker_config or TrackerConfig(), feat_dim=feat_dim_of(reid_params)
        )
        self.reid_params = jax.tree_util.tree_map(jnp.asarray, reid_params)
        if tracked_classes:
            self.tracked_class_ids = np.array(
                [self.class_names.index(c) for c in tracked_classes], np.int32
            )
        else:
            self.tracked_class_ids = None
        self.state = init_tracker_state(self.trk_cfg)
        self._steps = _GeometryCache()

    def reset(self):
        self.state = init_tracker_state(self.trk_cfg)

    def _step_for(self, h: int, w: int, force_xla_letterbox: bool = False):
        def build():
            det_cfg, trk_cfg = self.det_cfg, self.trk_cfg
            size = det_cfg.img_size
            plan = self.model.plan
            class_ids = self.tracked_class_ids
            lbox = _letterbox_fn(size, force_xla=force_xla_letterbox)

            cdtype = self.compute_dtype

            @jax.jit
            def step(det_params, reid_params, state, frame_rgb):
                x = lbox(frame_rgb)[None]
                decoded = network_apply(plan, det_params, x,
                                        compute_dtype=cdtype)
                boxes7, mask = batched_nms(
                    decoded, det_cfg.conf_thres, det_cfg.nms_thres,
                    det_cfg.max_boxes, trk_cfg.max_dets,
                )
                boxes7, mask = boxes7[0], mask[0]
                xyxy = rescale_boxes(boxes7[:, :4], size, h, w)
                if class_ids is not None:
                    cls_ok = jnp.isin(
                        boxes7[:, 6].astype(jnp.int32), jnp.asarray(class_ids)
                    )
                    mask = mask & cls_ok
                # clip like the reference glue before cropping
                x1 = jnp.clip(xyxy[:, 0], 0, w - 1)
                y1 = jnp.clip(xyxy[:, 1], 0, h - 1)
                x2 = jnp.clip(xyxy[:, 2], 0, w - 1)
                y2 = jnp.clip(xyxy[:, 3], 0, h - 1)
                tlwh = jnp.stack([x1, y1, x2 - x1, y2 - y1], axis=1)
                crops = crop_and_normalize(
                    frame_rgb, jnp.stack([x1, y1, x2, y2], axis=1),
                    compute_dtype=cdtype,
                )
                feats = reid_apply(reid_params, crops, compute_dtype=cdtype)
                # reference glue feeds the CLASS confidence (row col 5, not
                # obj_conf col 4) into deepsort.update's min_confidence filter
                conf = boxes7[:, 5]
                img_hw = jnp.array([h, w], jnp.int32)
                state, outputs, emit = tracker_step(
                    trk_cfg, state, tlwh, conf, feats, mask, img_hw
                )
                return state, outputs, emit, boxes7, mask

            return step

        if force_xla_letterbox:
            return self._steps.replace((h, w), build)
        return self._steps.get((h, w), build)

    def save_state(self, path: str) -> None:
        """Checkpoint the tracker runtime state (resume mid-video)."""
        from .utils.checkpoint import save_pytree

        save_pytree(path, self.state._asdict())

    def load_state(self, path: str) -> None:
        from .utils.checkpoint import load_pytree

        d = load_pytree(path)
        self.state = TrackerState(**{k: jnp.asarray(d[k])
                                     for k in TrackerState._fields})

    def _chunk_step_for(self, h: int, w: int, chunk: int,
                        force_xla_letterbox: bool = False):
        def build():
            from .parallel.streams import make_scanned_step_bucketed

            # denser capacity ladder than the stream default: a single
            # video's det count sits wherever the scene puts it, and the
            # gap between bucket 32 and max_dets (100) would otherwise run
            # typical 30-50-det scenes at worst-case crop/embed capacity
            cap = self.trk_cfg.max_dets
            ladder = tuple(b for b in (8, 16, 24, 32, 40, 48, 64)
                           if b < cap)
            from .ops.pallas_letterbox import use_pallas_letterbox_default

            return make_scanned_step_bucketed(
                self.model.plan, self.det_cfg, self.trk_cfg, (h, w),
                buckets=ladder,
                tracked_class_ids=self.tracked_class_ids,
                compute_dtype=self.compute_dtype, donate_state=False,
                use_pallas_letterbox=(not force_xla_letterbox
                                      and use_pallas_letterbox_default()),
            )

        # one BucketedScannedStep serves any chunk length (its stages
        # re-specialize per frame-count internally)
        del chunk
        if force_xla_letterbox:
            return self._steps.replace((h, w, "chunked"), build)
        return self._steps.get((h, w, "chunked"), build)

    def _track_frames_async(self, frames_rgb: np.ndarray):
        """Dispatch one chunk; returns DEVICE (outputs, emit) futures.
        Tracker state is updated immediately (device-side); the caller
        drains the result arrays when convenient -- jax dispatch is async,
        so host decode/draw of neighboring chunks overlaps this chunk's
        compute (the single-video pipelining the multistream runtime gets
        from its native ring)."""
        k, h, w = frames_rgb.shape[0], frames_rgb.shape[1], frames_rgb.shape[2]
        step = self._chunk_step_for(h, w, k)
        states = jax.tree_util.tree_map(lambda x: x[None], self.state)
        frames_dev = jnp.asarray(frames_rgb)[:, None]  # (K, S=1, H, W, 3)
        try:
            states, (outputs, emit) = step(
                self.model.params, self.reid_params, states, frames_dev)
        except Exception:
            # First-call-only Pallas letterbox fallback (the bucketed step's
            # own per-variant fallback covers the crop kernel, not detect);
            # warm-step failures are real runtime errors -- re-raise.
            if self._steps.is_warm((h, w, "chunked")):
                raise
            _log_letterbox_fallback("VideoTracker.track_frames", (h, w))
            step = self._chunk_step_for(h, w, k, force_xla_letterbox=True)
            states, (outputs, emit) = step(
                self.model.params, self.reid_params, states, frames_dev)
        self._steps.mark_warm((h, w, "chunked"))
        self.state = jax.tree_util.tree_map(lambda x: x[0], states)
        return outputs, emit

    @staticmethod
    def _drain_chunk(outputs, emit) -> list:
        outputs = np.asarray(outputs)[:, 0]  # (K, T, 5)
        emit = np.asarray(emit)[:, 0]
        return [
            outputs[t][emit[t]].astype(np.int64) if emit[t].any()
            else np.zeros((0, 5), np.int64)
            for t in range(outputs.shape[0])
        ]

    def track_frames(self, frames_rgb: np.ndarray) -> Tuple[np.ndarray, list]:
        """Offline/chunked mode: process K frames of ONE stream in a single
        chunked device dispatch (stateless stages batched, tracker scanned;
        detection-capacity bucketing sizes the crop/embed work to the
        chunk's actual load). Same association math as K track_frame calls.

        frames_rgb: (K, H, W, 3) uint8. Returns a list of K int64
        [x1,y1,x2,y2,track_id] arrays, one per frame in order."""
        return self._drain_chunk(*self._track_frames_async(frames_rgb))

    def track_frame(self, frame_rgb: np.ndarray) -> np.ndarray:
        """One frame -> int rows [x1, y1, x2, y2, track_id]."""
        h, w = frame_rgb.shape[:2]
        step = self._step_for(h, w)
        frame = np.ascontiguousarray(frame_rgb)
        try:
            new_state, outputs, emit, _, _ = step(
                self.model.params, self.reid_params, self.state, frame)
        except Exception:
            # first-call-only Pallas letterbox fallback; warm-step failures
            # are real runtime errors -- re-raise.
            if self._steps.is_warm((h, w)):
                raise
            _log_letterbox_fallback("VideoTracker.track_frame", (h, w))
            step = self._step_for(h, w, force_xla_letterbox=True)
            new_state, outputs, emit, _, _ = step(
                self.model.params, self.reid_params, self.state, frame)
        self._steps.mark_warm((h, w))
        self.state = new_state
        out = np.asarray(outputs)[np.asarray(emit)]
        return out.astype(np.int64) if len(out) else np.zeros((0, 5), np.int64)

    def track(
        self,
        video_path: str | int,
        output_path: Optional[str] = None,
        real_show: bool = False,
        skip_frames: int = 0,
        chunk: int = 0,
    ):
        """Generator over (annotated_frame_rgb, outputs).

        ``skip_frames`` mirrors VideoDetector's convention: run the
        detect+associate step every (skip_frames+1)-th frame and reuse the
        last outputs for annotation between (skipped frames never age the
        tracker -- they simply did not happen).

        ``chunk > 1`` enables offline/throughput mode: frames are buffered
        and processed ``chunk`` at a time through one chunked device
        dispatch (track_frames); results stream out per frame in order.
        Tail frames shorter than a chunk run per-frame. Mutually exclusive
        with skip_frames."""
        from .runtime.video import VideoSource, VideoWriter, show_frame

        if chunk > 1 and skip_frames > 0:
            raise ValueError("chunk and skip_frames are mutually exclusive")
        source = VideoSource(video_path)
        writer = VideoWriter(output_path, source.fps, source.size) if output_path else None
        t_last = time.time()
        outputs = np.zeros((0, 5), np.int64)

        def emit(frame_rgb, outputs):
            nonlocal t_last
            annotated = draw_tracks(frame_rgb, outputs,
                                    font_path=self.font_path)
            now = time.time()
            annotated = draw_fps(annotated, 1.0 / max(now - t_last, 1e-6))
            t_last = now
            out_bgr = np.ascontiguousarray(annotated[:, :, ::-1])
            if writer:
                writer.write(out_bgr)
            if real_show:
                show_frame(out_bgr)
            return annotated

        try:
            if chunk > 1:
                # one-chunk-deep pipeline: dispatch chunk i, then drain and
                # draw chunk i-1 while the device computes -- decode of
                # chunk i+1 follows in this same loop, so host decode/draw
                # and device compute overlap instead of strictly
                # alternating (round-2 gap: the single-video path got none
                # of the multistream runtime's overlap)
                buf: List[np.ndarray] = []
                pending = None  # (frames, device outputs, device emit)
                for frame_bgr in source:
                    buf.append(np.ascontiguousarray(frame_bgr[:, :, ::-1]))
                    if len(buf) == chunk:
                        handles = self._track_frames_async(np.stack(buf))
                        if pending is not None:
                            pf, po, pe = pending
                            for f, o in zip(pf, self._drain_chunk(po, pe)):
                                yield emit(f, o), o
                        pending = (buf, *handles)
                        buf = []
                if pending is not None:
                    pf, po, pe = pending
                    for f, o in zip(pf, self._drain_chunk(po, pe)):
                        yield emit(f, o), o
                for f in buf:  # tail: per-frame, same math
                    o = self.track_frame(f)
                    yield emit(f, o), o
                return
            for i, frame_bgr in enumerate(source):
                frame_rgb = np.ascontiguousarray(frame_bgr[:, :, ::-1])
                if skip_frames <= 0 or i % (skip_frames + 1) == 0:
                    outputs = self.track_frame(frame_rgb)
                yield emit(frame_rgb, outputs), outputs
        finally:
            source.release()
            if writer:
                writer.release()


# ---------------------------------------------------------------- drawing

_PALETTE = np.array(
    [[230, 25, 75], [60, 180, 75], [255, 225, 25], [0, 130, 200],
     [245, 130, 48], [145, 30, 180], [70, 240, 240], [240, 50, 230],
     [210, 245, 60], [250, 190, 212], [0, 128, 128], [220, 190, 255]],
    np.uint8,
)


def _color_for(idx: int) -> Tuple[int, int, int]:
    return tuple(int(c) for c in _PALETTE[idx % len(_PALETTE)])


_FONTS: Dict[Tuple[str, int], object] = {}


def _truetype(font_path: str, size: int):
    key = (font_path, size)
    if key not in _FONTS:
        from PIL import ImageFont

        _FONTS[key] = ImageFont.truetype(font_path, size)
    return _FONTS[key]


def _draw_labels(out: np.ndarray, labels, font_path: Optional[str],
                 font_size: int = 18) -> np.ndarray:
    """Render text labels; with ``font_path`` (e.g. the reference's
    font/sarasa-bold.ttc -- CJK-capable) via PIL truetype like the
    reference's img_detect.py drawing, else the cv2 Hershey fallback."""
    if font_path:
        from PIL import Image, ImageDraw

        font = _truetype(font_path, font_size)
        im = Image.fromarray(out)
        d = ImageDraw.Draw(im)
        for text, (x, y), color in labels:
            d.text((x, max(y - font_size - 2, 0)), text, fill=color, font=font)
        return np.asarray(im)
    import cv2

    for text, (x, y), color in labels:
        cv2.putText(out, text, (x, max(y - 4, 10)),
                    cv2.FONT_HERSHEY_SIMPLEX, 0.55, color, 2, cv2.LINE_AA)
    return out


def draw_detections(
    img_rgb: np.ndarray, detections: np.ndarray, class_names: List[str],
    font_path: Optional[str] = None,
) -> np.ndarray:
    """Box + class-name overlay (reference: PIL drawing in img_detect.py)."""
    import cv2

    out = img_rgb.copy()
    labels = []
    for row in detections:
        x1, y1, x2, y2 = (int(v) for v in row[:4])
        cls = int(row[6])
        color = _color_for(cls)
        cv2.rectangle(out, (x1, y1), (x2, y2), color, 2)
        labels.append((f"{class_names[cls]} {row[4]:.2f}", (x1, y1), color))
    return _draw_labels(out, labels, font_path)


def draw_tracks(img_rgb: np.ndarray, outputs: np.ndarray,
                font_path: Optional[str] = None) -> np.ndarray:
    import cv2

    out = img_rgb.copy()
    labels = []
    for x1, y1, x2, y2, tid in outputs:
        color = _color_for(int(tid))
        cv2.rectangle(out, (int(x1), int(y1)), (int(x2), int(y2)), color, 2)
        labels.append((f"id {int(tid)}", (int(x1), int(y1)), color))
    return _draw_labels(out, labels, font_path)


def draw_fps(img_rgb: np.ndarray, fps: float) -> np.ndarray:
    import cv2

    cv2.putText(img_rgb, f"FPS: {fps:.1f}", (10, 26),
                cv2.FONT_HERSHEY_SIMPLEX, 0.8, (0, 255, 0), 2, cv2.LINE_AA)
    return img_rgb
