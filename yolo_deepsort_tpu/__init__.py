"""yolo_deepsort_tpu — TPU-native video multi-object tracking in JAX.

A brand-new framework with the capabilities of GlassyWing/yolo_deepsort
(YOLOv3 / YOLOv3-tiny / YOLOv4 detection from stock darknet .cfg/.weights,
DeepSORT association), redesigned TPU-first: fixed-shape masked kernels,
a tracker state machine carried as a pytree through jit/scan, batched over
streams and sharded over device meshes.

Public API (mirrors the reference's surface, SURVEY.md section 0):
  - Darknet                       -- cfg-driven detector model
  - ImageDetector / VideoDetector -- detection wrappers
  - VideoTracker                  -- detection + tracking over video
  - DeepSort                      -- tracker facade: update(xywh, conf, img)
  - Extractor                     -- standalone ReID feature extractor
"""

__version__ = "0.1.0"


def __getattr__(name):  # lazy: keep `import yolo_deepsort_tpu` light
    if name in ("DeepSort", "Darknet", "Extractor", "ImageDetector",
                "VideoDetector", "VideoTracker"):
        from . import api

        return getattr(api, name)
    if name in ("TrackerConfig", "DetectorConfig"):
        from . import config

        return getattr(config, name)
    raise AttributeError(name)
