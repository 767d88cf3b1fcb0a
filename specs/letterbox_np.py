"""Numpy letterbox spec -- re-export shim.

The numpy letterbox lives in the production package
(``yolo_deepsort_tpu.data.letterbox_np``) because host-side dataset code
must match the device letterbox bit-for-bit and the installable package
cannot depend on the test-oracle tree.  The oracle property is preserved:
the device implementations (``ops/letterbox.py``, ``ops/pallas_letterbox.py``)
are still tested against this independent numpy implementation.

Contract: SURVEY.md Appendix F (reference: yolo3/dataset/datasets.py:~15-35
pad_to_square/resize; yolo3/utils/utils.py:~45 rescale_boxes; ReID crop
preprocessing in deep_sort/deep/feature_extractor.py:~20-45).
"""

from yolo_deepsort_tpu.data.letterbox_np import (  # noqa: F401
    REID_HW,
    REID_MEAN,
    REID_STD,
    letterbox,
    pad_to_square,
    reid_preprocess_crop,
    rescale_boxes,
    resize_bilinear,
    resize_nearest,
)
